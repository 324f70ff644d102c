"""Parameter initializers matching the reference stack's conventions.

DGL's SAGEConv/GATConv reset_parameters use xavier_uniform with gain=sqrt(2)
(relu gain); torch Conv3d uses kaiming_uniform(a=sqrt(5)) with uniform bias.
Exact RNG streams differ by construction (JAX PRNG), but the distributions match.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, gain: float = math.sqrt(2.0), dtype=jnp.float32):
    """Xavier/Glorot uniform for a [fan_in, fan_out] weight matrix."""
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) > 2:  # attention vectors [heads, out]: treat as fan_in=1 rows
        fan_in = int(jnp.prod(jnp.asarray(shape[:-1])))
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch-default conv weight init: kaiming_uniform(a=sqrt(5)).

    shape: [kd, kh, kw, in_ch, out_ch] (HWIO-style for lax.conv_general_dilated).
    """
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_bias_uniform(key, fan_in: int, out_ch: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (out_ch,), dtype, minval=-bound, maxval=bound)
