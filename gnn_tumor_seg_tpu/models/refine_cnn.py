"""3D refinement CNN (TPU): two k=5 replicate-padded conv layers.

Capability match for the reference's CnnRefinementNet (`model/networks.py:83-93`):
Conv3d(in -> layer_sizes[0], k=5, s=1, p=2, replicate pad) -> ReLU ->
Conv3d(layer_sizes[0] -> out_classes, same geometry). Input is the channel-concat of
the 4 MRI modalities and the 4 GNN voxel logits cropped to the predicted tumor
(`model/cnn_model.py:85-88`).

TPU-first choices: NDHWC layout (channels-last feeds the MXU's 128-lane axis),
explicit edge-replication via jnp.pad(mode="edge") + VALID conv (XLA has no
replicate conv padding), f32 accumulate.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .initializers import kaiming_uniform_conv, conv_bias_uniform

__all__ = ["CnnRefinementNet"]

_K = 5
_PAD = 2


def _replicate_conv3d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x: [B, D, H, W, Cin]; w: [5,5,5,Cin,Cout]; replicate-pad 2 then VALID conv."""
    x = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (_PAD, _PAD), (0, 0)),
                mode="edge")
    # output dtype follows the inputs (bf16 under fast mode): MXU accumulation
    # is f32 internally either way, and a f32 preferred_element_type would
    # break the conv transpose under autodiff (f32 cotangent vs bf16 kernel)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )
    return out + b


class CnnRefinementNet:
    def __init__(self, in_feats: int, out_classes: int, layer_sizes: Sequence[int]):
        self.in_feats = in_feats
        self.out_classes = out_classes
        self.layer_sizes = list(layer_sizes)
        assert len(self.layer_sizes) == 1, "reference architecture is 2 conv layers"

    def init(self, key) -> dict:
        k = jax.random.split(key, 4)
        c0, c1 = self.in_feats, self.layer_sizes[0]
        fan0 = c0 * _K ** 3
        fan1 = c1 * _K ** 3
        return {
            "conv0": {
                "w": kaiming_uniform_conv(k[0], (_K, _K, _K, c0, c1)),
                "b": conv_bias_uniform(k[1], fan0, c1),
            },
            "conv1": {
                "w": kaiming_uniform_conv(k[2], (_K, _K, _K, c1, self.out_classes)),
                "b": conv_bias_uniform(k[3], fan1, self.out_classes),
            },
        }

    def apply(self, params, x: jax.Array, train: bool = False, rng=None) -> jax.Array:
        """x: [B, D, H, W, in_feats] -> logits [B, D, H, W, out_classes].

        Precision mode 'fast' runs the convs in bf16: params/activations cast
        at use, conv outputs stay bf16 between layers (MXU accumulates in f32
        internally regardless of output dtype), and only the head logits are
        cast back to f32 — same mixed-precision recipe as the GNN models."""
        from ..ops.pallas.precision import compute_dtype

        cd = compute_dtype()
        x = x.astype(cd)
        if cd != jnp.float32:
            params = jax.tree_util.tree_map(lambda v: v.astype(cd), params)
        h = jax.nn.relu(_replicate_conv3d(x, params["conv0"]["w"], params["conv0"]["b"]))
        out = _replicate_conv3d(h.astype(cd), params["conv1"]["w"], params["conv1"]["b"])
        return out.astype(jnp.float32)
