"""Test config: force an 8-virtual-device CPU backend before any test touches JAX.

This is the TPU-world "fake backend" (SURVEY §4): multi-chip sharding tests run on
host CPU devices so pjit/shard_map collectives are validated without a real slice.
The axon TPU plugin registers itself via sitecustomize and pins jax_platforms, so
we must override the config after importing jax, not just the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# force the Pallas (interpret-mode) paths even on tiny test graphs
os.environ.setdefault("GTS_PALLAS_MIN_NODES", "0")

# serve-path fixed padding defaults to the BraTS raw extent (240,240,155);
# the test volumes are ~32 voxels, so disable it globally — dedicated tests
# exercise padding with explicit small pad shapes
os.environ.setdefault("GTS_SERVE_PAD_SHAPE", "none")
# likewise the CNN crop floor (128^3 would cost ~86 GFLOP CPU convs per step
# on the tiny test crops); a dedicated test exercises it explicitly
os.environ.setdefault("GTS_CNN_CROP_FLOOR", "none")
