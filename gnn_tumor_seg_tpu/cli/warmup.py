"""CLI: pre-compile the serve-path XLA programs into the persistent cache.

The Docker single-MRI contract (`/root/reference/README.md:127-173`) runs one
prediction per container invocation — a cold process. XLA compiles are the
dominant cold cost (~16-60 s with a warm cache, ~2-3 min with an empty one on
a remote-compile TPU), and the persistent compilation cache
(`runtime.enable_compilation_cache`) is keyed per machine, so running this
once at image build / host deploy moves those compiles out of request latency:
it drives the real `predict_single_mri` chain on a synthetic BraTS-shaped
brain, populating the cache with the GNN forward, the device preprocessing +
SLIC programs (one program for ALL brain-crop shapes — traced grid dims over
a fixed pad), the voxel-gather/bbox and crop-combine programs (also
fixed-pad: cli/common.py pads the partition/image to BRATS_RAW_SHAPE, so
every real crop shape shares the warmed compile), and the CNN at the
synthetic tumor's crop bucket. Residual per-request compiles after warmup:
the CNN when a real tumor crop lands in a different 16-voxel bucket, and the
GNN when the node count lands in a different node bucket — everything else
is shape-stable by construction.

Run:  python -m gnn_tumor_seg_tpu.cli.warmup -g gnn.ckpt -c cnn.ckpt
(The Dockerfile runs this at build time; the cache is platform/config-keyed,
so TPU serve hosts must run it once on the target machine — baked CPU
entries do not hit there.)
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np


def make_synthetic_brain(shape=(240, 240, 155), seed=0):
    """Four smooth modality volumes with a bright blob, BraTS-shaped: enough
    structure for the brain crop, SLIC and tumor crop to behave like a real
    sample (values never leave this process)."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    base = ndimage.gaussian_filter(
        rng.normal(size=shape).astype(np.float32), 6.0)
    mods = []
    x, y, z = np.meshgrid(*(np.arange(s, dtype=np.float32) for s in shape),
                          indexing="ij")
    blob = np.exp(-(((x - shape[0] / 2) ** 2 + (y - shape[1] / 2) ** 2
                     + (z - shape[2] / 2) ** 2) / (2 * 18.0 ** 2)))
    for m in range(4):
        v = base * 40.0 + 100.0 + blob * (80.0 + 20.0 * m)
        v[:30] = 0.0
        v[-30:] = 0.0  # background margin so the brain crop is non-trivial
        mods.append(v.astype(np.float32))
    return mods


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-g", "--gnn_weights", required=True, type=str)
    p.add_argument("-c", "--cnn_weights", required=True, type=str)
    p.add_argument("-n", "--num_nodes", default=15000, type=int)
    p.add_argument("--precision", default="fast", choices=("exact", "fast"))
    p.add_argument("--slic_impl", default="auto",
                   choices=("auto", "native", "numpy", "tpu"))
    p.add_argument("--cnn_prep", default="device", choices=("device", "host"))
    p.add_argument("--prep_impl", default="auto",
                   choices=("auto", "host", "device"),
                   help="'device' warms the single-upload device-preprocess "
                        "path; 'auto' = device when --slic_impl tpu")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..runtime import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    from ..ops.pallas.precision import set_precision_mode

    set_precision_mode(args.precision)
    from ..data import nifti
    from .common import (load_cnn_from_checkpoint, load_gnn_from_checkpoint,
                         resolve_slic_fn)
    from .predict_single import predict_single_mri

    _, _, _, gnn_fwd = load_gnn_from_checkpoint(
        os.path.expanduser(args.gnn_weights))
    _, _, _, cnn_fwd = load_cnn_from_checkpoint(
        os.path.expanduser(args.cnn_weights))
    with tempfile.TemporaryDirectory(prefix="gts_warmup_") as tmp:
        for name, vol in zip(("flair", "t1", "t1ce", "t2"),
                             make_synthetic_brain()):
            nifti.save_as_nifti(vol, os.path.join(tmp, f"w_{name}.nii.gz"))
        prep_impl = args.prep_impl
        if prep_impl == "auto":
            prep_impl = "device" if args.slic_impl == "tpu" else "host"
        t0 = time.perf_counter()
        pred = predict_single_mri(
            tmp, gnn_fwd, cnn_fwd, num_nodes=args.num_nodes,
            slic_fn=resolve_slic_fn(args.slic_impl), cnn_prep=args.cnn_prep,
            prep_impl=prep_impl)
        dt = time.perf_counter() - t0
    if prep_impl == "device":
        _prime_upload_buckets()
    n_entries = len(os.listdir(cache_dir))
    print(f"Warmup predict ran in {dt:.1f}s (shape {pred.shape}); "
          f"persistent cache at {cache_dir} now holds {n_entries} programs")


def _prime_upload_buckets(channels: int = 4) -> None:
    """Compile `_unflatten_t`/`_flatten_labels_t` for every flat-upload voxel
    bucket (int16 wire, the real-BraTS case): real brain crops land in
    different buckets than the warmup synthetic, and each bucket is one small
    program — priming all of them here keeps request latency free of residual
    compiles. (Non-integral source data takes the bf16/f32 wire instead and
    pays one small compile on its first bucket — rare enough that priming all
    dtype variants here is not worth the extra deploy-time compiles.)"""
    import jax.numpy as jnp

    from ..cli.common import default_pad_shape
    from ..ops import slic_tpu

    ps = default_pad_shape()
    if ps is None:
        return
    Xp, Yp, Zp = ps
    wa = jnp.asarray(np.ones(Xp, np.float32))
    wb = jnp.asarray(np.ones(Zp, np.float32))
    wd = jnp.asarray(np.ones(Yp, np.float32))
    n_buckets = -(-(Xp * Yp * Zp) // slic_tpu.VOX_BUCKET)
    assign = jnp.zeros((Xp, Zp, Yp), jnp.int16)
    for i in range(1, n_buckets + 1):
        flat = jnp.zeros((i * slic_tpu.VOX_BUCKET, channels), jnp.int16)
        slic_tpu._unflatten_t(flat, jnp.int32(Yp), jnp.int32(Zp), wa, wb, wd)
        slic_tpu._flatten_labels_t(assign, jnp.int32(Yp), jnp.int32(Zp),
                                   vb=i * slic_tpu.VOX_BUCKET)
    print(f"Primed {n_buckets} flat-upload/label-pull bucket programs")


if __name__ == "__main__":
    main()
