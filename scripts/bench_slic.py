"""SLIC throughput: host (C++/OpenMP canonical) vs TPU assignment path.

Times supervoxelization of one BraTS-scale brain-cropped volume at the
reference's preprocessing scale (15,000 requested supervoxels, sigma=1,
compactness 0.5 — `/root/reference/scripts/preprocess_dataset.py:177-179`)
three ways:

  host    data/slic.py (native C++ OpenMP assignment; the preprocess default)
  tpu     ops/slic_tpu.py, f32 upload
  tpu16   ops/slic_tpu.py, bf16 upload (halved H2D; device math stays f32)

Reports a stage split for the TPU path (device smooth+assign incl. transfers
/ host connectivity+relabel; host scipy smoothing shown for reference — the
TPU path folds the Gaussian into the device program by default) and the
partition agreement vs host.

Run: python scripts/bench_slic.py [--runs 3] [--num_nodes 15000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import (enable_compilation_cache,
                                       enable_host_alloc_reuse)

enable_compilation_cache()
enable_host_alloc_reuse()

import numpy as np


def _agreement(a, b):
    a_f, b_f = a.ravel(), b.ravel()
    conf = np.zeros((int(a_f.max()) + 1, int(b_f.max()) + 1), np.int64)
    np.add.at(conf, (a_f, b_f), 1)
    return float(np.mean(conf.argmax(1)[a_f] == b_f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num_nodes", type=int, default=15000)
    args = ap.parse_args()

    import jax
    from scipy import ndimage

    from full_scale_smoke import make_brain
    from gnn_tumor_seg_tpu.data.image import (determine_brain_crop,
                                              normalize_img, standardize_img)
    from gnn_tumor_seg_tpu.data.preprocess import STANDARDIZATION_STATS
    from gnn_tumor_seg_tpu.data.slic import slic_supervoxels
    from gnn_tumor_seg_tpu.ops.slic_tpu import (slic_assign_tpu,
                                                slic_supervoxels_tpu)

    print(f"[slic] device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    mods, _ = make_brain(rng)
    image = np.stack(mods, -1).astype(np.float32)
    crop = determine_brain_crop(image)
    cropped = image[crop]
    mean = np.asarray(STANDARDIZATION_STATS[0], np.float32)
    std = np.asarray(STANDARDIZATION_STATS[1], np.float32)
    vol = standardize_img(normalize_img(cropped), mean, std)
    print(f"[slic] volume {vol.shape}", file=sys.stderr)

    def timed(fn, label):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"[slic] {label}: {dt:.2f}s", file=sys.stderr)
        return out, dt

    # ---- host canonical (native C++ when available)
    host_lab, _ = timed(lambda: slic_supervoxels(
        vol, n_segments=args.num_nodes, compactness=0.5), "host warmup")
    host_times = [timed(lambda: slic_supervoxels(
        vol, n_segments=args.num_nodes, compactness=0.5), "host")[1]
        for _ in range(args.runs)]

    # ---- TPU path (first call pays jit compile through the tunnel)
    _, tpu_cold = timed(lambda: slic_supervoxels_tpu(
        vol, n_segments=args.num_nodes, compactness=0.5), "tpu cold")
    tpu_lab = None
    tpu_times = []
    for _ in range(args.runs):
        lab, dt = timed(lambda: slic_supervoxels_tpu(
            vol, n_segments=args.num_nodes, compactness=0.5), "tpu")
        tpu_lab, _ = lab, tpu_times.append(dt)

    import jax.numpy as jnp

    tpu16_times = [timed(lambda: slic_supervoxels_tpu(
        vol, n_segments=args.num_nodes, compactness=0.5,
        input_dtype=jnp.bfloat16), "tpu bf16")[1] for _ in range(args.runs)]

    # ---- stage split of a warm TPU run (device smoothing, the default)
    t0 = time.perf_counter()
    np.stack([ndimage.gaussian_filter(vol[..., c], 1.0)
              for c in range(vol.shape[-1])], -1)
    t_smooth = time.perf_counter() - t0  # host reference only
    t0 = time.perf_counter()
    raw = slic_assign_tpu(vol, args.num_nodes, 0.5, smooth_sigma=1.0)
    t_assign = time.perf_counter() - t0
    t0 = time.perf_counter()
    from gnn_tumor_seg_tpu.data import native
    from gnn_tumor_seg_tpu.data.slic import (_enforce_connectivity, _init_grid,
                                             _relabel_contiguous)

    if native.available():
        fixed = native.enforce_connectivity_native(raw)
    else:
        _, step = _init_grid(vol.shape[:3], args.num_nodes)
        fixed = _enforce_connectivity(raw, int(step ** 3 * 0.25))
    _relabel_contiguous(fixed)
    t_post = time.perf_counter() - t0

    result = {
        "metric": "slic_tpu_s_per_brain",
        "value": round(float(np.median(tpu_times)), 2),
        "unit": "s",
        "vs_baseline": round(float(np.median(host_times))
                             / float(np.median(tpu_times)), 2),
        "detail": {
            "host_s": round(float(np.median(host_times)), 2),
            "tpu_s": [round(t, 2) for t in tpu_times],
            "tpu_bf16_s": [round(t, 2) for t in tpu16_times],
            "tpu_cold_s": round(tpu_cold, 1),
            "host_scipy_smooth_ref_s": round(t_smooth, 2),
            "stage_smooth_assign_device_s": round(t_assign, 2),
            "stage_connectivity_host_s": round(t_post, 2),
            "agreement_vs_host": round(_agreement(host_lab, tpu_lab), 4),
            "n_segments_host": int(host_lab.max()) + 1,
            "n_segments_tpu": int(tpu_lab.max()) + 1,
            "volume": list(vol.shape),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
