"""Serve-latency bench: single-MRI end-to-end prediction (Docker contract).

Times the `cli.predict_single` chain on one BraTS-sized synthetic brain with
reference-shaped models (GSpool 7x256 GNN + 2-layer CNN): total warm latency
plus the stage split, measured INSIDE the real predict path (stage_times hooks
in cli/common.py + cli/predict_single.py), so the split always reflects what
the product actually runs — bf16 crop upload + on-device argmax under
--precision fast, TPU supervoxelization under --slic_impl tpu. The reference's
deployment mode is this exact per-MRI chain
(`/root/reference/README.md:127-173`, `generate_joint_predictions.py:59-73`).

Run: python scripts/bench_serve.py [--runs 3] [--precision fast]
         [--slic_impl auto|tpu]
NOTE (CLAUDE.md): never run concurrently with another heavy job on this VM —
relay/CPU contention corrupts the numbers.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import (enable_compilation_cache,
                                       enable_host_alloc_reuse)

enable_compilation_cache()
enable_host_alloc_reuse()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num_nodes", type=int, default=15000)
    ap.add_argument("--precision", default="fast", choices=("exact", "fast"),
                    help="'fast' = trainer-default numerics (bf16 CNN "
                         "transfers); 'exact' = f32 everywhere")
    ap.add_argument("--slic_impl", default="auto",
                    choices=("auto", "native", "numpy", "tpu"))
    ap.add_argument("--cnn_prep", default="device", choices=("device", "host"))
    ap.add_argument("--prep_impl", default="auto",
                    choices=("auto", "host", "device"),
                    help="'device' = single-upload device preprocessing "
                         "(quantile normalize + standardize + SLIC share one "
                         "upload; standardized volume stays device-resident); "
                         "'auto' = device when --slic_impl tpu")
    args = ap.parse_args()

    import jax
    from full_scale_smoke import make_brain
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data import nifti
    from gnn_tumor_seg_tpu.models.factory import init_graph_net
    from gnn_tumor_seg_tpu.models.refine_cnn import CnnRefinementNet
    from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode
    from gnn_tumor_seg_tpu.train.checkpoint import save_checkpoint
    from gnn_tumor_seg_tpu.cli.common import (load_cnn_from_checkpoint,
                                              load_gnn_from_checkpoint,
                                              resolve_slic_fn)
    from gnn_tumor_seg_tpu.cli.predict_single import predict_single_mri

    set_precision_mode(args.precision)
    slic_fn = resolve_slic_fn(args.slic_impl)
    prep = args.cnn_prep
    prep_impl = args.prep_impl
    if prep_impl == "auto":
        prep_impl = "device" if args.slic_impl == "tpu" else "host"

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    rng = np.random.default_rng(0)
    mods, _ = make_brain(rng)
    in_dir = os.path.join(tmp, "input")
    os.makedirs(in_dir)
    for name, vol in zip(("flair", "t1", "t1ce", "t2"), mods):
        nifti.save_as_nifti(vol, os.path.join(in_dir, f"brain_{name}.nii.gz"))

    # reference-shaped checkpoints (random init: latency does not depend on
    # the weights' values)
    hp = HyperParams(layer_sizes=[256] * 6)
    gnn = init_graph_net("GSpool", hp)
    save_checkpoint(os.path.join(tmp, "gnn.ckpt"),
                    gnn.init(jax.random.PRNGKey(0)), "GSpool", hp)
    cnn_hp = HyperParams(in_feats=8, layer_sizes=[16])
    cnn = CnnRefinementNet(8, 4, [16])
    save_checkpoint(os.path.join(tmp, "cnn.ckpt"),
                    cnn.init(jax.random.PRNGKey(1)), "CNN", cnn_hp)

    _, _, _, gnn_fwd = load_gnn_from_checkpoint(os.path.join(tmp, "gnn.ckpt"))
    _, _, _, cnn_fwd = load_cnn_from_checkpoint(os.path.join(tmp, "cnn.ckpt"))

    print(f"[serve] device: {jax.devices()[0]} precision={args.precision} "
          f"slic={args.slic_impl}", file=sys.stderr)
    t0 = time.perf_counter()
    pred = predict_single_mri(in_dir, gnn_fwd, cnn_fwd,
                              num_nodes=args.num_nodes, slic_fn=slic_fn,
                              cnn_prep=prep, prep_impl=prep_impl)
    cold = time.perf_counter() - t0
    assert pred.shape == (240, 240, 155), pred.shape
    print(f"[serve] cold (incl. compile): {cold:.1f}s", file=sys.stderr)

    # stage split measured on EVERY warm run; per-stage MEDIANS are reported
    # so one relay-variance outlier cannot skew the published numbers
    # (advisor r3 finding on the last-run-only split)
    warm, stage_runs = [], []
    for i in range(args.runs):
        st = {}
        t0 = time.perf_counter()
        predict_single_mri(in_dir, gnn_fwd, cnn_fwd,
                           num_nodes=args.num_nodes, slic_fn=slic_fn,
                           stage_times=st, cnn_prep=prep, prep_impl=prep_impl)
        warm.append(time.perf_counter() - t0)
        stage_runs.append(st)
        print(f"[serve] warm run {i}: {warm[-1]:.2f}s", file=sys.stderr)
    stages = {}
    for k in stage_runs[-1]:
        vals = [r[k] for r in stage_runs if k in r]
        if isinstance(vals[-1], float):
            stages[k] = float(np.median(vals))
        else:
            stages[k] = vals[-1]

    detail = {
        "warm_runs_s": [round(w, 2) for w in warm],
        "cold_s": round(cold, 1),
        "precision": args.precision,
        "slic_impl": args.slic_impl,
        "cnn_prep": prep,
        "prep_impl": prep_impl,
        "device": str(jax.devices()[0]),
    }
    for k, v in stages.items():
        detail[f"stage_{k}" if isinstance(v, float) else k] = (
            round(v, 2) if isinstance(v, float) else v
        )
    result = {
        "metric": "serve_latency_single_mri_s",
        "value": round(float(np.median(warm)), 2),
        "unit": "s",
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
