"""Bulk preprocessing throughput A/B: host vs device chain (VERDICT r3 item 6).

Round 3 measured the TPU SLIC path LOSING the bulk-throughput A/B (8.1 vs
5.6 s/brain) because it shipped a padded f32 standardized volume per sample
while host threads overlapped samples across cores. Round 4 reuses the serve
path's single-upload device chain for bulk work (DataPreprocessor
prep_impl='device': flat int16 upload of real bytes only, device
normalize/standardize/smooth/SLIC, host stats via the affine map) — with the
thread pool, host stats/kNN/gz-writes for sample i-1 overlap the device work
for sample i.

Measures steady-state s/brain over the same raw brains for:
  host   — the host-native path (threads overlap SLIC across cores)
  device — prep_impl='device'

Reuses the raw brains of scripts/bench_eval.py.

Run: python scripts/bench_preprocess.py [--samples 12] [--threads 4]
Prints ONE JSON line. NOTE: never run concurrently with other heavy jobs.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import (enable_compilation_cache,
                                       enable_host_alloc_reuse)

enable_compilation_cache()
enable_host_alloc_reuse()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=12)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--workdir", type=str, default="/tmp/gts_eval_bench")
    ap.add_argument("--num_nodes", type=int, default=15000)
    args = ap.parse_args()

    from bench_eval import build_dataset
    from gnn_tumor_seg_tpu.data.preprocess import DataPreprocessor

    build_dataset(args.workdir, args.samples, args.num_nodes)  # ensures raw/
    raw = os.path.join(args.workdir, "raw")
    ids = sorted(os.listdir(raw))[: args.samples]
    import jax

    print(f"[prep] device {jax.devices()[0]}, {len(ids)} brains, "
          f"{args.threads} threads", file=sys.stderr)

    results = {}
    for impl in ("device", "host"):
        out = os.path.join(args.workdir, f"prep_ab_{impl}")
        shutil.rmtree(out, ignore_errors=True)
        pre = DataPreprocessor(
            raw, out, num_nodes=args.num_nodes, num_neighbors=10,
            boxiness=0.5, label_extension="_seg.nii.gz",
            n_threads=args.threads, prep_impl=impl,
            mri_prefix=os.path.commonprefix(ids))
        pre.all_ids = ids
        # warm one sample (compiles/page-faults), then time the rest
        t0 = time.perf_counter()
        pre.process_one(ids[0])
        warm = time.perf_counter() - t0
        pre.all_ids = ids[1:]
        t0 = time.perf_counter()
        done = pre.run()
        dt = time.perf_counter() - t0
        results[impl] = {
            "warmup_first_brain_s": round(warm, 1),
            "steady_s_per_brain": round(dt / max(len(done), 1), 2),
            "brains": len(done),
        }
        print(f"[prep] {impl}: {results[impl]}", file=sys.stderr)

    print(json.dumps({
        "metric": "preprocess_s_per_brain",
        "value": results["device"]["steady_s_per_brain"],
        "unit": "s/brain",
        "detail": {**results, "threads": args.threads,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
