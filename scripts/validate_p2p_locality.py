"""Validate p2p halo locality at flagship scale (VERDICT r4 item 5).

The p2p (boundary-only ppermute) halo regime assumes 1-shard edge locality:
contiguous node partitions of spatially ordered supervoxel graphs only have
edges into adjacent shards. This script checks that claim on REAL full-scale
graph structure — BraTS-sized (240x240x155) synthetic brains preprocessed at
reference scale (15000 requested supervoxels, k=10, the
`scripts/preprocess_dataset.py:177-179` defaults) — instead of the small
synthetic fixtures the unit tests use:

  1. generate + preprocess 6 full-scale brains (cached in --workdir);
  2. build the 6-brain disjoint union (the flagship training batch shape)
     and partition it into 8 contiguous shards with partition_graph_p2p;
  3. assert NO all_gather fallback triggers, record the realized halo width
     W, the cross-shard edge fraction, and the per-device ICI bytes of the
     flagship 7-layer GSpool-256 step from the real structure;
  4. optionally (--step) run one real halo train step on the 8-virtual-CPU
     device mesh at these exact shapes.

Run:  JAX_PLATFORMS=cpu python scripts/validate_p2p_locality.py
Emits one JSON line; results recorded in BASELINE.md (halo table).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=6)
    ap.add_argument("--n_parts", type=int, default=8)
    ap.add_argument("--workdir", type=str, default="/tmp/gts_full_scale_p2p")
    ap.add_argument("--num_nodes", type=int, default=15000)
    ap.add_argument("--step", action="store_true",
                    help="also run one halo train step on the CPU mesh")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if args.step and "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.n_parts}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from full_scale_smoke import make_brain

    from gnn_tumor_seg_tpu.data import nifti
    from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset
    from gnn_tumor_seg_tpu.data.preprocess import DataPreprocessor
    from gnn_tumor_seg_tpu.parallel.halo import (exchange_bytes_per_step,
                                                 partition_graph_p2p)
    from gnn_tumor_seg_tpu.parallel.halo_data import union_samples

    raw = os.path.join(args.workdir, "raw")
    proc = os.path.join(args.workdir, "proc")
    rng = np.random.default_rng(0)
    if not os.path.exists(raw):
        t0 = time.time()
        for i in range(args.samples):
            d = os.path.join(raw, f"FullScale_{i:03d}")
            os.makedirs(d, exist_ok=True)
            mods, labels = make_brain(rng)
            for vol, ext in zip(mods, ["_flair.nii.gz", "_t1.nii.gz",
                                       "_t1ce.nii.gz", "_t2.nii.gz"]):
                nifti.write_nifti(vol, os.path.join(d, f"case{ext}"))
            nifti.write_nifti(labels, os.path.join(d, "case_seg.nii.gz"))
        print(f"[gen] {args.samples} brains in {time.time()-t0:.1f}s")
    if not os.path.exists(proc):
        t0 = time.time()
        pre = DataPreprocessor(raw, proc, num_nodes=args.num_nodes,
                               num_neighbors=10, boxiness=0.5,
                               label_extension="_seg.nii.gz", n_threads=2)
        done = pre.run()
        print(f"[preprocess] {len(done)} brains in {time.time()-t0:.1f}s")

    ds = ImageGraphDataset(proc)
    samples = [ds.get_sample(i) for i in range(len(ds))]
    feats, src, dst, labels, offsets, weights = union_samples(samples)
    n = feats.shape[0]
    print(f"[union] {len(samples)} graphs, {n} nodes, {len(src)} directed "
          f"edges, per-brain {np.diff(offsets).tolist()}")

    # raw locality of the union structure under contiguous sharding
    per = -(-n // args.n_parts)
    jump = np.abs(src // per - dst // per)
    cross = int((jump == 1).sum())
    nonlocal_edges = int((jump > 1).sum())
    print(f"[locality] shards={args.n_parts} per={per} cross-shard edges: "
          f"{cross} ({cross/len(src):.3%}), non-adjacent: {nonlocal_edges}")

    t0 = time.time()
    try:
        pg, W = partition_graph_p2p(feats, src, dst, labels,
                                    n_parts=args.n_parts, tiled=True, tile=64)
        fallback = False
    except ValueError as e:
        print(f"[FAIL] p2p fallback triggered: {e}")
        fallback = True
        pg = W = None
    build_s = time.time() - t0

    out = {
        "ok": not fallback and nonlocal_edges == 0,
        "n_parts": args.n_parts,
        "union_nodes": n,
        "union_edges": len(src),
        "cross_shard_edge_fraction": cross / len(src),
        "nonlocal_edges": nonlocal_edges,
        "build_seconds": round(build_s, 2),
    }
    if not fallback:
        from gnn_tumor_seg_tpu.models.sage import GraphSage

        flag = GraphSage(20, [256] * 6, 4, "pool")
        acc_f32 = exchange_bytes_per_step(flag, pg, "p2p", halo_width=W)
        acc_bf16 = exchange_bytes_per_step(flag, pg, "p2p", halo_width=W,
                                           dtype_bytes=2)
        out.update({
            "halo_width": W,
            "shard_rows": pg.shard_size,
            "table_rows": pg.table_rows,
            "halo_fraction": 2 * W / pg.shard_size,
            "tiling_unique_budget": pg.tiled.unique_budget,
            "ici_step_bytes_per_device_exact": acc_f32["step_bytes_per_device"],
            "ici_step_bytes_per_device_fast": acc_bf16["step_bytes_per_device"],
        })
        print(f"[p2p] W={W} rows (shard={pg.shard_size}, halo fraction "
              f"{out['halo_fraction']:.2%}); flagship step ICI/device: "
              f"{acc_bf16['step_bytes_per_device']/1e6:.3f} MB fast / "
              f"{acc_f32['step_bytes_per_device']/1e6:.3f} MB exact")

        if args.step:
            from gnn_tumor_seg_tpu.config import HyperParams
            from gnn_tumor_seg_tpu.parallel.halo_trainer import HaloTrainer
            from gnn_tumor_seg_tpu.parallel.mesh import make_mesh

            hp = HyperParams(layer_sizes=[256] * 6, lr=1e-4)
            mesh = make_mesh(args.n_parts, 1)
            tr = HaloTrainer("GSpool", hp, [pg], mesh, variant="p2p",
                             halo_width=W)
            t0 = time.time()
            loss = tr.run_epoch()
            out["cpu_mesh_step_seconds"] = round(time.time() - t0, 1)
            out["step_loss"] = round(float(loss), 4)
            print(f"[step] one flagship halo step on the CPU mesh: "
                  f"{out['cpu_mesh_step_seconds']}s, loss={loss:.4f}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
