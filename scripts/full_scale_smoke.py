"""Full-scale smoke: BraTS-sized synthetic brains through the whole pipeline.

Generates N 240x240x155 4-modality volumes with spherical tumors, preprocesses
them at reference scale (15000 requested supervoxels, k=10), trains the
flagship 7-layer GSpool-256 for a few epochs on the default backend, and
evaluates. Prints per-stage timings — the end-to-end sanity + performance check
at real data scale.

Run: python scripts/full_scale_smoke.py [--samples 4] [--epochs 3] [--workdir DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def make_brain(rng, shape=(240, 240, 155), radii=(36, 24, 12)):
    """radii = (edema, NCR/NET, ET) sphere radii. The default ET core
    (r=12, ~7k voxels ≈ 4 supervoxels at the 15k reference scale) sits at
    graph granularity — fine for throughput benches, too small to validate
    ET-region learning; pass e.g. (44, 32, 20) for an ET-resolvable brain
    (scripts/validate_et_quality.py)."""
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    center = np.array(shape) / 2 + rng.integers(-10, 11, 3)
    r = np.linalg.norm((grid - center) / (np.array(shape) / 2.4), axis=-1)
    brain = r < 1.0
    tumor_c = center + rng.integers(-40, 41, 3)
    tr = np.linalg.norm(grid - tumor_c, axis=-1)
    labels = np.zeros(shape, np.int16)
    labels[(tr < radii[0]) & brain] = 2
    labels[(tr < radii[1]) & brain] = 1
    labels[(tr < radii[2]) & brain] = 4
    mods = []
    # per-class modality contrast, loosely mimicking BraTS (modalities are
    # [flair, t1, t1ce, t2]): edema bright in FLAIR/T2, NCR dark in T1ce,
    # ET enhancing in T1ce. Without class-dependent contrast (the pre-r5
    # uniform +120+50m) the tumor sub-regions are indistinguishable by the
    # quantile features and CT/ET Dice are unlearnable by construction.
    offsets = {2: (200, 60, 40, 160),      # edema
               1: (90, 40, -120, 70),      # NCR/NET
               4: (110, 70, 260, 90)}      # ET
    for m in range(4):
        vol = np.zeros(shape, np.int16)
        vol[brain] = 300 + 60 * m + rng.integers(0, 80, int(brain.sum()))
        for cls, off in offsets.items():
            sel = labels == cls
            vol[sel] += off[m] + rng.integers(-20, 21, int(sel.sum())).astype(np.int16)
        mods.append(vol)
    return mods, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workdir", type=str, default="/tmp/gts_full_scale")
    ap.add_argument("--num_nodes", type=int, default=15000)
    args = ap.parse_args()

    from gnn_tumor_seg_tpu.data import nifti
    from gnn_tumor_seg_tpu.data.preprocess import DataPreprocessor

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
        dt = time.time() - t0
        print(f"[preprocess] {len(done)} brains in {dt:.1f}s "
              f"({dt/max(len(done),1):.1f}s/brain incl. SLIC@{args.num_nodes})")

    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset
    from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

    ds = ImageGraphDataset(proc)
    n_nodes = [int(ds.get_graph(i).n_nodes[0]) for i in range(len(ds))]
    print(f"[dataset] graphs: {n_nodes} nodes; shape budget {ds.shape_budget()}")

    hp = HyperParams(layer_sizes=[256] * 6, n_epochs=args.epochs, lr=1e-3,
                     batch_size=min(6, len(ds)))
    trainer = GNNTrainer("GSpool", hp, ds, seed=0)
    print(f"[train] impl={trainer.impl}")
    for e in range(args.epochs):
        t0 = time.time()
        loss = trainer.run_epoch()
        s = trainer.last_epoch_stats
        print(f"[train] epoch {e+1}: loss={loss:.4f} {time.time()-t0:.1f}s "
              f"({s.get('edges_per_s', 0)/1e6:.1f}M edges/s)")

    t0 = time.time()
    metrics, counts = trainer.evaluate(ds)
    print(f"[eval] {time.time()-t0:.1f}s  loss={metrics[0]:.4f} "
          f"node_dice={np.round(metrics[1:4],3).tolist()} "
          f"voxel_dice={np.round(metrics[4:7],3).tolist()} "
          f"hd95={np.round(metrics[7:10],2).tolist()}")
    print(json.dumps({"ok": True, "nodes": n_nodes,
                      "edges_per_s": trainer.last_epoch_stats.get("edges_per_s")}))


if __name__ == "__main__":
    main()
