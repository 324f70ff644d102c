"""Host input-pipeline benchmark at BraTS-2021 scale (1,251 brains).

The reference re-parses node-link JSON and rebuilds DGL graphs every epoch
(`data_processing/data_loader.py:67-83`, SURVEY §3.2 hotspot); this framework
loads flat .npz once and LRU-caches padded arrays. This script measures that
story at the real dataset scale (VERDICT r2 item 5): epoch wall-clock, peak
RSS, cache occupancy/evictions, and the per-stage host cost (disk load, ELL
pad, tiling-aux build).

Two phases:
  python scripts/bench_host_pipeline.py --generate --root /tmp/brats_scale
  python scripts/bench_host_pipeline.py --measure  --root /tmp/brats_scale \
      [--epochs 3] [--samples 1251]

Generation writes <root>/<id>/<id>_graph.npz samples with BraTS-graph shapes
(6,800-8,100 nodes — the 8192 node bucket — exact-degree-10 kNN-like rings,
20 features): topology does not matter for IO/caching cost, bytes and shapes
do. ~1.1 MB/sample, ~1.4 GB total.
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def generate(root: str, n_samples: int) -> None:
    from gnn_tumor_seg_tpu.data.graph_build import GraphSample
    from gnn_tumor_seg_tpu.data.store import save_graph_npz

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(n_samples):
        n = int(rng.integers(6800, 8101))
        k, half = 10, 5
        base = np.arange(n)
        s = np.concatenate([(base + o) % n for o in range(1, half + 1)])
        d = np.tile(base, half)
        src = np.concatenate([s, d]).astype(np.int32)
        dst = np.concatenate([d, s]).astype(np.int32)
        sample = GraphSample(
            feats=rng.normal(size=(n, 20)).astype(np.float32),
            labels=rng.integers(0, 4, n).astype(np.int32),
            centroids=rng.uniform(0, 240, (n, 3)).astype(np.float32),
            src=src, dst=dst, sv_partition=None,
            edge_weights=None,
        )
        sid = f"SYN_{i:05d}"
        save_graph_npz(os.path.join(root, sid, f"{sid}_graph.npz"), sample)
        if (i + 1) % 250 == 0:
            log(f"[gen] {i + 1}/{n_samples}")
    dt = time.perf_counter() - t0
    du = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(root) for f in fs
    )
    log(f"[gen] {n_samples} samples in {dt:.0f}s, {du / 2**30:.2f} GiB on disk")


def measure(root: str, epochs: int, batch_size: int) -> None:
    from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset
    from gnn_tumor_seg_tpu.data.store import load_graph_npz
    from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

    log(f"[measure] device: {jax.devices()[0]}  rss {rss_mb():.0f} MB")

    # stage microcosts on one sample (hot page cache)
    data = ImageGraphDataset(root, read_image=False)
    fp = data._fp(data.ids[0], "_graph.npz")
    t0 = time.perf_counter()
    for _ in range(5):
        s = load_graph_npz(fp)
    t_load = (time.perf_counter() - t0) / 5
    from gnn_tumor_seg_tpu.ops.graph import ell_from_edges
    from gnn_tumor_seg_tpu.ops.pallas.tiling import build_tiled_aux

    n_pad, d_pad = data.shape_budget()
    t0 = time.perf_counter()
    for _ in range(5):
        nbr, mask = ell_from_edges(s.feats.shape[0], s.src, s.dst,
                                   n_pad=n_pad, d_pad=d_pad)
    t_pad = (time.perf_counter() - t0) / 5
    # host-side aux build (the trainer path; never touches the device)
    t0 = time.perf_counter()
    for _ in range(5):
        build_tiled_aux(nbr[None], mask[None], tile=64, as_numpy=True)
    t_aux = (time.perf_counter() - t0) / 5
    log(f"[measure] per-sample host stages: npz load {t_load*1e3:.1f} ms, "
        f"ELL pad {t_pad*1e3:.1f} ms, tiling aux {t_aux*1e3:.1f} ms")

    t_scan0 = time.perf_counter()
    data2 = ImageGraphDataset(root, read_image=False)
    data2.shape_budget()
    t_scan = time.perf_counter() - t_scan0
    log(f"[measure] dataset discovery + shape-budget scan: {t_scan:.1f} s")

    hp = HyperParams(layer_sizes=[256] * 6)
    hp.batch_size = batch_size
    t0 = time.perf_counter()
    trainer = GNNTrainer("GSpool", hp, data2, seed=0)
    t_init = time.perf_counter() - t0

    ep_rows = []
    for e in range(epochs):
        t0 = time.perf_counter()
        loss = trainer.run_epoch()
        dt = time.perf_counter() - t0
        row = {
            "epoch": e, "seconds": round(dt, 1), "loss": round(loss, 4),
            "steps": trainer.last_epoch_stats["steps"],
            "edges_per_s": round(trainer.last_epoch_stats["edges_per_s"]),
            "rss_peak_mb": round(rss_mb()),
            "trainer_cache_mb": round(trainer._graph_cache.nbytes / 2**20),
            "trainer_cache_n": len(trainer._graph_cache),
            "device_cache_mb": round(trainer._device_cache.nbytes / 2**20),
            "device_cache_n": len(trainer._device_cache),
            "dataset_cache_mb": round(data2._cache.nbytes / 2**20),
            "dataset_cache_n": len(data2._cache),
        }
        ep_rows.append(row)
        log(f"[measure] {row}")

    print(json.dumps({
        "metric": "host_pipeline_epoch_s",
        "value": ep_rows[-1]["seconds"],
        "unit": "s",
        "detail": {
            "samples": len(data2), "batch_size": batch_size,
            "trainer_init_s": round(t_init, 1),
            "scan_s": round(t_scan, 1),
            "stage_ms": {"npz_load": round(t_load * 1e3, 1),
                         "ell_pad": round(t_pad * 1e3, 1),
                         "tiling_aux": round(t_aux * 1e3, 1)},
            "epochs": ep_rows,
            "cache_budget_mb": int(os.environ.get("GTS_GRAPH_CACHE_MB",
                                                  "4096")),
            "device": str(jax.devices()[0]),
        },
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--samples", type=int, default=1251)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=6)
    args = ap.parse_args()
    if args.generate:
        generate(args.root, args.samples)
    if args.measure:
        measure(args.root, args.epochs, args.batch_size)


if __name__ == "__main__":
    main()
