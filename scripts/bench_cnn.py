"""Refinement-CNN TRAINING engine benchmark on hardware (VERDICT r3 item 4).

The reference trains the CNN one tumor crop at a time
(`model/cnn_model.py:33,36-56`, bs=1, Conv3d k=5 x2). This measures what that
engine costs on the chip:

  A. step microbench — fwd+bwd+AdamW step time for a handful of 16-voxel
     crop buckets plus the crop-floor shape. The per-bucket COMPILE cost is
     the headline finding: a fresh CNN train-step compile through the remote
     tunnel measured 5-30+ min under load (a 24-brain first epoch hit 20+
     distinct buckets and never finished its compiles inside 50 min), which
     is why CNNTrainer now floors crops to one shared shape by default
     (crop_floor; --samples is deliberately small here).
  B. real epoch wall-clock — CNNTrainer.run_epoch at reference defaults over
     the full-scale labelled dataset of scripts/bench_eval.py (requires that
     dataset; GNN logits are generated with a random-weight flagship GNN —
     latency does not depend on weight values).

Run: python scripts/bench_cnn.py [--workdir /tmp/gts_eval_bench]
Prints ONE JSON line. NOTE: never run concurrently with other heavy jobs.
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


def d2h_sync(x) -> float:
    """Force device completion through the relay (block_until_ready is not
    reliable through it — CLAUDE.md)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def step_microbench(trainer, rng, n_samples: int, reps: int):
    """Realistic tumor-crop distribution -> per-bucket warm step times."""
    import jax.numpy as jnp

    from gnn_tumor_seg_tpu.train.cnn_trainer import _CROP_BUCKET

    # the r4 crop-floor fix first: ONE compiled shape for all typical crops
    from gnn_tumor_seg_tpu.train.cnn_trainer import DEFAULT_CROP_FLOOR

    fb = DEFAULT_CROP_FLOOR
    x = jnp.asarray(rng.normal(size=(1, *fb, 8)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 4, (1, *fb)).astype(np.int32))
    mask = jnp.ones((1, *fb), jnp.float32)
    t0 = time.perf_counter()
    trainer.state, loss = trainer._step(trainer.state, x, lab, mask)
    d2h_sync(loss)
    floor_compile = time.perf_counter() - t0
    print(f"[cnn] crop-floor {fb} first call (compile): {floor_compile:.0f}s",
          file=sys.stderr, flush=True)
    floor_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        trainer.state, loss = trainer._step(trainer.state, x, lab, mask)
        d2h_sync(loss)
        floor_times.append(time.perf_counter() - t0)
    print(f"[cnn] crop-floor warm step: "
          f"{np.median(floor_times)*1000:.1f} ms", file=sys.stderr, flush=True)

    shapes = np.clip(rng.normal(70, 18, (n_samples, 3)), 32, 128).astype(int)
    buckets = {}
    compile_s = 0.0
    for dims in shapes:
        b = tuple(int(-(-d // _CROP_BUCKET) * _CROP_BUCKET) for d in dims)
        x = jnp.asarray(rng.normal(size=(1, *b, 8)).astype(np.float32))
        lab = jnp.asarray(rng.integers(0, 4, (1, *b)).astype(np.int32))
        mask = jnp.ones((1, *b), jnp.float32)
        first = b not in buckets
        t0 = time.perf_counter()
        trainer.state, loss = trainer._step(trainer.state, x, lab, mask)
        d2h_sync(loss)
        dt = time.perf_counter() - t0
        if first:
            compile_s += dt
            print(f"[cnn] bucket {b} first call: {dt:.0f}s",
                  file=sys.stderr, flush=True)
            buckets[b] = []
            for _ in range(reps):       # warm reps
                t0 = time.perf_counter()
                trainer.state, loss = trainer._step(trainer.state, x, lab,
                                                    mask)
                d2h_sync(loss)
                buckets[b].append(time.perf_counter() - t0)
        else:
            buckets[b].append(dt)
    per_bucket = {str(k): round(float(np.median(v)) * 1000, 1)
                  for k, v in sorted(buckets.items())}
    flagship = max(buckets, key=lambda k: np.prod(k))

    return {
        "distinct_buckets": len(buckets),
        "crops_sampled": n_samples,
        "compile_total_s": round(compile_s, 1),
        "step_ms_per_bucket": per_bucket,
        "flagship_bucket": str(flagship),
        "flagship_step_ms": round(float(np.median(buckets[flagship])) * 1000,
                                  1),
        "crop_floor_shape": str(fb),
        "crop_floor_step_ms": round(float(np.median(floor_times)) * 1000, 1),
        "crop_floor_first_call_s": round(floor_compile, 1),
    }


def epoch_bench(workdir: str, hp, epochs: int):
    """Real CNNTrainer.run_epoch over the bench_eval dataset."""
    import jax

    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data.dataset import (ImageGraphDataset,
                                                PredLogitDataset)
    from gnn_tumor_seg_tpu.models.factory import init_graph_net
    from gnn_tumor_seg_tpu.train.checkpoint import save_checkpoint
    from gnn_tumor_seg_tpu.train.cnn_trainer import CNNTrainer

    proc = os.path.join(workdir, "proc")
    logits = os.path.join(workdir, "logits")
    if not os.path.isdir(proc):
        print(f"[cnn] no dataset at {proc}; run scripts/bench_eval.py first "
              f"(skipping epoch bench)", file=sys.stderr)
        return None
    if not os.path.isdir(logits) or not os.listdir(logits):
        os.makedirs(logits, exist_ok=True)
        gnn_hp = HyperParams(layer_sizes=[256] * 6)
        gnn = init_graph_net("GSpool", gnn_hp)
        ckpt = os.path.join(workdir, "bench_gnn.ckpt")
        save_checkpoint(ckpt, gnn.init(jax.random.PRNGKey(0)), "GSpool",
                        gnn_hp)
        t0 = time.perf_counter()
        from gnn_tumor_seg_tpu.cli import generate_gnn_predictions

        generate_gnn_predictions.main(
            ["-d", proc, "-o", logits, "-w", ckpt, "-f", "logits"])
        print(f"[cnn] logits generated in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr)

    image_ds = ImageGraphDataset(proc, read_image=True, read_graph=False,
                                 read_label=True)
    logit_ds = PredLogitDataset(logits)
    trainer = CNNTrainer(hp, image_ds, logit_ds)
    times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        loss = trainer.run_epoch()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"[cnn] epoch {e}: {dt:.1f}s ({dt/len(image_ds.ids):.2f} "
              f"s/brain), loss {loss:.4f}", file=sys.stderr)
    warm = min(times[1:]) if len(times) > 1 else times[0]
    return {
        "brains": len(image_ds.ids),
        "epoch_s_cold": round(times[0], 1),
        "epoch_s_warm": round(warm, 1),
        "s_per_brain_warm": round(warm / len(image_ds.ids), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/gts_eval_bench")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--precision", default="fast", choices=("exact", "fast"))
    args = ap.parse_args()

    import jax

    from gnn_tumor_seg_tpu.config import hardcoded_hyperparameters
    from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode
    from gnn_tumor_seg_tpu.train.cnn_trainer import CNNTrainer

    set_precision_mode(args.precision)
    hp = hardcoded_hyperparameters("CNN")
    rng = np.random.default_rng(0)
    print(f"[cnn] device {jax.devices()[0]} precision={args.precision}",
          file=sys.stderr)
    trainer = CNNTrainer(hp)
    micro = step_microbench(trainer, rng, args.samples, args.reps)
    epoch = epoch_bench(args.workdir, hp, args.epochs)

    detail = {"micro": micro, "epoch": epoch,
              "precision": args.precision, "device": str(jax.devices()[0])}
    print(json.dumps({
        "metric": "cnn_train_step_ms",
        "value": micro["flagship_step_ms"],
        "unit": "ms",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
