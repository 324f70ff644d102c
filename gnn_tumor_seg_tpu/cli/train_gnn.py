"""CLI: train a GNN on preprocessed supervoxel graphs (k-fold or full dataset).

Argument contract mirrors `scripts/train_gnn.py:64-89`; k=1 trains on the full
dataset. Checkpoints + progress TSV land in the output dir.
Run: python -m gnn_tumor_seg_tpu.cli.train_gnn -d <processed> -o <logs> -r run1

Distributed training (no reference counterpart — SURVEY §2.3) is launched from
the same entry point:

  --parallel dp   --mesh 4[,2]   data(+tensor)-parallel minibatch training
                                 (parallel/dp.py): the graph batch shards over
                                 the mesh "data" axis, weights optionally over
                                 "model"; XLA GSPMD inserts the psums over ICI.
  --parallel halo --mesh 8       node-partitioned giant-graph training
                                 (parallel/halo*.py): each step's minibatch is
                                 ONE disjoint-union graph split across all
                                 devices — for graphs that do not fit a chip.
                                 --halo_variant p2p exchanges only boundary
                                 rows (ppermute); all_gather works for any
                                 edge structure (automatic fallback).

Multi-host SPMD: start the same command on every host with --num_processes,
--process_id and --coordinator host:port (mesh axes then span all hosts'
devices). DP hosts read only their shard of the samples (process_shard), all
hosts run identical step counts, and exactly one host writes checkpoints and
progress files (parallel/multihost.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import hardcoded_hyperparameters, random_hyperparameters
from ..data.dataset import ImageGraphDataset
from ..train import folds
from ..train.gnn_trainer import GNNTrainer


class _SubsetView:
    """A view of a dataset restricted to given indices (train-fold view /
    per-process shard).

    Shares the underlying cache; exposes the same data protocol the trainer
    expects."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = list(indices)
        self.ids = [base.ids[i] for i in self.indices]

    def __len__(self):
        return len(self.indices)

    def get_graph(self, i):
        return self.base.get_graph(self.indices[i])

    def get_sample(self, i):
        return self.base.get_sample(self.indices[i])

    def get_supervoxel_partitioning(self, mri_id):
        return self.base.get_supervoxel_partitioning(mri_id)

    def get_voxel_labels(self, mri_id):
        return self.base.get_voxel_labels(mri_id)

    def shape_budget(self):
        return self.base.shape_budget()


def apply_hp_overrides(hp, overrides):
    """Apply --hp KEY=VAL overrides (Python-literal values) to a HyperParams."""
    import ast
    import dataclasses

    known = {f.name for f in dataclasses.fields(type(hp))}
    for item in overrides:
        key, _, val = item.partition("=")
        key = key.strip()
        if key not in known:
            raise SystemExit(f"--hp: unknown HyperParams field {key!r} "
                             f"(known: {sorted(known)})")
        try:
            parsed = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            parsed = val
        hp = dataclasses.replace(hp, **{key: parsed})
    return hp


def document_metrics(fp: str, description: str, results,
                     coordinator: bool = True) -> None:
    """Pretty-print + progress-file row (`scripts/train_gnn.py:48-59`)."""
    metrics, counts = np.around(results[0], 4), results[1]
    print(f"\n#{description} Results#")
    print("Loss:", metrics[0])
    print("Predicted Node Counts:", counts[0:4])
    print("Label Node Counts:", counts[4:8])
    print(f"WT Node Dice: {metrics[1]}, CT Node Dice: {metrics[2]}, ET Node Dice: {metrics[3]}")
    print(f"WT Voxel Dice: {metrics[4]}, CT Voxel Dice: {metrics[5]}, ET Voxel Dice: {metrics[6]}")
    print(f"WT HD95: {metrics[7]}, CT HD95: {metrics[8]}, ET HD95: {metrics[9]}")
    if coordinator:
        folds.update_progress_file(fp, description, metrics[0], metrics[4:7])


# ---------------------------------------------------------------------------
# minibatch regimes: single-device + DP/TP (same engine, different placement)
# ---------------------------------------------------------------------------


def _make_trainer(args, hp, train_view, mesh):
    if args.parallel == "dp":
        from ..parallel.dp import ParallelGNNTrainer

        return ParallelGNNTrainer(args.model_type, hp, train_view, mesh=mesh,
                                  impl=getattr(args, "impl", None))
    return GNNTrainer(args.model_type, hp, train_view,
                      impl=getattr(args, "impl", None))


def _shard_for_process(indices):
    """DP multi-host: this process trains/evaluates only its shard."""
    from ..parallel.multihost import process_shard

    return process_shard(list(indices))


def _evaluate_global(model, dataset, indices):
    """Evaluate this process's shard, then combine across hosts (identity on
    a single process)."""
    from ..parallel.multihost import combine_eval_results

    local = _shard_for_process(indices)
    metrics, counts = model.evaluate(dataset, local)
    metrics, counts, _ = combine_eval_results(metrics, counts, len(local))
    return metrics, counts


def train_on_full_dataset(args, hp, progress_fp, dataset, mesh=None,
                          coordinator=True):
    print("Training on full dataset")
    all_idx = list(range(len(dataset)))
    train_view = _SubsetView(dataset, _shard_for_process(all_idx))
    model = _make_trainer(args, hp, train_view, mesh)
    resume = getattr(args, "resume_from", None)
    if resume:
        print(f"Resuming from {resume}")
        model.restore(os.path.expanduser(resume))
    folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                        args.run_name, 1,
                        log_fp=progress_fp + ".jsonl" if coordinator else None)
    document_metrics(progress_fp, f"{args.run_name}_full",
                     _evaluate_global(model, dataset, all_idx),
                     coordinator=coordinator)


def run_k_fold_val(args, hp, progress_fp, dataset, k, mesh=None,
                   coordinator=True):
    assert k > 1
    for fold_idx, (s, e) in enumerate(folds.chunk_dataset_into_folds(len(dataset), k)):
        val_idx = list(range(s, e))
        train_idx = list(range(0, s)) + list(range(e, len(dataset)))
        train_view = _SubsetView(dataset, _shard_for_process(train_idx))
        print(f"Fold contains {len(train_view)} examples")
        model = _make_trainer(args, hp, train_view, mesh)
        fold = fold_idx + 1
        folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                            args.run_name, fold,
                            log_fp=progress_fp + ".jsonl" if coordinator else None)
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_train",
                         _evaluate_global(model, dataset, train_idx),
                         coordinator=coordinator)
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_val",
                         _evaluate_global(model, dataset, val_idx),
                         coordinator=coordinator)


# ---------------------------------------------------------------------------
# halo regime: node-partitioned giant unions
# ---------------------------------------------------------------------------


def _run_halo(args, hp, progress_fp, dataset, mesh, coordinator=True):
    """Halo training driver: every host builds the same unions (the graph is
    global, partitioned by NODE range over the mesh — samples are not sharded
    per host the way DP shards them), trains with the fold/early-stop contract,
    and evaluates with the reference's 10-metric vector."""
    import functools

    import jax

    from ..parallel.halo_data import build_partitioned_sets
    from ..parallel.halo_trainer import HaloTrainer

    n_parts = mesh.shape["data"]
    gpb = args.graphs_per_batch or hp.batch_size
    k = args.num_folds
    # the halo layers run the single-chip conv implementations, so on TPU the
    # Pallas kernels apply inside shard_map — build the per-shard tiling aux
    # at the model's preferred dst-tile (BASELINE.md sweep table)
    pallas = jax.default_backend() == "tpu"
    tile = 128 if args.model_type == "GAT" else 64
    build_partitioned_sets = functools.partial(
        build_partitioned_sets, tiled=pallas, tile=tile)

    def make_trainer(train_batches, variant, w):
        # resume applies to full-dataset runs only (matching the single-device
        # CLI contract); k-fold folds always start fresh
        resume = (os.path.expanduser(args.resume_from)
                  if args.resume_from and k == 1 else None)
        return HaloTrainer(args.model_type, hp,
                           [b.pg for b in train_batches], mesh,
                           variant=variant, halo_width=w, resume_from=resume)

    if k == 1:
        all_idx = list(range(len(dataset)))
        (batches,), variant, w = build_partitioned_sets(
            dataset, n_parts, gpb, args.halo_variant, [all_idx])
        print(f"halo: {len(batches)} union graph(s) of <= {gpb} samples, "
              f"{n_parts} shards, variant={variant}"
              + (f", W={w}" if w else ""))
        model = make_trainer(batches, variant, w)
        folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                            args.run_name, 1,
                            log_fp=progress_fp + ".jsonl" if coordinator else None)
        document_metrics(progress_fp, f"{args.run_name}_full",
                         model.evaluate(batches, dataset),
                         coordinator=coordinator)
        return

    for fold_idx, (s, e) in enumerate(
            folds.chunk_dataset_into_folds(len(dataset), k)):
        val_idx = list(range(s, e))
        train_idx = list(range(0, s)) + list(range(e, len(dataset)))
        (train_b, val_b), variant, w = build_partitioned_sets(
            dataset, n_parts, gpb, args.halo_variant, [train_idx, val_idx])
        print(f"Fold contains {len(train_idx)} examples "
              f"({len(train_b)} unions, variant={variant})")
        model = make_trainer(train_b, variant, w)
        fold = fold_idx + 1
        # the partitioned regime exists for graphs that cannot be evaluated
        # on one chip, so select/early-stop on the device-side VAL loss
        folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                            args.run_name, fold,
                            log_fp=progress_fp + ".jsonl" if coordinator else None,
                            val_loss_fn=lambda: model.evaluate_loss(val_b))
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_train",
                         model.evaluate(train_b, dataset),
                         coordinator=coordinator)
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_val",
                         model.evaluate(val_b, dataset),
                         coordinator=coordinator)


# ---------------------------------------------------------------------------


def _parse_mesh(spec: str | None, parallel: str):
    """'D[,M]' -> Mesh; default = all devices on the data axis."""
    if parallel == "single":
        return None
    from ..parallel.mesh import make_mesh

    if not spec:
        return make_mesh()
    parts = [int(x) for x in spec.split(",")]
    n_data = parts[0]
    n_model = parts[1] if len(parts) > 1 else 1
    if parallel == "halo" and n_model != 1:
        raise SystemExit("--parallel halo partitions nodes over the data "
                         "axis only; use --mesh D (n_model=1)")
    return make_mesh(n_data, n_model)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--data_dir", required=True, type=str)
    p.add_argument("-o", "--output_dir", required=True, type=str,
                   help="Log directory (weights + progress file)")
    p.add_argument("-r", "--run_name", required=True, type=str)
    p.add_argument("-m", "--model_type", default="GSpool", type=str,
                   help="GSpool, GSmean, GSgcn, GAT")
    p.add_argument("-k", "--num_folds", default=5, type=int,
                   help="k-fold validation folds; 1 = train on full dataset")
    p.add_argument("-p", "--data_prefix", default="", type=str)
    p.add_argument("-x", "--random_hyperparams", action="store_true")
    p.add_argument("--hp", action="append", default=[], metavar="KEY=VAL",
                   help="override a HyperParams field, e.g. --hp n_epochs=3 "
                        "--hp 'layer_sizes=[64,64]' (values are Python "
                        "literals; repeatable). Replaces the reference's "
                        "edit-the-source workflow, README.md:109-115")
    p.add_argument("--profile", default=None, type=str, metavar="DIR",
                   help="capture a jax.profiler trace of training into DIR "
                        "(view with TensorBoard / xprof)")
    p.add_argument("--impl", default=None, type=str,
                   help="aggregation impl: pallas (TPU default), dense, scan")
    p.add_argument("--resume_from", default=None, type=str,
                   help="checkpoint to resume training from (params + optimizer "
                        "state + epoch; full-dataset runs, -k 1)")
    # ---- distribution (parallel/) ----
    p.add_argument("--parallel", default="single",
                   choices=["single", "dp", "halo"],
                   help="single: one device; dp: shard the minibatch over the "
                        "mesh data axis (optionally weights over model); halo: "
                        "node-partition one giant union graph per step")
    p.add_argument("--mesh", default=None, type=str, metavar="D[,M]",
                   help="device mesh: data axis size[, model axis size]; "
                        "default = all visible devices x 1")
    p.add_argument("--halo_variant", default="p2p",
                   choices=["p2p", "all_gather"],
                   help="halo exchange: p2p = boundary-only ppermute (falls "
                        "back automatically), all_gather = full halo")
    p.add_argument("--graphs_per_batch", default=None, type=int,
                   help="halo: samples per union graph (default: batch_size)")
    # ---- multi-host SPMD ----
    p.add_argument("--coordinator", default=None, type=str,
                   metavar="HOST:PORT",
                   help="multi-host: jax.distributed coordinator address")
    p.add_argument("--num_processes", default=None, type=int,
                   help="multi-host: total process count (run this command "
                        "once per host)")
    p.add_argument("--process_id", default=None, type=int,
                   help="multi-host: this process's index")
    return p


def main(argv=None) -> None:
    import contextlib

    args = build_parser().parse_args(argv)
    # multi-host bring-up must precede ANY device access
    from ..parallel.mesh import initialize_multihost

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    import jax

    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..parallel.multihost import is_coordinator

    coordinator = is_coordinator()
    dataset = ImageGraphDataset(os.path.expanduser(args.data_dir),
                                args.data_prefix, read_image=False,
                                read_graph=True, read_label=True)
    hp = (random_hyperparameters(args.model_type) if args.random_hyperparams
          else hardcoded_hyperparameters(args.model_type))
    hp = apply_hp_overrides(hp, args.hp)
    mesh = _parse_mesh(args.mesh, args.parallel)
    args.output_dir = os.path.expanduser(args.output_dir)
    progress_fp = os.path.join(args.output_dir, f"{args.run_name}.txt")
    if coordinator:
        folds.create_run_progress_file(progress_fp, args.model_type, hp)
    profiler = (jax.profiler.trace(os.path.expanduser(args.profile))
                if args.profile else contextlib.nullcontext())
    with profiler:
        if args.parallel == "halo":
            if args.num_folds < 1:
                raise ValueError("Number of folds must be a positive integer")
            _run_halo(args, hp, progress_fp, dataset, mesh,
                      coordinator=coordinator)
        elif args.num_folds == 1:
            train_on_full_dataset(args, hp, progress_fp, dataset, mesh,
                                  coordinator=coordinator)
        elif args.num_folds > 1:
            run_k_fold_val(args, hp, progress_fp, dataset, args.num_folds,
                           mesh, coordinator=coordinator)
        else:
            raise ValueError("Number of folds must be a positive integer")


if __name__ == "__main__":
    main()
