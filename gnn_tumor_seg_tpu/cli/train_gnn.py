"""CLI: train a GNN on preprocessed supervoxel graphs (k-fold or full dataset).

Argument contract mirrors `scripts/train_gnn.py:64-89`; k=1 trains on the full
dataset. Checkpoints + progress TSV land in the output dir.
Run: python -m gnn_tumor_seg_tpu.cli.train_gnn -d <processed> -o <logs> -r run1
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
    """A view of a dataset restricted to given indices (train-fold view).

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

    def get_supervoxel_partitioning(self, mri_id):
        return self.base.get_supervoxel_partitioning(mri_id)

    def get_voxel_labels(self, mri_id):
        return self.base.get_voxel_labels(mri_id)

    def shape_budget(self):
        return self.base.shape_budget()


def document_metrics(fp: str, description: str, results) -> None:
    """Pretty-print + progress-file row (`scripts/train_gnn.py:48-59`)."""
    metrics, counts = np.around(results[0], 4), results[1]
    print(f"\n#{description} Results#")
    print("Loss:", metrics[0])
    print("Predicted Node Counts:", counts[0:4])
    print("Label Node Counts:", counts[4:8])
    print(f"WT Node Dice: {metrics[1]}, CT Node Dice: {metrics[2]}, ET Node Dice: {metrics[3]}")
    print(f"WT Voxel Dice: {metrics[4]}, CT Voxel Dice: {metrics[5]}, ET Voxel Dice: {metrics[6]}")
    print(f"WT HD95: {metrics[7]}, CT HD95: {metrics[8]}, ET HD95: {metrics[9]}")
    folds.update_progress_file(fp, description, metrics[0], metrics[4:7])


def train_on_full_dataset(args, hp, progress_fp, dataset):
    print("Training on full dataset")
    model = GNNTrainer(args.model_type, hp, dataset,
                       impl=getattr(args, "impl", None))
    resume = getattr(args, "resume_from", None)
    if resume:
        print(f"Resuming from {resume}")
        model.restore(os.path.expanduser(resume))
    folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                        args.run_name, 1, log_fp=progress_fp + ".jsonl")
    document_metrics(progress_fp, f"{args.run_name}_full", model.evaluate(dataset))


def run_k_fold_val(args, hp, progress_fp, dataset, k):
    assert k > 1
    for fold_idx, (s, e) in enumerate(folds.chunk_dataset_into_folds(len(dataset), k)):
        val_idx = list(range(s, e))
        train_idx = list(range(0, s)) + list(range(e, len(dataset)))
        train_view = _SubsetView(dataset, train_idx)
        print(f"Fold contains {len(train_view)} examples")
        model = GNNTrainer(args.model_type, hp, train_view,
                           impl=getattr(args, "impl", None))
        fold = fold_idx + 1
        folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                            args.run_name, fold, log_fp=progress_fp + ".jsonl")
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_train",
                         model.evaluate(dataset, train_idx))
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_val",
                         model.evaluate(dataset, val_idx))


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
    p.add_argument("--profile", default=None, type=str, metavar="DIR",
                   help="capture a jax.profiler trace of training into DIR "
                        "(view with TensorBoard / xprof)")
    p.add_argument("--impl", default=None, type=str,
                   help="aggregation impl: pallas (TPU default), dense, scan")
    p.add_argument("--resume_from", default=None, type=str,
                   help="checkpoint to resume training from (params + optimizer "
                        "state + epoch; full-dataset runs, -k 1)")
    return p


def main(argv=None) -> None:
    import contextlib

    import jax

    from ..runtime import enable_compilation_cache

    args = build_parser().parse_args(argv)
    enable_compilation_cache()
    dataset = ImageGraphDataset(os.path.expanduser(args.data_dir),
                                args.data_prefix, read_image=False,
                                read_graph=True, read_label=True)
    hp = (random_hyperparameters(args.model_type) if args.random_hyperparams
          else hardcoded_hyperparameters(args.model_type))
    args.output_dir = os.path.expanduser(args.output_dir)
    progress_fp = os.path.join(args.output_dir, f"{args.run_name}.txt")
    folds.create_run_progress_file(progress_fp, args.model_type, hp)
    profiler = (jax.profiler.trace(os.path.expanduser(args.profile))
                if args.profile else contextlib.nullcontext())
    with profiler:
        if args.num_folds == 1:
            train_on_full_dataset(args, hp, progress_fp, dataset)
        elif args.num_folds > 1:
            run_k_fold_val(args, hp, progress_fp, dataset, args.num_folds)
        else:
            raise ValueError("Number of folds must be a positive integer")


if __name__ == "__main__":
    main()
