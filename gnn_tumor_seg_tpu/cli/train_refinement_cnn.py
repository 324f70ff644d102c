"""CLI: train the refinement CNN on saved GNN logits + images.

Argument contract mirrors `scripts/train_refinement_cnn.py:64-90`. One deliberate
fix over the reference: its k-fold loop trains every fold on the *full* image
dataset (leakage bug at `train_refinement_cnn.py:45`, SURVEY §2.2.3); here each
fold trains only on its train split.
Run: python -m gnn_tumor_seg_tpu.cli.train_refinement_cnn -d <processed> -l <logits> -o <logs> -r run1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import hardcoded_hyperparameters, random_hyperparameters
from ..data.dataset import ImageGraphDataset, PredLogitDataset
from ..train import folds
from ..train.cnn_trainer import CNNTrainer


class _ImageSubset:
    def __init__(self, base, indices):
        self.base = base
        self.ids = [base.ids[i] for i in indices]

    def __len__(self):
        return len(self.ids)

    def get_image(self, mri_id):
        return self.base.get_image(mri_id)

    def get_voxel_labels(self, mri_id):
        return self.base.get_voxel_labels(mri_id)


def document_metrics(fp, description, metrics):
    metrics = np.around(metrics, 4)
    print(f"\n#{description} Results#")
    print("Loss:", metrics[0])
    print(f"WT Voxel Dice: {metrics[1]}, CT Voxel Dice: {metrics[2]}, ET Voxel Dice: {metrics[3]}")
    print(f"WT HD95: {metrics[4]}, CT HD95: {metrics[5]}, ET HD95: {metrics[6]}")
    folds.update_progress_file(fp, description, metrics[0], metrics[1:4])


def train_on_full_dataset(args, hp, progress_fp, image_dataset, logit_dataset):
    print("Training on full dataset")
    model = CNNTrainer(hp, image_dataset, logit_dataset,
                       precision=args.precision)
    folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                        args.run_name, 1, log_fp=progress_fp + ".jsonl")
    document_metrics(progress_fp, f"{args.run_name}_full",
                     model.evaluate(image_dataset.ids))


def run_k_fold_val(args, hp, progress_fp, image_dataset, logit_dataset, k):
    assert k > 1
    n = len(image_dataset.ids)
    for fold_idx, (s, e) in enumerate(folds.chunk_dataset_into_folds(n, k)):
        val_ids = image_dataset.ids[s:e]
        train_idx = list(range(0, s)) + list(range(e, n))
        train_ids = [image_dataset.ids[i] for i in train_idx]
        print(f"Fold contains {len(train_ids)} examples")
        model = CNNTrainer(hp, _ImageSubset(image_dataset, train_idx),
                           logit_dataset, precision=args.precision)
        fold = fold_idx + 1
        folds.train_on_fold(model, args.output_dir + os.sep, hp.n_epochs,
                            args.run_name, fold, log_fp=progress_fp + ".jsonl")
        model.image_dataset = image_dataset  # evaluate over the full dataset views
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_train",
                         model.evaluate(train_ids))
        document_metrics(progress_fp, f"{args.run_name}_f{fold}_val",
                         model.evaluate(val_ids))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--data_dir", required=True, type=str)
    p.add_argument("-l", "--saved_logit_dir", required=True, type=str,
                   help="directory holding <id>_logits.nii.gz from generate_gnn_predictions -f logits")
    p.add_argument("-o", "--output_dir", required=True, type=str)
    p.add_argument("-r", "--run_name", required=True, type=str)
    p.add_argument("-k", "--num_folds", default=5, type=int)
    p.add_argument("-p", "--data_prefix", default="", type=str)
    p.add_argument("-x", "--random_hyperparams", action="store_true")
    p.add_argument("--precision", default="fast", choices=("exact", "fast"),
                   help="conv precision mode; 'fast' (bf16) matches the "
                        "serve/warmup default so train and serve share one "
                        "compiled (and persistent-cached) conv program per "
                        "crop shape")
    p.add_argument("--hp", action="append", default=[], metavar="KEY=VAL",
                   help="override a HyperParams field (Python-literal "
                        "values; repeatable) — see cli.train_gnn")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..runtime import enable_compilation_cache

    # the conv train-step autotune costs 80-300 s through the relay; without
    # the persistent cache EVERY process (this CLI, not just train_gnn) pays
    # it from scratch — 208 s of the 501 s e2e CNN stage was exactly this
    enable_compilation_cache()
    image_dataset = ImageGraphDataset(os.path.expanduser(args.data_dir),
                                      args.data_prefix, read_image=True,
                                      read_graph=False, read_label=True)
    logit_dataset = PredLogitDataset(os.path.expanduser(args.saved_logit_dir))
    hp = (random_hyperparameters("CNN") if args.random_hyperparams
          else hardcoded_hyperparameters("CNN"))
    from .train_gnn import apply_hp_overrides

    hp = apply_hp_overrides(hp, args.hp)
    args.output_dir = os.path.expanduser(args.output_dir)
    progress_fp = os.path.join(args.output_dir, f"{args.run_name}.txt")
    folds.create_run_progress_file(progress_fp, "CNN", hp)
    if args.num_folds == 1:
        train_on_full_dataset(args, hp, progress_fp, image_dataset, logit_dataset)
    elif args.num_folds > 1:
        run_k_fold_val(args, hp, progress_fp, image_dataset, logit_dataset,
                       args.num_folds)
    else:
        raise ValueError("Number of folds must be a positive integer")


if __name__ == "__main__":
    main()
