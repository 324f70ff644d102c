#!/bin/bash
# Random-hyperparameter GNN search driver (capability match for the reference's
# scripts/train_gnn_randomized_hyperparams.sh). Run several instances in
# parallel — the time-seeded RNG keeps concurrent trials distinct — or use the
# sweep CLI (python -m gnn_tumor_seg_tpu.cli.sweep) to manage many trials.
set -euo pipefail

PROCESSED_TRAINING_DATA_DIR="${PROCESSED_TRAINING_DATA_DIR:?set to preprocessed train dir}"
LOG_OUTPUT_DIR="${LOG_OUTPUT_DIR:?set to log/checkpoint dir}"
MODEL_NAME="${MODEL_NAME:-randomModelTest}"
MODEL_TYPE="${MODEL_TYPE:-GSgcn}"
NUM_FOLDS="${NUM_FOLDS:-3}"

python -m gnn_tumor_seg_tpu.cli.train_gnn -d "$PROCESSED_TRAINING_DATA_DIR" \
    -o "$LOG_OUTPUT_DIR" -r "${MODEL_NAME}_gnn" -k "$NUM_FOLDS" \
    -m "$MODEL_TYPE" --random_hyperparams
