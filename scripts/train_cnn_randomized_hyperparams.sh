#!/bin/bash
# Random-hyperparameter refinement-CNN search driver (capability match for the
# reference's scripts/train_cnn_randomized_hyperparams.sh). Requires GNN logits
# to have been exported first (generate_gnn_predictions -f logits).
set -euo pipefail

PROCESSED_TRAINING_DATA_DIR="${PROCESSED_TRAINING_DATA_DIR:?set to preprocessed train dir}"
LOG_OUTPUT_DIR="${LOG_OUTPUT_DIR:?set to log/checkpoint dir}"
GNN_LOGIT_DIR="${GNN_LOGIT_DIR:?set to logit dir}"
MODEL_NAME="${MODEL_NAME:-randomModelTest}"
NUM_FOLDS="${NUM_FOLDS:-2}"

python -m gnn_tumor_seg_tpu.cli.train_refinement_cnn \
    -d "$PROCESSED_TRAINING_DATA_DIR" -o "$LOG_OUTPUT_DIR" \
    -l "$GNN_LOGIT_DIR" -r "${MODEL_NAME}_cnn" -k "$NUM_FOLDS" \
    --random_hyperparams
