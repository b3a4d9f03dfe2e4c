#!/usr/bin/env bash
# Canonical ScanNet backbone pre-training hyperparameters — twin of the
# reference pretrain/pretrain_segmentor_scannet.sh (same values; GPU pinning is
# replaced by the JAX platform, which the CLI selects automatically).
set -e

DATASET='scannet'
SPLIT=0
DATA_PATH="${DATA_PATH:-../datasets/ScanNet/blocks_bs1.0_s1.0}"
SAVE_PATH="${SAVE_PATH:-./log_scannet/}"

NUM_POINTS=2048
PC_ATTRIBS='xyzrgbXYZ'
EDGECONV_WIDTHS='[[64,64], [64, 64], [64, 64]]'
MLP_WIDTHS='[512, 256]'
K=20

EVAL_INTERVAL=3
BATCH_SIZE=16
NUM_WORKERS=16
NUM_EPOCHS=100
LR=0.001
WEIGHT_DECAY=0.0001
DECAY_STEP=50
DECAY_RATIO=0.5

args=(--phase 'pretrain' --dataset "${DATASET}" --cvfold $SPLIT
      --data_path  "$DATA_PATH" --save_path "$SAVE_PATH"
      --pc_npts $NUM_POINTS --pc_attribs "$PC_ATTRIBS" --pc_augm
      --edgeconv_widths "$EDGECONV_WIDTHS" --dgcnn_k $K
      --dgcnn_mlp_widths "$MLP_WIDTHS"
      --n_iters $NUM_EPOCHS --eval_interval $EVAL_INTERVAL
      --batch_size $BATCH_SIZE --n_workers $NUM_WORKERS
      --pretrain_lr $LR --pretrain_weight_decay $WEIGHT_DECAY
      --pretrain_step_size $DECAY_STEP --pretrain_gamma $DECAY_RATIO)

python "$(dirname "$0")/main.py" "${args[@]}"
