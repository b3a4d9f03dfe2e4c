#!/usr/bin/env bash
# Canonical S3DIS cvfold-0 5-shot GFS chain (reference README.md:86-143):
# geometric words (num_cnt=150, energy=0.9) -> base-stage training
# (150 epochs, eval_weight 1.0) -> 5-seed evaluation (eval_weight 1.2).
# Override DATA_PATH / TEST_DATA_PATH / PRETRAIN_CKPT / SAVE_ROOT via env.
set -e

DATA_PATH="${DATA_PATH:-datasets/S3DIS/blocks_bs1.0_s1.0}"
TEST_DATA_PATH="${TEST_DATA_PATH:-datasets/S3DIS/blocks_bs1.0_s1.0_test}"
PRETRAIN_CKPT="${PRETRAIN_CKPT:-log_s3dis/log_pretrain_s3dis_S0_LongTail/}"
SAVE_ROOT="${SAVE_ROOT:-log_s3dis/S0_K5}"
ROOT="$(dirname "$0")/.."

python "$ROOT/get_basis.py" --save_path "$SAVE_ROOT" \
  --pretrain_checkpoint_path "$PRETRAIN_CKPT" --cvfold 0 \
  --data_path "$DATA_PATH" --num_cnt 150 --dataset s3dis

BASIS="$SAVE_ROOT/GlobalKmeans_EdgeConv123_cnt=150_energy=095_SVDReconstruct.pkl"

python "$ROOT/train.py" --save_path "$SAVE_ROOT/exp" \
  --pc_augm --dataset s3dis --k_shot 5 --phase train --cvfold 0 \
  --basis_path "$BASIS" \
  --data_path "$DATA_PATH" --testing_data_path "$TEST_DATA_PATH" \
  --use_pretrain_weight --pretrain_checkpoint_path "$PRETRAIN_CKPT" \
  --epochs 150 --energy 0.9 --total_classes 13 --eval_weight 1.

CKPT=$(ls -t "$SAVE_ROOT"/exp/train_epoch_*.npz | head -1)
python "$ROOT/train.py" --save_path "$SAVE_ROOT/exp" \
  --pc_augm --dataset s3dis --k_shot 5 --cvfold 0 \
  --basis_path "$BASIS" \
  --data_path "$DATA_PATH" --testing_data_path "$TEST_DATA_PATH" \
  --only_evaluate --phase test --model_checkpoint_path "$CKPT" \
  --total_classes 13 --energy 0.9 --eval_weight 1.2
