#!/usr/bin/env bash
# Canonical ScanNet cvfold-0 5-shot GFS chain (reference README.md:94-143):
# geometric words (num_cnt=180, energy=0.95) -> base-stage training
# (150 epochs, eval_weight 1.0) -> 5-seed evaluation (eval_weight 1.2).
# Override DATA_PATH / TEST_DATA_PATH / PRETRAIN_CKPT / SAVE_ROOT via env.
set -e

DATA_PATH="${DATA_PATH:-datasets/ScanNet/blocks_bs1.0_s1.0}"
TEST_DATA_PATH="${TEST_DATA_PATH:-datasets/ScanNet/blocks_bs1.0_s1.0_test}"
PRETRAIN_CKPT="${PRETRAIN_CKPT:-log_scannet/log_pretrain_scannet_S0_LongTail/}"
SAVE_ROOT="${SAVE_ROOT:-log_scannet/S0_K5}"
ROOT="$(dirname "$0")/.."

python "$ROOT/get_basis.py" --save_path "$SAVE_ROOT" \
  --pretrain_checkpoint_path "$PRETRAIN_CKPT" --cvfold 0 \
  --data_path "$DATA_PATH" --num_cnt 180 --dataset scannet

BASIS="$SAVE_ROOT/GlobalKmeans_EdgeConv123_cnt=180_energy=095_SVDReconstruct.pkl"

python "$ROOT/train.py" --save_path "$SAVE_ROOT/exp" \
  --pc_augm --dataset scannet --k_shot 5 --phase train --cvfold 0 \
  --basis_path "$BASIS" \
  --data_path "$DATA_PATH" --testing_data_path "$TEST_DATA_PATH" \
  --use_pretrain_weight --pretrain_checkpoint_path "$PRETRAIN_CKPT" \
  --epochs 150 --energy 0.95 --total_classes 21 --eval_weight 1.

CKPT=$(ls -t "$SAVE_ROOT"/exp/train_epoch_*.npz | head -1)
python "$ROOT/train.py" --save_path "$SAVE_ROOT/exp" \
  --pc_augm --dataset scannet --k_shot 5 --cvfold 0 \
  --basis_path "$BASIS" \
  --data_path "$DATA_PATH" --testing_data_path "$TEST_DATA_PATH" \
  --only_evaluate --phase test --model_checkpoint_path "$CKPT" \
  --total_classes 21 --energy 0.95 --eval_weight 1.2
