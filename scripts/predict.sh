#!/usr/bin/env bash
# Evaluate a checkpoint on the Wild6D test split (NOCS-style metrics).
# Usage: scripts/predict.sh laptop /path/to/Wild6D log/exp1-laptop/ckpt
set -euo pipefail
cat=${1:-laptop}
data=${2:-/data/Wild6D}
model=${3:?model checkpoint path (orbax dir or reference .pth)}

python predict.py --flagfile "config/wild6d/$cat.txt" \
    --test --model_path "$model" \
    --test_dataset_path "$data/test_set/$cat/" \
    --test_list "config/wild6d/lists/${cat}_test.txt" \
    --checkpoint_dir log --name "eval-$cat" \
    --batch_size 16 --repeat 1 --dframe_eval 1 --use_depth --eval --eval_nocs
