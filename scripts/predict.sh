#!/usr/bin/env bash
# Evaluate a checkpoint on the Wild6D test split (NOCS-style metrics).
# Usage: scripts/predict.sh laptop /path/to/Wild6D log/exp1-laptop/ckpt
set -euo pipefail
cd "$(dirname "$0")/.."
cat=${1:-laptop}
data=${2:-/data/Wild6D}
model=${3:?model checkpoint path (orbax dir or reference .pth)}

if [ ! -d "$data/test_set/$cat" ]; then
    echo "[predict.sh] ERROR: Wild6D test split not found at $data/test_set/$cat" >&2
    echo "[predict.sh] Download Wild6D (images + pkl_annotations) and pass" >&2
    echo "[predict.sh] its root: scripts/predict.sh $cat /path/to/Wild6D <ckpt>" >&2
    exit 2
fi
list="config/wild6d/lists/${cat}_test.txt"
if [ ! -f "$list" ]; then
    echo "[predict.sh] generating video list $list from $data/test_set/$cat"
    python scripts/gen_lists.py "$data/test_set/$cat" "$list"
fi

python predict.py --flagfile "config/wild6d/$cat.txt" \
    --test --model_path "$model" \
    --test_dataset_path "$data/test_set/$cat/" \
    --test_list "$list" \
    --checkpoint_dir log --name "eval-$cat" \
    --batch_size 16 --repeat 1 --dframe_eval 1 --use_depth --eval --eval_nocs
