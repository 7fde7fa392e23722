#!/usr/bin/env bash
# Train one Wild6D category on all visible TPU chips.
# Usage: scripts/train.sh laptop /path/to/Wild6D exp1
set -euo pipefail
cat=${1:-laptop}
data=${2:-/data/Wild6D}
name=${3:-exp1-$cat}
ndev=$(python -c "import jax; print(len(jax.devices()))")

python train.py --flagfile "config/wild6d/$cat.txt" \
    --dataset_path "$data/$cat/" \
    --train_list "config/wild6d/lists/${cat}_train.txt" \
    --checkpoint_dir log --name "$name" \
    --num_devices "$ndev" --save_freq 2000 --vis_freq 2000
