#!/usr/bin/env bash
# Train one Wild6D category on all visible TPU chips.
# Usage: scripts/train.sh laptop /path/to/Wild6D exp1
#
# If the Wild6D download is present at $data, the video list is generated
# from it on first use (scripts/gen_lists.py). If it is NOT present, the
# run falls back to the procedural synthetic dataset so the full pipeline
# still executes end-to-end (loudly).
set -euo pipefail
cd "$(dirname "$0")/.."
cat=${1:-laptop}
data=${2:-/data/Wild6D}
name=${3:-exp1-$cat}
ndev=$(python -c "import jax; print(len(jax.devices()))")

prior="config/wild6d/priors/$cat.obj"
if [ ! -f "$prior" ]; then
    echo "[train.sh] generating shape priors ($prior missing)"
    python scripts/gen_priors.py
fi

extra=()
if [ -d "$data/$cat" ]; then
    list="config/wild6d/lists/${cat}_train.txt"
    if [ ! -f "$list" ]; then
        echo "[train.sh] generating video list $list from $data/$cat"
        python scripts/gen_lists.py "$data/$cat" "$list"
    fi
    extra+=(--dataset_path "$data/$cat/" --train_list "$list")
else
    echo "[train.sh] WARNING: Wild6D not found at $data/$cat —" >&2
    echo "[train.sh] training on the SYNTHETIC procedural dataset instead." >&2
    echo "[train.sh] Download Wild6D (see README) and pass its path to" >&2
    echo "[train.sh] train real categories: scripts/train.sh $cat /path/to/Wild6D" >&2
    extra+=(--dataset_name synthetic)
fi

python train.py --flagfile "config/wild6d/$cat.txt" \
    "${extra[@]}" \
    --checkpoint_dir log --name "$name" \
    --num_devices "$ndev" --save_freq 2000 --vis_freq 2000 "${@:4}"
