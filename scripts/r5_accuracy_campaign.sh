#!/usr/bin/env bash
# Round-5 accuracy campaign (VERDICT r4 items 4 + 5), strictly serial on the
# one TPU chip. Six validate_synthetic.py arms sharing one control pretrain:
#
#   pre      1.5k/128^2 duo  — regenerated control warm start (r4 recipe)
#   dctrl    4k/256^2 duo, warm(pre)                 — bf16 A/B control
#   dbf16    4k/256^2 duo, warm(pre), dino_attn_bf16 — bf16 A/B arm
#   nocyc    8k/256^2 duo, warm(pre), cycle_loss_pretrain_wt=0
#   premix   5k/128^2 MIX family pretrain (longer + multi-family)
#   warmmix  8k/256^2 duo, warm(premix)
#
# dctrl-vs-dbf16 trajectories answer whether TF32->bf16 attention scores are
# accuracy-neutral (worst case: random-init features). nocyc/warmmix
# trajectories vs dctrl + the r4 flagship rows probe the synthetic accuracy
# ceiling (is the random-DINO transport loss still hurting at scale; does a
# longer multi-family pretrain move median_deg).
set -u
cd "$(dirname "$0")/.."
OUT=.valsynth_r5
mkdir -p "$OUT"

run() {
    local name=$1; shift
    echo "=== $name start $(date +%H:%M:%S) ==="
    timeout 10800 python scripts/validate_synthetic.py \
        --out_dir "$OUT" --name "$name" "$@" > "$OUT/$name.log" 2>&1
    echo "=== $name exit=$? $(date +%H:%M:%S) ==="
    tail -2 "$OUT/$name.log"
}

run pre     --img_size 128 --iters 1500 --seed 7
run dctrl   --img_size 256 --iters 4000 --seed 7 \
            --warm_start_path "$OUT/pre/ckpt" \
            --save_freq 1000 --eval_steps 1000,2000
run dbf16   --img_size 256 --iters 4000 --seed 7 \
            --warm_start_path "$OUT/pre/ckpt" \
            --set dino_attn_bf16=true \
            --save_freq 1000 --eval_steps 1000,2000
run nocyc   --img_size 256 --iters 8000 --seed 7 \
            --warm_start_path "$OUT/pre/ckpt" --ablate cycle_pretrain \
            --save_freq 1000 --eval_steps 1000,2000,4000
run premix  --img_size 128 --iters 5000 --seed 7 --set synthetic_shape=mix
run warmmix --img_size 256 --iters 8000 --seed 7 \
            --warm_start_path "$OUT/premix/ckpt" \
            --save_freq 1000 --eval_steps 1000,2000,4000
echo "campaign done $(date +%H:%M:%S)"
