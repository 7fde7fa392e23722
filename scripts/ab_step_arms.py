"""End-to-end train-STEP A/B of the DINO attention arms (VERDICT r4 item 4).

The isolated-trunk A/B (ab_flash_attention.py) showed the pallas flash
kernel wins inside the trunk but loses ~7 ms at the FULL STEP to
pad/transpose layout boundaries; `dino_pad_once` moves the boundary to the
trunk entry (tokens padded 1025 -> 1152 once, every block in the kernel's
preferred layout). This script settles whether that recovers the win where
it counts: the raw jitted train step, measured for every arm in ONE process
and ONE transport session, with a closing re-measure of the baseline arm
(A-B-A) so transport drift cannot masquerade as a code effect — the same
discipline that settled the predict-FPS question (ab_predict_fps.py).

Run solo on the TPU: python scripts/ab_step_arms.py [attn|bf16]
(arm sets in ARM_SETS; default 'attn').
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(cfg, tag, n_windows=3, n_iters=5):
    import jax
    from bench import synth_batch
    from selfcorr_tpu.models.meshnet import build_mesh_constants
    from selfcorr_tpu.train.optim import make_optimizer
    from selfcorr_tpu.train.step import init_state, make_train_step

    b = cfg.batch_size * cfg.repeat
    batch = synth_batch(b, cfg.img_size)
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=True)

    t0 = time.time()
    state, m = step_fn(state, batch, jax.random.PRNGKey(1))
    loss = float(m["total_loss"])
    print(f"[{tag}] compiled in {time.time() - t0:.0f}s "
          f"(loss {loss:.4f})", flush=True)

    best, k = 0.0, 2
    for _ in range(n_windows):
        t0 = time.time()
        for i in range(n_iters):
            state, m = step_fn(state, batch, jax.random.PRNGKey(k + i))
        float(m["total_loss"])  # the only real sync on the axon backend
        best = max(best, b / ((time.time() - t0) / n_iters))
        k += n_iters
    ms = b / best * 1000
    print(f"[{tag}] step best {best:.1f} imgs/s ({ms:.1f} ms)", flush=True)
    return best, loss


# Named arm sets. 'attn' settled the round-3 flash question (PERF.md round
# 4); 'bf16' retests the whole-trunk bf16 cast WITH the pad_once layout fix
# — the round-3 rejections (configs.py dino_bf16 comment) blamed the
# bf16<->f32 boundary/layout structure around the trunk, and pad_once is
# precisely a boundary-structure fix that did not exist then. attn_bf16 arm
# is a timing ceiling only (numerics flagged loose in configs.py).
ARM_SETS = {
    "attn": [
        ("baseline(xla-attn)", {}),
        ("flash", {"dino_flash": True}),
        ("flash+pad_once", {"dino_flash": True, "dino_pad_once": True}),
        ("baseline(recheck)", {}),
    ],
    "bf16": [
        ("baseline(xla-attn)", {}),
        ("bf16-trunk", {"dino_bf16": True}),
        ("bf16+flash+pad_once", {"dino_bf16": True, "dino_flash": True,
                                 "dino_pad_once": True}),
        ("bf16+fl+po+attn_bf16", {"dino_bf16": True, "dino_flash": True,
                                  "dino_pad_once": True,
                                  "dino_attn_bf16": True}),
        ("baseline(recheck)", {}),
    ],
    # Round 5: the 4k-iter synthetic accuracy A/B (.valsynth_r5 dctrl vs
    # dbf16, PERF.md round 5) cleared bf16 attention scores on accuracy —
    # worst case (random-init features), trajectories within noise. This
    # set settles WHICH carrier of attn_bf16 wins at the step level: the
    # plain XLA attention path (what the accuracy arm ran) or
    # flash+pad_once (where the 51.9 -> 39.4 ms isolated-trunk win was
    # measured, configs.py dino_attn_bf16).
    "attnbf16": [
        ("baseline(f32-scores)", {}),
        ("attn_bf16(xla)", {"dino_attn_bf16": True}),
        ("attn_bf16+fl+po", {"dino_attn_bf16": True, "dino_flash": True,
                             "dino_pad_once": True}),
        ("baseline(recheck)", {}),
    ],
}


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    from bench import flagship_cfg

    arms = ARM_SETS[sys.argv[1] if len(sys.argv) > 1 else "attn"]
    results = {}
    losses = {}
    for tag, kw in arms:
        cfg = flagship_cfg(on_cpu=False, **kw)
        results[tag], losses[tag] = time_step(cfg, tag)

    print("\n=== summary (raw train step, B=32 @ 256^2) ===")
    # A-B-A convention: first and last arms are the baseline pair
    base = max(results[arms[0][0]], results[arms[-1][0]])
    for tag, _ in arms:
        d = results[tag] - base
        print(f"{tag:24s} {results[tag]:7.1f} imgs/s  ({d:+.1f} vs best "
              f"baseline)  loss {losses[tag]:.4f}")


if __name__ == "__main__":
    main()
