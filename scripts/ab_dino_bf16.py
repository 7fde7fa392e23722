"""A/B: full train step with the frozen DINO trunk stored f32 vs bf16 AT
REST (cast once in init_state; zero in-step param casts — the round-3
per-step-cast variant measured 22 ms SLOWER, see configs.py dino_bf16).

Run solo on the TPU: python scripts/ab_dino_bf16.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from selfcorr_tpu.utils.jit_cache import enable

enable()

import bench
from selfcorr_tpu.models.meshnet import build_mesh_constants
from selfcorr_tpu.train.optim import make_optimizer
from selfcorr_tpu.train.step import init_state, make_train_step


def measure(dino_bf16: bool) -> float:
    cfg = bench.flagship_cfg(on_cpu=False, dino_bf16=dino_bf16)
    b = cfg.batch_size * cfg.repeat
    batch = bench.synth_batch(b, cfg.img_size)
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=True)

    state, m = step_fn(state, batch, jax.random.PRNGKey(1))
    float(m["total_loss"])  # sync (block_until_ready lies on axon)
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        for i in range(10):
            state, m = step_fn(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(m["total_loss"])  # chained: donated state + fetch
        dt = (time.time() - t0) / 10
        best = min(best, dt)
        print(f"  bf16={dino_bf16} rep{rep}: {dt * 1e3:.1f} ms/iter "
              f"({b / dt:.1f} imgs/s) loss={loss:.4f}", flush=True)
    return best


if __name__ == "__main__":
    for flag in (False, True):
        t = measure(flag)
        print(f"dino_bf16={flag}: best {t * 1e3:.1f} ms/iter "
              f"({32.0 / t:.1f} imgs/s)", flush=True)
