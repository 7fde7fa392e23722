"""Orbax checkpointing of the FULL train state.

Upgrades over the reference (trainer.py:200-206, model.py:313-328): the
reference saves model weights only — no optimizer state, no step — so a run
cannot resume mid-training. Here (params, batch_stats, opt_state, step) are
all checkpointed and restored, giving true preemption-safe resume on TPU
pods. DINO params are saved once (they are frozen).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from selfcorr_tpu.train.step import TrainState


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir))


def save_state(ckpt_dir: str, state: TrainState, step: int) -> None:
    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
    mgr.wait_until_finished()
    mgr.close()


def restore_state(ckpt_dir: str, template: TrainState,
                  step: int | None = None) -> TrainState:
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mgr.restore(step,
                           args=ocp.args.StandardRestore(template._asdict()))
    mgr.close()
    return TrainState(**restored)


def restore_raw(ckpt_dir: str, step: int | None = None) -> dict:
    """Restore a checkpoint AS STORED (shapes/dtypes from its metadata, no
    template) — for cross-config transfer where only a subtree must match
    the live state (e.g. load_warm_start pulling a 128^2 run's encoder into
    a 256^2 init: the stored DINO pos-embedding has a different token count
    and must not be shape-checked)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return restored


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s
