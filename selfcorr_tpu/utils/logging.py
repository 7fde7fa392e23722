"""TensorBoard logging + config snapshot (reference trainer.py:49-52,153-198).

Uses torch.utils.tensorboard's SummaryWriter (host-side only). Falls back to
a no-op writer when tensorboard is unavailable.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Mapping

import numpy as np


class NoopWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


def make_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        return NoopWriter()


# channel -> TB tag, mirroring the reference's grouping (trainer.py:156-173)
TAGS = {
    "total_loss": "total_loss/total_loss",
    "mask_loss": "render_loss/mask_loss",
    "texture_loss": "render_loss/texture_loss",
    "depth_loss": "render_loss/depth_loss",
    "match_loss": "correspondence/match_loss",
    "imatch_loss": "correspondence/imatch_loss",
    "cycle_loss": "correspondence/cycle_loss",
    "cycle_loss_pretrain": "correspondence/cycle_loss_pretrain",
    "triangle_loss": "regularization/triangle_loss",
    "deform_loss": "regularization/deform_loss",
    "symmetry_loss": "regularization/symmetry_loss",
    "pullfar_loss": "regularization/pullfar_loss",
    "cam_loss": "regularization/cam_loss",
    "grad_meanv_norm": "norms/grad_meanv_norm",
    "grad_shapenerf_norm": "norms/grad_shapenerf_norm",
    "grad_pose_predictor_norm": "norms/grad_pose_predictor_norm",
    "bad_grad": "norms/bad_grad",
}


def log_metrics(writer, metrics: Mapping[str, object], step: int) -> None:
    for k, v in metrics.items():
        tag = TAGS.get(k, k)
        writer.add_scalar(tag, float(np.asarray(v)), step)


def write_config_snapshot(run_dir: str, cfg, filename: str = "config.txt"):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, filename), "w") as f:
        for k, v in sorted(dataclasses.asdict(cfg).items()):
            f.write(f"--{k}={v}\n")
