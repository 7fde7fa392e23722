"""Pose / shape prediction heads.

PosePredictor parity (model/module/network/pose_predictor.py:36-88):
  rotation: fc_stack(512->128, 3 layers, LeakyReLU 0.1, no BN) + Linear->6,
  a constant per-category `rotation_offset` added to the two 3-vectors before
  Gram-Schmidt; translation: Linear->3 with xy*0.1 and z+depth_offset;
  optional scale head (*0.1 + 1, off in all shipped configs).

ShapeDeformer parity (model/module/network/shape_predictor.py:13-44 +
third-party/nerf CondNeRFModel(num_layers=2, no positional encoding)):
  input [xyz || shape_code] ->
  Linear(67,256) -> Linear(256,256) -> relu -> feat=relu(Linear(256,256)) ->
  relu(Linear(256,128)) -> Linear(128,3).
  (The reference applies no activation between its first two linear layers —
  nerf/models.py:398-407 — a quirk kept for weight-import parity.)
  Output delta is mean-centered; pred_v = mean_v + delta * deform_ratio.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from selfcorr_tpu.ops.geometry import rot6d_to_matrix


class PosePredictor(nn.Module):
    rotation_offset: Tuple[float, ...] = (0.0,) * 6
    depth_offset: float = 10.0
    use_scale: bool = False
    n_hypo: int = 1  # multipose hypotheses; all shipped configs use 1

    @nn.compact
    def __call__(self, feat):  # feat: (B, 512)
        assert self.n_hypo == 1, "multipose hypotheses not exercised (pose_predictor.py:32)"
        b = feat.shape[0]
        y = feat
        for i in range(3):
            y = nn.leaky_relu(nn.Dense(128, name=f"rot_fc{i}")(y), 0.1)
        rot6 = nn.Dense(6, name="rot_out")(y)
        rot6 = rot6 + jnp.asarray(self.rotation_offset, rot6.dtype)
        rotation = rot6d_to_matrix(rot6)  # (B, 3, 3)

        trans = nn.Dense(3, name="trans")(feat)
        trans = jnp.concatenate(
            [trans[:, :2] * 0.1, trans[:, 2:] + self.depth_offset], axis=-1)

        if self.use_scale:
            scale = nn.Dense(3, name="scale")(feat) * 0.1 + 1.0
        else:
            scale = jnp.ones((b, 3), feat.dtype)
        return rotation, trans, scale


class ShapeDeformer(nn.Module):
    code_dim: int = 64
    hidden: int = 256
    deform_ratio: float = 1.0
    no_deform: bool = False

    @nn.compact
    def __call__(self, mean_v, shape_code):
        """mean_v: (B, N, 3); shape_code: (B, code_dim) -> pred_v (B, N, 3)."""
        if self.no_deform:
            return mean_v
        n = mean_v.shape[1]
        code = jnp.broadcast_to(shape_code[:, None, :],
                                (shape_code.shape[0], n, self.code_dim))
        # the MLP sees the mean shape detached (shape_predictor.py:35
        # `mean_v.detach()`); gradients to mean_v flow only via the residual add
        x = jnp.concatenate([jax.lax.stop_gradient(mean_v), code], axis=-1)
        x = nn.Dense(self.hidden, name="layer1")(x)
        x = nn.relu(nn.Dense(self.hidden, name="layer_xyz0")(x))
        feat = nn.relu(nn.Dense(self.hidden, name="fc_feat")(x))
        y = nn.relu(nn.Dense(self.hidden // 2, name="layer_dir0")(feat))
        delta = nn.Dense(3, name="fc_rgb")(y)
        delta = delta - delta.mean(axis=1, keepdims=True)
        return mean_v + delta * self.deform_ratio
