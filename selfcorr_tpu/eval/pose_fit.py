"""Whole-batch on-device pose fitting.

TPU-native redesign of the reference's per-image Python loop
(model/tester.py:324-427): pixel selection, depth back-projection, the
100-hypothesis RANSAC and the Umeyama refits are one jitted, fully batched
program with static shapes (masked top-k pixel budget instead of dynamic
boolean indexing). Fallback pose on fit failure matches tester.py:374-379.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from selfcorr_tpu.configs import Config
from selfcorr_tpu.ops.umeyama import ransac_umeyama_batch


def pixel_grid_ndc(h: int, w: int, dtype=jnp.float32):
    """Full-res pixel-centre grid in [-1,1], matching tester.py:134-137."""
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=dtype),
                          jnp.arange(h, dtype=dtype))
    grid = jnp.stack([xx, yy], -1) + 0.5
    return grid / (w / 2.0) - 1.0  # (h, w, 2)


@functools.partial(jax.jit, static_argnames=("max_points", "n_iters"))
def fit_poses(key, match, match_conf, depth, mask, pp_crop, foc_crop,
              pred_v, base_rot, max_points: int = 16384, n_iters: int = 100):
    """match: (B,H,W,3) canonical coords; depth/mask/conf: (B,H,W);
    intrinsics NDC; pred_v (B,N,3); base_rot (3,3).

    Returns dict(bbox9, verts, rotation, translation, scale_fit, ok).
    """
    b, h, w = depth.shape
    max_points = min(max_points, h * w)  # budget can't exceed the image
    grid = pixel_grid_ndc(h, w, depth.dtype)  # (h,w,2)

    weight = ((depth > 0) & (mask > 0) & (match_conf > 0)).astype(jnp.float32)
    flat_w = weight.reshape(b, -1)
    # static pixel budget: top-k by mask weight (+ conf tiebreak)
    score = flat_w * (1.0 + match_conf.reshape(b, -1))
    _, idx = jax.lax.top_k(score, max_points)  # (B, K)
    valid = jnp.take_along_axis(flat_w, idx, 1) > 0

    src = jnp.take_along_axis(match.reshape(b, -1, 3),
                              idx[..., None], 1)          # canonical coords
    z = jnp.take_along_axis(depth.reshape(b, -1), idx, 1)  # (B, K)
    uv = jnp.take_along_axis(
        jnp.broadcast_to(grid.reshape(1, -1, 2), (b, h * w, 2)),
        idx[..., None], 1)
    x = (uv[..., 0] - pp_crop[:, None, 0]) * z / foc_crop[:, None, 0]
    y = (uv[..., 1] - pp_crop[:, None, 1]) * z / foc_crop[:, None, 1]
    tgt = jnp.stack([x, y, z], -1)  # back-projected, depth units (mm)

    fit = ransac_umeyama_batch(key, src, tgt, valid, n_iters=n_iters)

    # fallback default pose on failure (tester.py:374-379)
    ok = fit["ok"] & (jnp.sum(valid, -1) >= 5)
    eye = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    rotation = jnp.where(ok[:, None, None], fit["R"], eye)
    translation = jnp.where(ok[:, None], fit["t"],
                            jnp.asarray([0.0, 0.0, 500.0]))
    scale = jnp.where(ok, fit["scale"], 100.0)

    translation = translation[:, None, :] * 0.001   # mm -> m
    scale_fit = scale[:, None, None] * 0.001

    # canonical-frame alignment (tester.py:404-407)
    pred_v_b = jnp.einsum("bnc,dc->bnd", pred_v, base_rot)  # pred_v @ R_b^T
    rotation = jnp.einsum("de,bec->bdc", base_rot, rotation)  # R_b @ R

    mins = pred_v_b.min(axis=1)
    maxs = pred_v_b.max(axis=1)
    ctr = (mins + maxs) / 2.0
    corners = []
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                corners.append(jnp.stack([
                    jnp.where(sx, maxs[:, 0], mins[:, 0]),
                    jnp.where(sy, maxs[:, 1], mins[:, 1]),
                    jnp.where(sz, maxs[:, 2], mins[:, 2])], -1))
    bbox = jnp.stack([ctr] + corners, axis=1)  # (B, 9, 3)

    bbox9 = jnp.einsum("bkc,bcd->bkd", bbox * scale_fit, rotation) + translation
    verts = jnp.einsum("bnc,bcd->bnd", pred_v_b * scale_fit, rotation) \
        + translation
    size = (maxs - mins) * scale_fit[..., 0]
    return dict(bbox9=bbox9, verts=verts, rotation=rotation,
                translation=translation, scale_fit=scale_fit, size=size,
                ok=ok)
