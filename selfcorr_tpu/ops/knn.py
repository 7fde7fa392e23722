"""Nearest-neighbor / chamfer distances, TPU-style.

Replaces pytorch3d's CUDA knn (reference model/util/chamfer.py:11,70,152-156 —
single-direction chamfer) with a blocked ||x-y||^2 = |x|^2 + |y|^2 - 2 x.y
formulation: the cross term is a batched matmul (MXU), the running min is
carried through a lax.scan over target chunks so no (N, M) matrix is ever
materialized at full size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jnp.ndarray, axis: int, multiple: int, fill: float):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill), n


def min_sq_dist(x: jnp.ndarray, y: jnp.ndarray, y_valid: jnp.ndarray | None = None,
                chunk: int = 2048) -> jnp.ndarray:
    """Per-point min squared distance from x to the set y.

    x: (B, N, 3); y: (B, M, 3); y_valid: optional (B, M) bool/0-1 mask.
    Returns (B, N) float32. Memory high-water mark is (B, N, chunk).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1)  # (B, N)

    y_pad, m = _pad_to_multiple(y, 1, chunk, 0.0)
    if y_valid is None:
        valid = jnp.arange(y_pad.shape[1]) < m  # (Mp,)
        valid = jnp.broadcast_to(valid[None], (y.shape[0], y_pad.shape[1]))
    else:
        valid, _ = _pad_to_multiple(y_valid.astype(jnp.float32), 1, chunk, 0.0)
        valid = valid > 0
    n_chunks = y_pad.shape[1] // chunk
    yc = y_pad.reshape(y.shape[0], n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    vc = valid.reshape(y.shape[0], n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def body(carry, inp):
        # rematerialized: without checkpointing, reverse-mode AD stores the
        # (B, N, chunk) distance block of EVERY scan step (14 GB for the
        # 17-fold symmetry loss at batch 32, an HBM OOM); recomputing in the
        # backward pass costs one extra matmul per chunk
        yk, vk = inp  # (B, chunk, 3), (B, chunk)
        y2 = jnp.sum(yk * yk, axis=-1)  # (B, chunk)
        xy = jnp.einsum("bnd,bmd->bnm", x, yk,
                        preferred_element_type=jnp.float32)
        d2 = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
        d2 = jnp.where(vk[:, None, :], d2, jnp.inf)
        return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

    # full_like keeps the device-varying type of x (shard_map vma tracking)
    init = jnp.full_like(x[..., 0], jnp.inf)
    out, _ = jax.lax.scan(body, init, (yc, vc))
    return jnp.maximum(out, 0.0)


def chamfer_single_way(x: jnp.ndarray, y: jnp.ndarray,
                       x_valid: jnp.ndarray | None = None,
                       y_valid: jnp.ndarray | None = None,
                       point_reduction: str | None = "mean",
                       batch_reduction: str | None = "mean"):
    """One-way chamfer: mean over x of squared distance to nearest y.

    Mirrors the reference's forked pytorch3d chamfer
    (model/util/chamfer.py: chamfer_distance_single_way) including squared
    distances and mean reductions.
    """
    d2 = min_sq_dist(x, y, y_valid)
    if x_valid is not None:
        d2 = d2 * x_valid.astype(d2.dtype)
        denom = jnp.maximum(jnp.sum(x_valid, axis=-1), 1.0)
    else:
        denom = x.shape[1]
    if point_reduction is None:
        return d2
    per_batch = jnp.sum(d2, axis=-1) / denom
    if batch_reduction is None:
        return per_batch
    return jnp.mean(per_batch)


def nearest_idx(x: jnp.ndarray, y: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """Index into y of the nearest neighbour of each x point. (B,N) int32."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1)
    y_pad, m = _pad_to_multiple(y, 1, chunk, 0.0)
    n_chunks = y_pad.shape[1] // chunk
    yc = y_pad.reshape(y.shape[0], n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def body(carry, inp):
        best_d, best_i, off = carry
        yk = inp
        y2 = jnp.sum(yk * yk, axis=-1)
        xy = jnp.einsum("bnd,bmd->bnm", x, yk,
                        preferred_element_type=jnp.float32)
        d2 = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
        idx_local = jnp.argmin(d2, axis=-1)
        d_local = jnp.take_along_axis(d2, idx_local[..., None], axis=-1)[..., 0]
        in_range = (idx_local + off) < m
        d_local = jnp.where(in_range, d_local, jnp.inf)
        upd = d_local < best_d
        return (jnp.where(upd, d_local, best_d),
                jnp.where(upd, idx_local + off, best_i),
                off + yk.shape[1]), None

    init = (jnp.full_like(x[..., 0], jnp.inf),
            jnp.zeros_like(x[..., 0], dtype=jnp.int32), jnp.int32(0))
    (d, i, _), _ = jax.lax.scan(body, init, yc)
    return i
