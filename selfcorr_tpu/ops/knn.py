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
    Returns (B, N) float32.

    argmin-gather formulation: only the WINNING index is taken from the
    (B, N, M) pairwise field, and the min distance is then recomputed
    exactly from the gathered winner. The index is a constant of the
    minimized function (the true subgradient fixes the argmin), so gradients
    through the gather equal those through a min — and reverse-mode never
    stores an (N, M) block (the earlier einsum+scan version wrote
    (B, N, chunk) f32 blocks to HBM every scan step: ~70 ms of pure
    bandwidth at flagship symmetry-loss shapes).

    The argmin pass picks between two strategies by size:
      * small B*N*M: |x|^2 + |y|^2 - 2 x.y with the cross term on the MXU,
        one materialized (B, N, M) f32 write + argmin read (~4 ms at the
        symmetry-loss shapes — the VPU loop fusion below measured 3x
        slower there);
      * large: virtual broadcast - square - sum(3) feeding the argmin
        reduce in one XLA loop fusion, no HBM materialization (the
        depth-chamfer shapes would need a 17 GB buffer materialized).
    The materialized pass may pick a different index on near-exact ties
    (f32 reassociation); the recomputed distance is exact either way.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xs = jax.lax.stop_gradient(x)   # the argmin pass carries no gradients
    ys = jax.lax.stop_gradient(y)
    if x.shape[0] * x.shape[1] * y.shape[1] <= 600_000_000:
        xy = jnp.einsum("bnd,bmd->bnm", xs, ys,
                        preferred_element_type=jnp.float32)
        x2 = jnp.sum(xs * xs, axis=-1)
        y2 = jnp.sum(ys * ys, axis=-1)
        d2v = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
    else:
        d2v = jnp.sum((xs[:, :, None, :] - ys[:, None, :, :]) ** 2, axis=-1)
    if y_valid is not None:
        d2v = jnp.where(y_valid[:, None, :] > 0, d2v, jnp.inf)
    idx = jax.lax.stop_gradient(jnp.argmin(d2v, axis=-1))      # (B, N)
    ynn = jnp.take_along_axis(y, idx[..., None], axis=1)       # (B, N, 3)
    out = jnp.sum((x - ynn) ** 2, axis=-1)
    if y_valid is not None:
        vnn = jnp.take_along_axis(y_valid.astype(jnp.float32),
                                  idx, axis=1)
        out = jnp.where(vnn > 0, out, jnp.inf)
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
