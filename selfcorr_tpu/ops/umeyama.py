"""Similarity-transform estimation (Umeyama SVD) with vectorized RANSAC.

TPU-native redesign of the reference's per-image Python RANSAC loop
(model/util/umeyama.py:9-41,95-156,161-202): here every image's pose fit is a
fixed-iteration, fixed-shape computation — all 100 RANSAC hypotheses are
fitted *in parallel* with one batched 3x3 SVD instead of a sequential Python
loop, and padded/masked point sets replace dynamic inlier indexing. vmap over
the batch gives whole-batch pose fitting in a single XLA program.

Semantics parity notes (deliberately preserved quirks):
  * covariance is divided by n, source variance is *unbiased* (/(n-1)) —
    mixed normalization as in the reference (umeyama.py:180,189-190).
  * RANSAC picks 5-point samples, scores a hypothesis by the norm of the
    residual vector over ALL points (not only inliers) (umeyama.py:124-129).
  * pass threshold = max(|t|/|s|, |s|/|t|) mean-norm ratio (umeyama.py:16-21).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def umeyama_similarity(src: jnp.ndarray, tgt: jnp.ndarray, w: jnp.ndarray):
    """Weighted Umeyama similarity fit in ROW convention: tgt ~ s * src @ R + t.

    This is the convention the reference consumes downstream
    (model/tester.py:402 `pred_v.bmm(rotation) + translation`); its returned
    `Rotation = (U Vh).T` is exactly this row-acting matrix (umeyama.py:185).

    src, tgt: (N, 3); w: (N,) non-negative weights (0/1 mask).
    Returns (scale, R (3,3) row-acting, t (3,), ok).
    """
    w = w.astype(src.dtype)
    n = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], 0) / n
    mu_t = jnp.sum(tgt * w[:, None], 0) / n
    cs = (src - mu_s) * w[:, None]
    ct = (tgt - mu_t) * w[:, None]
    cov = ct.T @ (src - mu_s) / n  # (3,3) = sum (t-t̄)(s-s̄)^T / n, target-major
    U, D, Vh = jnp.linalg.svd(cov, full_matrices=True)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    flip = jnp.where(det < 0, -1.0, 1.0)
    D = D.at[-1].multiply(flip)
    U = U.at[:, -1].multiply(flip)
    R = (U @ Vh).T  # row-acting
    # unbiased variance of the source points (torch.var default), per reference
    var_p = jnp.sum(jnp.sum(cs * (src - mu_s), 0)) / jnp.maximum(n - 1.0, 1e-6)
    scale = jnp.sum(D) / jnp.maximum(var_p, 1e-12)
    t = mu_t - scale * (mu_s @ R)
    ok = (n >= 3) & jnp.isfinite(scale) & (var_p > 1e-12)
    return scale, R, t, ok


def _residuals(src, tgt, scale, R, t):
    """Row-convention residuals. (The reference scores RANSAC hypotheses with a
    transposed transform, umeyama.py:124 — a quirk made inconsequential by its
    ~mean-norm-ratio pass threshold; we score with the correct transform.)"""
    pred = scale * (src @ R) + t
    return jnp.linalg.norm(tgt - pred, axis=-1)


@partial(jax.jit, static_argnames=("n_iters", "n_sample"))
def ransac_umeyama(key: jax.Array, src: jnp.ndarray, tgt: jnp.ndarray,
                   valid: jnp.ndarray, n_iters: int = 100, n_sample: int = 5):
    """Fixed-shape RANSAC + final inlier refit for one point set.

    src, tgt: (N, 3) padded point sets; valid: (N,) bool.
    Returns dict(scale, R, t, inlier_ratio, ok).
    """
    f32 = jnp.float32
    src = src.astype(f32)
    tgt = tgt.astype(f32)
    vw = valid.astype(f32)
    n_valid = jnp.maximum(jnp.sum(vw), 1e-6)

    tgt_norm = jnp.sum(jnp.linalg.norm(tgt, axis=-1) * vw) / n_valid
    src_norm = jnp.sum(jnp.linalg.norm(src, axis=-1) * vw) / n_valid
    ratio_ts = tgt_norm / jnp.maximum(src_norm, 1e-12)
    ratio_st = src_norm / jnp.maximum(tgt_norm, 1e-12)
    pass_t = jnp.maximum(ratio_ts, ratio_st)

    # all hypothesis minimal samples at once: (n_iters, n_sample) indices
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, None, :], axis=-1,
                                 shape=(n_iters, n_sample))

    def fit_one(sample_idx):
        s = src[sample_idx]
        t_ = tgt[sample_idx]
        scale, R, t, ok = umeyama_similarity(s, t_, jnp.ones((n_sample,), f32))
        res = _residuals(src, tgt, scale, R, t)
        res = jnp.where(valid, res, 0.0)
        score = jnp.linalg.norm(res)  # over all points, as the reference does
        inliers = (res < pass_t) & valid
        score = jnp.where(ok & jnp.isfinite(score), score, jnp.inf)
        return score, inliers

    scores, inlier_sets = jax.vmap(fit_one)(idx)
    best = jnp.argmin(scores)
    best_inliers = inlier_sets[best]
    inlier_ratio = jnp.sum(best_inliers) / n_valid

    scale, R, t, ok = umeyama_similarity(src, tgt, best_inliers.astype(f32))
    ok = ok & (inlier_ratio >= 0.1) & jnp.isfinite(scores[best])
    return {"scale": scale, "R": R, "t": t, "inlier_ratio": inlier_ratio, "ok": ok}


def ransac_umeyama_batch(key: jax.Array, src: jnp.ndarray, tgt: jnp.ndarray,
                         valid: jnp.ndarray, n_iters: int = 100,
                         n_sample: int = 5):
    """vmapped whole-batch pose fit: src/tgt (B, N, 3), valid (B, N)."""
    keys = jax.random.split(key, src.shape[0])
    return jax.vmap(lambda k, s, t, v: ransac_umeyama(
        k, s, t, v, n_iters=n_iters, n_sample=n_sample))(keys, src, tgt, valid)
