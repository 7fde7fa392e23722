"""Correspondence losses and the batch-pairing index transforms.

The pairing functions realize the reference's batch-layout contract
(loss_utils.py:326-345): a training batch is laid out video-major,
frame-minor — [v1f1..v1fR, v2f1..v2fR, ...] — and src/tgt pairs are built by
rolling frames within a video ('frame'), videos within the batch
('instance'), or both concatenated ('both').
"""
from __future__ import annotations

import jax.numpy as jnp


def match_loss(match: jnp.ndarray, match_gt: jnp.ndarray,
               match_mask: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """||match - match_gt||_2 over pixels where both the render and the
    object mask are on (loss_utils.py:317-319). match NHWC (B,H,W,3);
    masks (B,H,W). Returns (B,)."""
    m = ((match_mask > 0) & (mask > 0)).astype(match.dtype)
    err = jnp.linalg.norm(match - match_gt, axis=-1) * m
    return err.mean(axis=(1, 2))


def imatch_loss(imatch: jnp.ndarray, imatch_gt: jnp.ndarray,
                depth_weight: jnp.ndarray) -> jnp.ndarray:
    """Visibility-weighted 2D reprojection error of per-vertex matches
    (loss_utils.py:321-324). imatch (B,N,2); depth_weight (B,N). (B,)."""
    err = jnp.linalg.norm(imatch - imatch_gt, axis=-1) * depth_weight
    return err.mean(axis=1)


def divide_by_frame(x: jnp.ndarray, batch_size: int, repeat: int):
    """src = x; tgt = next frame of the same video (cyclic)."""
    s = x.reshape(batch_size, repeat, *x.shape[1:])
    t = jnp.roll(s, -1, axis=1)
    flat = lambda a: a.reshape(-1, *x.shape[1:])
    return flat(s), flat(t)


def divide_by_instance(x: jnp.ndarray, batch_size: int, repeat: int):
    """src = x; tgt = same frame index of the next video (cyclic)."""
    s = x.reshape(batch_size, repeat, *x.shape[1:])
    t = jnp.roll(s, -1, axis=0)
    flat = lambda a: a.reshape(-1, *x.shape[1:])
    return flat(s), flat(t)


def divide_by_both(x: jnp.ndarray, batch_size: int, repeat: int):
    sf, tf = divide_by_frame(x, batch_size, repeat)
    si, ti = divide_by_instance(x, batch_size, repeat)
    return jnp.concatenate([sf, si], 0), jnp.concatenate([tf, ti], 0)


DIVIDE_FNS = {"frame": divide_by_frame, "instance": divide_by_instance,
              "both": divide_by_both}
