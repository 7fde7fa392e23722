"""Rendering-supervision losses (mask pyramid, texture, depth).

Numerical parity with reference model/util/loss_utils.py:236-304; all maps
are NHWC ((B, H, W) for single-channel), reductions per-batch-element.
"""
from __future__ import annotations

import jax.numpy as jnp

from selfcorr_tpu.ops.image_ops import downsample_area, upsample_repeat


def mask_pyramid_loss(mask_gt: jnp.ndarray, mask_pred: jnp.ndarray,
                      occ: jnp.ndarray | None = None) -> jnp.ndarray:
    """5-scale area-pyramid MSE (loss_utils.py:236-244).

    sum_k upsample(|down_k(pred) - down_k(gt)|^2) averaged, x0.2.
    Returns (B,).
    """
    total = 0.0
    for i in range(5):  # 256,128,64,32,16
        f = 2 ** i
        diff = (downsample_area(mask_pred[..., None], f)
                - downsample_area(mask_gt[..., None], f)) ** 2
        total = total + upsample_repeat(diff, f)[..., 0]
    if occ is not None:
        total = total * (1.0 - occ)
    return 0.2 * total.mean(axis=(1, 2))


def texture_loss(img: jnp.ndarray, mask: jnp.ndarray, tex_pred: jnp.ndarray,
                 tex_mask: jnp.ndarray, occ: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
    """0.75 * masked L2 (black bg) + L1 against white-bg composite
    (loss_utils.py:246-252). img/tex_pred NHWC (B,H,W,3). Returns (B,)."""
    m = (mask > 0).astype(img.dtype)[..., None]
    img_black = img * m
    pred_black = tex_pred * tex_mask[..., None]
    img_white = 1.0 - m + img_black
    l2 = ((img_black - pred_black) ** 2).sum(-1)
    l1 = jnp.abs(img_white - tex_pred).mean(-1)
    per_pix = 0.75 * l2 + l1
    if occ is not None:
        per_pix = per_pix * (1.0 - occ)
    return per_pix.mean(axis=(1, 2))


def depth_loss_chamfer(key, pred_v, faces, depth_gt, depth_pred, depth_mask,
                       mask, pp, foc, rotation, translation,
                       n_pts: int = 2000):
    """Chamfer variant of the depth loss (loss_utils.py:286-304): the
    scale-matched depth map is back-projected, moved to the object frame, and
    each point pays its squared distance to the nearest of `n_pts` surface
    samples of the predicted mesh. Returns ((B,), diff map)."""
    import jax
    from selfcorr_tpu.ops.geometry import depth_to_point_cloud
    from selfcorr_tpu.ops.knn import min_sq_dist
    from selfcorr_tpu.ops.mesh_ops import sample_surface

    b, h, w = depth_gt.shape
    dm = (depth_mask != 0).astype(depth_pred.dtype)
    gm = ((mask * depth_gt) != 0).astype(depth_pred.dtype)
    pred_mean = (depth_pred * dm).sum() / jnp.maximum(dm.sum(), 1.0)
    gt_mean = (depth_gt * gm).sum() / jnp.maximum(gm.sum(), 1.0)
    scale = jax.lax.stop_gradient(pred_mean / jnp.maximum(gt_mean, 1e-12))
    depth_s = depth_gt * scale
    diff = depth_pred - depth_s
    diff = jnp.where(((mask * dm) != 0) & (depth_s != 0), diff, 0.0)

    pc = depth_to_point_cloud(depth_s, pp, foc)          # (B, H*W, 3)
    pc = jnp.einsum("bnc,bdc->bnd", pc - translation, rotation)  # (pc-t) R^T
    pc = jax.lax.stop_gradient(pc)
    samples = sample_surface(key, pred_v, faces, n_pts)  # (B, n_pts, 3)
    d2 = min_sq_dist(pc, samples).reshape(b, h, w)
    d2 = jnp.where((mask != 0) & (depth_gt != 0), d2, 0.0)
    return d2.mean(axis=(1, 2)), diff


def depth_loss(depth_gt: jnp.ndarray, depth_pred: jnp.ndarray,
               depth_mask: jnp.ndarray, mask: jnp.ndarray,
               thresh: float = 1.0):
    """Scale-matched squared depth difference, huber-clamped at `thresh`
    (loss_utils.py:273-284). All (B, H, W). Returns ((B,), diff map).

    The global scale ratio matches the reference's single scalar over the
    whole batch (depth_pred[depth_mask!=0].mean() / depth[mask*depth!=0].mean()).
    """
    dm = (depth_mask != 0).astype(depth_pred.dtype)
    gm = ((mask * depth_gt) != 0).astype(depth_pred.dtype)
    pred_mean = (depth_pred * dm).sum() / jnp.maximum(dm.sum(), 1.0)
    gt_mean = (depth_gt * gm).sum() / jnp.maximum(gm.sum(), 1.0)
    scale = pred_mean / jnp.maximum(gt_mean, 1e-12)
    diff = depth_pred - scale * depth_gt
    loss_mask = (mask * dm) != 0
    diff = jnp.where(loss_mask & (depth_gt != 0), diff, 0.0)
    sq = diff ** 2
    clamped = thresh - jnp.maximum(thresh - sq, 0.0)  # min(sq, thresh)
    return clamped.mean(axis=(1, 2)), diff
