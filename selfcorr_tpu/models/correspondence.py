"""Dense 2D<->3D correspondence: masked dual-softmax cost volumes, the
rotation-augmentation cycle loss, and the frozen-DINO cycle loss.

Parity targets: model/module/correspondence.py:36-113 and
model/module/pretrained_corr.py:48-140. All cost volumes are batched matmuls
(MXU); masks fill with -1e5 before softmax exactly as the reference.

Conventions: img features (B, P, C) row-major pixels; mesh features (B, N, C);
pointcorr (B, P, N); imatch (B, N, 2) xy in [-1, 1]; match maps NHWC.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from selfcorr_tpu.ops.image_ops import (resize_nearest, resize_bilinear,
                                        grid_sample, rotate_fast as rotate)

NEG = -1e5


def make_meshgrid(hf: int, wf: int) -> jnp.ndarray:
    """(P, 2) pixel-centre coords in [-1,1], row-major; both axes normalized
    by wf/2 as the reference does (correspondence.py:31-33)."""
    xx, yy = jnp.meshgrid(jnp.arange(wf, dtype=jnp.float32),
                          jnp.arange(hf, dtype=jnp.float32))
    grid = jnp.stack([xx, yy], -1).reshape(-1, 2) + 0.5
    return grid / (wf / 2.0) - 1.0


def masked_cost_volume(img_feat, mesh_feat, mask_down):
    """pointcorr (B, P, N) = img_feat . mesh_feat with off-mask pixels pushed
    to -1e5 (correspondence.py:42-44)."""
    pc = jnp.einsum("bpc,bnc->bpn", img_feat, mesh_feat,
                    preferred_element_type=jnp.float32)
    on = (mask_down > 0)[..., None]
    return pc * on + NEG * (~on)


def dual_softmax_match(img_feat, mesh_feat, mask, pred_v, meshgrid,
                       tau_img: float, tau_mesh: float, hf: int, wf: int,
                       compute_conf: bool = False):
    """Returns (pointcorr, match_map, imatch, match_conf).

    match_map: (B, H, W, 3) expected 3D point per pixel (nearest-upsampled);
    imatch: (B, N, 2) expected pixel per vertex; match_conf: (B, H, W) or None
    (forward-backward cycle confidence, eval only, correspondence.py:57-69).
    """
    b, h, w = mask.shape
    mask_down = resize_nearest(mask[..., None], (hf, wf)).reshape(b, -1)
    pointcorr = masked_cost_volume(img_feat, mesh_feat, mask_down)

    pc_mesh = jax.nn.softmax(tau_mesh * pointcorr, axis=1)  # pixel per vertex
    pc_img = jax.nn.softmax(tau_img * pointcorr, axis=2)    # vertex per pixel

    imatch = jnp.einsum("bpn,pk->bnk", pc_mesh, meshgrid)   # (B, N, 2)
    match = jnp.einsum("bpn,bnc->bpc", pc_img,
                       jax.lax.stop_gradient(pred_v))       # (B, P, 3)

    match_conf = None
    if compute_conf:
        # nearest vertex of each pixel's 3D match -> that vertex's imatch ->
        # distance back to the pixel = cycle error
        d2 = (jnp.sum(match ** 2, -1)[:, :, None]
              + jnp.sum(pred_v ** 2, -1)[:, None, :]
              - 2 * jnp.einsum("bpc,bnc->bpn", match, pred_v))
        nearest = jnp.argmin(d2, axis=-1)                    # (B, P)
        ipred = jnp.take_along_axis(imatch, nearest[..., None], axis=1)
        fberr = jnp.linalg.norm(meshgrid[None] - ipred, axis=-1)  # (B, P)
        conf = jnp.exp(-5.0 * fberr).reshape(b, hf, wf)
        conf = resize_bilinear(conf[..., None], (h, w))[..., 0]
        msum = jnp.maximum((mask > 0).sum(), 1)
        cmean = jnp.minimum((conf * (mask > 0)).sum() / msum, 0.5)
        match_conf = jnp.where(conf < cmean, 0.0, conf)

    match_map = resize_nearest(match.reshape(b, hf, wf, 3), (h, w))
    return pointcorr, match_map, imatch, match_conf


def rotation_cycle_loss(key, img, mask, img_feat, encode_fn, meshgrid,
                        tau_mesh: float, hf: int, wf: int):
    """Rotation-equivariance cycle loss (correspondence.py:76-113).

    Rotates the batch by one random angle, re-encodes, matches half-res
    features between original and rotated frames, and penalizes deviation of
    the soft-argmax source position from the rotated grid.
    encode_fn: img (B,H,W,3) -> normalized features (B, P, C).
    Returns (loss, cycle_match (B,2,P/4...), gt, tgt_mask_down) for vis.
    """
    b = img.shape[0]
    h2, w2 = hf // 2, wf // 2
    angle = jax.random.uniform(key, (), minval=0.0, maxval=360.0)

    grid_map = meshgrid.reshape(hf, wf, 2)[None]
    grid_half = resize_bilinear(grid_map, (h2, w2))          # (1,h2,w2,2)
    grid_half = jnp.broadcast_to(grid_half, (b, h2, w2, 2))

    tgt_img = rotate(img, angle, mode="bilinear")
    tgt_mask = rotate(mask[..., None], angle, mode="nearest")[..., 0]
    gt = rotate(jnp.broadcast_to(grid_map, (b, hf, wf, 2)), angle,
                mode="nearest")
    gt = resize_nearest(gt, (h2, w2)).reshape(b, -1, 2)

    tgt_feat = encode_fn(tgt_img)                            # (B, P, C)

    def half(feat):
        return resize_nearest(feat.reshape(b, hf, wf, -1),
                              (h2, w2)).reshape(b, h2 * w2, -1)

    src_f = half(img_feat)
    tgt_f = half(tgt_feat)
    src_m = resize_nearest(mask[..., None], (h2, w2)).reshape(b, -1)
    tgt_m = resize_nearest(tgt_mask[..., None], (h2, w2)).reshape(b, -1)

    pc = jnp.einsum("bpc,bqc->bpq", src_f, tgt_f,
                    preferred_element_type=jnp.float32)
    pair_mask = (src_m > 0)[:, :, None] & (tgt_m > 0)[:, None, :]
    pc = pc * pair_mask + NEG * (~pair_mask)
    pc_tgt = jax.nn.softmax(tau_mesh * pc, axis=1)           # src per tgt

    grid_src = grid_half.reshape(b, -1, 2)
    cycle_match = jnp.einsum("bpq,bpk->bqk", pc_tgt, grid_src)  # (B, Q, 2)
    err = jnp.linalg.norm(cycle_match - gt, axis=-1) * tgt_m
    return err.mean(), cycle_match, gt, tgt_m


def dino_pair_match(src_feat, tgt_feat, src_mask, tgt_mask, grid, k: int):
    """Mutual-argmax cross-frame matches, top-k by cycle consistency
    (pretrained_corr.py:48-104).

    src_feat/tgt_feat: (B, Q, C) dense frozen features at feat res;
    masks (B, H, W) full res; grid: (B, Q, 2). Returns (pts_src, pts_tgt,
    idx_src, idx_tgt, match_mask) with k entries each.
    """
    b, q, _ = src_feat.shape
    side = int(round(q ** 0.5))
    sm = resize_nearest(src_mask[..., None], (side, side)).reshape(b, -1)
    tm = resize_nearest(tgt_mask[..., None], (side, side)).reshape(b, -1)

    pc = jnp.einsum("bpc,bqc->bpq", src_feat, tgt_feat,
                    preferred_element_type=jnp.float32)
    pair = (sm > 0)[:, :, None] & (tm > 0)[:, None, :]
    pc = pc * pair + NEG * (~pair)

    bw = jnp.argmax(pc, axis=1)  # (B, Q) best src for each tgt
    fw = jnp.argmax(pc, axis=2)  # (B, Q) best tgt for each src
    cyc = jnp.take_along_axis(fw, bw, axis=-1)  # tgt -> src -> tgt'

    match = jnp.take_along_axis(grid, bw[..., None], axis=1)   # src coords
    cycle = jnp.take_along_axis(grid, cyc[..., None], axis=1)
    dist = jnp.linalg.norm(cycle - grid, axis=-1)
    dist = dist * (tm > 0) + 1e5 * (tm <= 0)
    _, idx = jax.lax.top_k(-dist, k)                            # (B, k)

    pts_src = jnp.take_along_axis(match, idx[..., None], axis=1)
    pts_tgt = jnp.take_along_axis(grid, idx[..., None], axis=1)
    match_mask = jnp.take_along_axis(tm, idx, axis=1)
    idx_src = jnp.take_along_axis(bw, idx, axis=-1)
    return pts_src, pts_tgt, idx_src, idx, match_mask


def dino_cycle_loss_dense(feat_pairs, mask_pairs, dw_pairs, pc_pairs,
                          meshgrid, tau_img: float, tau_mesh: float,
                          hf: int, wf: int, k: int):
    """DENSE ground truth for `dino_cycle_loss` — a literal transcription of
    the reference transport (pretrained_corr.py:107-140) that materializes
    the (B, P, Q) corr matrix. Kept only as the oracle for
    tests/test_dino_cycle.py; the train/vis paths use the factored
    `dino_cycle_loss` below, which is algebraically identical.

    feat_pairs = (src_feat, tgt_feat): frozen DINO features (B, Q, C) already
    divided by the pairing fn — the features are computed ONCE per image and
    permuted, where the reference re-runs the frozen ViT on every src/tgt
    copy (4x the forwards under divide_fn='both', pretrained_corr.py:57-75).
    pc_pairs: model pointcorr (B, P, N) per side. Returns (loss, vis dict).
    """
    src_feat, tgt_feat = feat_pairs
    mask_src, mask_tgt = mask_pairs
    dw_src, dw_tgt = dw_pairs
    pc_src, pc_tgt = pc_pairs
    b = src_feat.shape[0]
    n = pc_src.shape[-1]
    h2, w2 = hf // 2, wf // 2

    grid_map = meshgrid.reshape(hf, wf, 2)[None]
    grid_half = resize_bilinear(grid_map, (h2, w2))
    grid_half = jnp.broadcast_to(grid_half, (b, h2, w2, 2)).reshape(b, -1, 2)

    pts_src, pts_tgt, idx_src, idx_tgt, mmask = dino_pair_match(
        src_feat, tgt_feat, mask_src, mask_tgt, grid_half, k)

    def half_pc(pc):
        pm = pc.reshape(b, hf, wf, n)
        return resize_bilinear(pm, (h2, w2)).reshape(b, h2 * w2, n)

    pcs = half_pc(pc_src)
    pct = half_pc(pc_tgt)
    pc_img = jax.nn.softmax(tau_img * pct, axis=2)   # vertex per tgt pixel
    pc_mesh = jax.nn.softmax(tau_mesh * pcs, axis=1)  # src pixel per vertex
    pc_img = pc_img * (dw_tgt[:, None, :] >= 0.5)
    pc_mesh = pc_mesh * (dw_src[:, None, :] >= 0.5)

    corr = jnp.einsum("bpn,bqn->bpq", pc_mesh, pc_img,
                      preferred_element_type=jnp.float32)
    corr = corr / (corr.sum(axis=1, keepdims=True) + 1e-5)

    match = jnp.einsum("bpq,bpk->bqk", corr, grid_half)  # (B, Q, 2)
    match_sel = jnp.take_along_axis(match, idx_tgt[..., None], axis=1)

    loss = (jnp.linalg.norm(match_sel - pts_src, axis=-1) * mmask).mean()
    vis = dict(pts_src=pts_src, pts_tgt=pts_tgt, match=match_sel, mask=mmask)
    return loss, vis


def dino_cycle_loss(feat_pairs, mask_pairs, dw_pairs, imgfeat_pairs,
                    meshfeat_pairs, meshgrid, tau_img: float, tau_mesh: float,
                    hf: int, wf: int, k: int):
    """Transport DINO pixel matches through the model's pointcorr
    (pretrained_corr.py:107-140), in factored form.

    Algebraically identical to `dino_cycle_loss_dense` (the reference
    transcription, pinned by tests/test_dino_cycle.py) but never builds the
    (B, P, Q) corr matrix or the half-res (B, P, N) tgt volume:

    1. The reference bilinearly downsamples the masked cost volume
       pc = img_feat . mesh_feat + NEG*off (pretrained_corr.py:119-122). Any
       linear resize commutes with the channel contraction, so we resize the
       (masked) C-dim img features and the off-mask fraction instead of the
       N-dim volume — ~N/C (642/64) times less resize traffic, exact.
    2. The tgt-side softmax (axis=n) is row-independent and the loss only
       reads the k mutual-match rows (the reference computes all Q then
       gathers, pretrained_corr.py:137-138) — so gather the k pooled feature
       rows FIRST. Gradient-identical: the dropped rows never reach the loss.
    3. corr[p,q] = sum_n pc_mesh[p,n] pc_img[q,n], normalized by its column
       sum then contracted with the 2-col grid (pretrained_corr.py:130-138).
       Contract n first: match[q] = (pc_img[q] @ G) / (pc_img[q] @ s + 1e-5)
       with G = pc_mesh^T grid (B,N,2), s = sum_p pc_mesh (B,N) — the
       (B,P,Q) product is never materialized in fwd or bwd.

    feat_pairs = (src_feat, tgt_feat): frozen DINO features (B, Q, C),
    computed once per image and permuted (see dense docstring).
    imgfeat_pairs / meshfeat_pairs: the MODEL's normalized image features
    (B, P, Cm) and mesh features (B, N, Cm) per side — the factors of the
    full-res pointcorr built in dual_softmax_match. Returns (loss, vis dict).
    """
    src_feat, tgt_feat = feat_pairs
    mask_src, mask_tgt = mask_pairs
    dw_src, dw_tgt = dw_pairs
    if_src, if_tgt = imgfeat_pairs
    mf_src, mf_tgt = meshfeat_pairs
    b = src_feat.shape[0]
    h2, w2 = hf // 2, wf // 2

    grid_map = meshgrid.reshape(hf, wf, 2)[None]
    grid_half = resize_bilinear(grid_map, (h2, w2))
    grid_half = jnp.broadcast_to(grid_half, (b, h2, w2, 2)).reshape(b, -1, 2)

    pts_src, pts_tgt, idx_src, idx_tgt, mmask = dino_pair_match(
        src_feat, tgt_feat, mask_src, mask_tgt, grid_half, k)

    def pooled_factors(img_feat, mask):
        """Half-res (masked img feature, off-mask fraction) such that
        pooled_pc = pif @ mesh_feat^T + NEG * poff."""
        on = resize_nearest(mask[..., None], (hf, wf)).reshape(b, -1) > 0
        ifm = (img_feat * on[..., None]).reshape(b, hf, wf, -1)
        pif = resize_bilinear(ifm, (h2, w2)).reshape(b, h2 * w2, -1)
        poff = resize_bilinear(
            (~on).astype(jnp.float32).reshape(b, hf, wf, 1),
            (h2, w2)).reshape(b, h2 * w2)
        return pif, poff

    # src side: full half-res volume (softmax normalizes over ALL src pixels)
    pif_s, poff_s = pooled_factors(if_src, mask_src)
    pcs = (jnp.einsum("bpc,bnc->bpn", pif_s, mf_src,
                      preferred_element_type=jnp.float32)
           + NEG * poff_s[..., None])
    pc_mesh = jax.nn.softmax(tau_mesh * pcs, axis=1)
    pc_mesh = pc_mesh * (dw_src[:, None, :] >= 0.5)
    g_mat = jnp.einsum("bpn,bpk->bnk", pc_mesh, grid_half,
                       preferred_element_type=jnp.float32)   # (B, N, 2)
    s_vec = pc_mesh.sum(axis=1)                              # (B, N)

    # tgt side: only the k selected rows survive to the loss
    pif_t, poff_t = pooled_factors(if_tgt, mask_tgt)
    pif_sel = jnp.take_along_axis(pif_t, idx_tgt[..., None], axis=1)
    poff_sel = jnp.take_along_axis(poff_t, idx_tgt, axis=1)
    pct_sel = (jnp.einsum("bkc,bnc->bkn", pif_sel, mf_tgt,
                          preferred_element_type=jnp.float32)
               + NEG * poff_sel[..., None])
    pc_img_sel = jax.nn.softmax(tau_img * pct_sel, axis=2)
    pc_img_sel = pc_img_sel * (dw_tgt[:, None, :] >= 0.5)

    num = jnp.einsum("bkn,bnj->bkj", pc_img_sel, g_mat)
    den = jnp.einsum("bkn,bn->bk", pc_img_sel, s_vec)
    match_sel = num / (den[..., None] + 1e-5)

    loss = (jnp.linalg.norm(match_sel - pts_src, axis=-1) * mmask).mean()
    vis = dict(pts_src=pts_src, pts_tgt=pts_tgt, match=match_sel, mask=mmask)
    return loss, vis
