"""Dense pure-jnp soft rasterizer — ground truth for the Pallas kernels.

Materializes (B, P, F) arrays, so use only for small sizes (tests) or as a
CPU fallback. Semantics match the reference CUDA kernel
(soft_rasterize_cuda_kernel.cu:310-482) exactly, including:
  * euclidean signed point-to-triangle distance (line distance when inside,
    segment distance when outside)
  * distance cut: outside faces with d^2 >= sigma*DIST_CUT contribute nothing
  * alpha = 1 - prod(1 - D)   ('prod' aggregation)
  * rgb 'softmax': D-weighted softmax over normalized inverse depth with a
    background pseudo-fragment at depth eps
  * rgb 'hard': nearest front-side face containing the pixel
  * z-range (near/far) faces keep alpha but drop rgb
  * gradient flow identical to the CUDA backward: interpolation weights are
    stop_gradient'ed; vertex xy grads only via coverage, z grads via softmax.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from selfcorr_tpu.ops.rasterizer import common as C


def rasterize_dense(
    face_verts: jnp.ndarray,      # (B, F, 3, 3) rasterizer space
    face_tex: jnp.ndarray,        # (B, F, 3, 3) per-corner colors (vertex tex)
    image_size: int,
    sigma: float,
    gamma: float,
    rgb_mode: str = "softmax",    # 'softmax' | 'hard' | 'none'
    bg_color=(0.0, 0.0, 0.0),
    near: float = C.NEAR,
    far: float = C.FAR,
    bg_eps: float = C.BG_EPS,
    double_side: bool = True,
    texture_type: str = "vertex",  # 'vertex' (B,F,3,3) | 'surface' (B,F,R^2,3)
) -> jnp.ndarray:
    """Returns (B, S, S, 4) RGBA, top row = y near +1 (image convention)."""
    B, F = face_verts.shape[:2]
    S = image_size
    consts = C.pack_face_constants(face_verts)
    xp, yp = C.pixel_grid(S, face_verts.dtype)

    sign, dis2, w = C.coverage_distance(consts, xp, yp)  # (B,P,F), w (B,P,F,3)

    threshold = sigma * C.DIST_CUT
    contributes = (sign > 0) | (dis2 < threshold)
    D = jax.nn.sigmoid(sign * dis2 / sigma) * contributes

    alpha = 1.0 - jnp.prod(1.0 - D, axis=-1)  # (B,P)

    # interpolation weights: clipped, normalized, constant w.r.t. vertices
    w_clip = jnp.clip(w, 0.0, 1.0)
    w_clip = w_clip / jnp.maximum(w_clip.sum(-1, keepdims=True), 1e-5)
    w_clip = jax.lax.stop_gradient(w_clip)

    inv_z = consts.inv_z[:, None]  # (B,1,F,3)
    zp = 1.0 / jnp.sum(w_clip * inv_z, axis=-1)  # (B,P,F)
    z_ok = (zp >= near) & (zp <= far)
    facing = (consts.front[:, None] > 0) | double_side
    rgb_ok = contributes & z_ok & facing

    if texture_type == "vertex":
        color = jnp.einsum("bpfk,bfkc->bpfc", w_clip, face_tex)  # (B,P,F,3)
    else:  # per-face R^2 texel grids (kernel.cu:178-195 sampling)
        from selfcorr_tpu.models.surface_texture import sample_surface_texture
        res = int(round(face_tex.shape[2] ** 0.5))
        tex_b = jnp.broadcast_to(face_tex[:, None],
                                 (B, w_clip.shape[1]) + face_tex.shape[1:])
        color = sample_surface_texture(tex_b, w_clip[..., 0], w_clip[..., 1],
                                       w_clip[..., 2], res)
    bg = jnp.asarray(bg_color, face_verts.dtype)

    if rgb_mode == "softmax":
        zn = (far - zp) / (far - near)
        zn_masked = jnp.where(rgb_ok, zn, -jnp.inf)
        m = jnp.maximum(bg_eps, jnp.max(zn_masked, axis=-1))  # (B,P)
        # masked exponent, not a post-hoc mask: excluded faces may have
        # zn >> m (e.g. zp < near) and would overflow exp into inf * 0 = nan
        wgt = D * jnp.exp((zn_masked - m[..., None]) / gamma)
        wbg = jnp.exp((bg_eps - m) / gamma)
        ssum = wgt.sum(-1) + wbg
        rgb = (jnp.einsum("bpf,bpfc->bpc", wgt, color)
               + wbg[..., None] * bg[None, None]) / ssum[..., None]
    elif rgb_mode == "hard":
        inside_nonstrict = jnp.all((w >= 0) & (w <= 1), axis=-1)
        hard_ok = inside_nonstrict & rgb_ok
        zp_m = jnp.where(hard_ok, zp, jnp.inf)
        winner = jnp.argmin(zp_m, axis=-1)  # (B,P), first on ties
        has = jnp.take_along_axis(hard_ok, winner[..., None], -1)[..., 0]
        rgb_w = jnp.take_along_axis(color, winner[..., None, None].repeat(3, -1),
                                    -2)[..., 0, :]
        rgb = jnp.where(has[..., None], rgb_w, bg[None, None])
        rgb = jax.lax.stop_gradient(rgb) + (rgb_w - jax.lax.stop_gradient(rgb_w)) \
            * has[..., None]  # grads only to the winning texture, as CUDA
    elif rgb_mode == "none":
        rgb = jnp.zeros((B, S * S, 3), face_verts.dtype)
    else:
        raise ValueError(rgb_mode)

    out = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    return out.reshape(B, S, S, 4)


@partial(jax.jit, static_argnames=("image_size",))
def render_fused_dense(face_verts, soft_tex, hard_tex, image_size: int,
                       surf_tex=None):
    """Dense version of the fused training render (ground truth for Pallas).

    Returns dict with:
      alpha1 (B,S,S)  sigma=1e-4 coverage  (mask_render / depth_mask / match_mask)
      alpha2 (B,S,S)  sigma=1e-3 coverage  (tex_mask)
      depth  (B,S,S)  softmax(gamma=1e-4)-aggregated camera-space z, white bg
      tex    (B,S,S,3) softmax(gamma=1e-2) rgb with sigma=1e-3, white bg
      match  (B,S,S,3) hard rgb of hard_tex (no gradients)
    face_verts are rasterizer-space; camera z = z - EYE_OFFSET.
    surf_tex (B,F,R^2,3) switches the tex pass to 'surface' texel grids.
    """
    zcam_tex = jnp.broadcast_to(
        (face_verts[..., 2] - C.EYE_OFFSET)[..., None], face_verts.shape[:3] + (3,))
    mask_out = rasterize_dense(face_verts, zcam_tex, image_size,
                               sigma=1e-4, gamma=1e-4, rgb_mode="softmax",
                               bg_color=(1.0, 1.0, 1.0))
    tex_out = rasterize_dense(
        face_verts, soft_tex if surf_tex is None else surf_tex, image_size,
        sigma=1e-3, gamma=1e-2, rgb_mode="softmax",
        bg_color=(1.0, 1.0, 1.0),
        texture_type="vertex" if surf_tex is None else "surface")
    match_out = rasterize_dense(jax.lax.stop_gradient(face_verts),
                                jax.lax.stop_gradient(hard_tex), image_size,
                                sigma=1e-4, gamma=1e-3, rgb_mode="hard",
                                bg_color=(0.0, 0.0, 0.0))
    return {
        "alpha1": mask_out[..., 3],
        "alpha2": tex_out[..., 3],
        "depth": mask_out[..., 2],
        "tex": tex_out[..., :3],
        "match": match_out[..., :3],
    }
