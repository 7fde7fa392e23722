"""Public rasterizer API.

render_fused(face_verts, soft_tex, hard_tex, image_size) is the production
path: one fused Pallas pass producing every render product the training loss
needs (reference launches 4 CUDA rasterizations for the same products,
model/module/renderer.py:38-73).

soft_rasterize(...) is the general single-config entry (any sigma/gamma/rgb
mode) used for parity tests, visualization and small offline jobs; it is
backed by the dense jnp implementation (O(B*P*F) memory — fine for vis-sized
inputs, and exact).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from selfcorr_tpu.ops.rasterizer import common as C
from selfcorr_tpu.ops.rasterizer import pallas_raster as PR
from selfcorr_tpu.ops.rasterizer import reference as ref


@dataclass(frozen=True)
class RasterConfig:
    image_size: int = 256
    sigma: float = 1e-5
    gamma: float = 1e-4
    rgb_mode: str = "softmax"
    bg_color: tuple = (0.0, 0.0, 0.0)
    near: float = C.NEAR
    far: float = C.FAR
    bg_eps: float = C.BG_EPS
    double_side: bool = True


def soft_rasterize(face_verts: jnp.ndarray, face_tex: jnp.ndarray,
                   cfg: RasterConfig) -> jnp.ndarray:
    """General-purpose (B,S,S,4) rasterization (dense reference backend)."""
    return ref.rasterize_dense(
        face_verts, face_tex, cfg.image_size, cfg.sigma, cfg.gamma,
        rgb_mode=cfg.rgb_mode, bg_color=cfg.bg_color, near=cfg.near,
        far=cfg.far, bg_eps=cfg.bg_eps, double_side=cfg.double_side)


def render_fused(face_verts: jnp.ndarray, soft_tex: jnp.ndarray,
                 hard_tex: jnp.ndarray, image_size: int,
                 sigma1: float = 1e-4, sigma2: float = 1e-3,
                 gamma_d: float = 1e-4, gamma_t: float = 1e-2,
                 backend: str = "pallas", interpret: bool | None = None,
                 surf_tex: jnp.ndarray | None = None):
    """Fused 4-in-1 render. face_verts (B,F,3,3) rasterizer space
    (z = camera z + EYE_OFFSET); textures (B,F,3corner,3rgb).

    surf_tex (B,F,R^2,3), when given, switches the texture pass to per-face
    texel grids ('surface' mode, soft_rasterize_cuda_kernel.cu:178-217);
    soft_tex is then ignored by the texture pass.

    Returns dict: alpha1, alpha2, depth (camera z), tex (B,S,S,3),
    match (B,S,S,3).
    """
    if backend == "dense":
        return ref.render_fused_dense(face_verts, soft_tex, hard_tex,
                                      image_size, surf_tex=surf_tex)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tex_res = 0
    if surf_tex is not None:
        tex_res = int(round(surf_tex.shape[2] ** 0.5))
        assert tex_res * tex_res == surf_tex.shape[2], surf_tex.shape
    consts = PR.pack_constants(face_verts, soft_tex, hard_tex,
                               surf_tex=surf_tex,
                               n_bands=PR.bands_for(image_size))
    out = PR.raster_fused_core(
        consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
        C.NEAR, C.FAR, C.BG_EPS, C.EYE_OFFSET, interpret, tex_res)
    return {
        "alpha1": out["alpha1"],
        "alpha2": out["alpha2"],
        "depth": out["depth"],
        "tex": jnp.stack([out["texr"], out["texg"], out["texb"]], axis=-1),
        "match": jnp.stack([out["matr"], out["matg"], out["matb"]], axis=-1),
    }
