"""Per-face surface textures (optional, off in all shipped configs).

Parity with reference model/module/surface_texture.py:8-55: a deterministic
barycentric pattern of n^2 points per face (upper/lower triangle fold), the
face-corner imatch positions interpolated at those points, and image colors
grid-sampled there -> (B, F, n^2, 3) texel grids.

Rasterization of surface textures (rgb 'surface' sampling per
soft_rasterize_cuda_kernel.cu:178-195) is supported by BOTH backends: the
dense reference implementation and the fused Pallas kernel (S_SURF slots /
tex_res packing, fwd+bwd) — pinned by tests/test_surface_texture.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from selfcorr_tpu.ops.image_ops import grid_sample


def barycentric_pattern(n: int) -> np.ndarray:
    """(n^2, 2) deterministic (u, v) weights over edges (v1-v0), (v2-v0)
    with lower-triangle folding (surface_texture.py:10-18)."""
    xx = np.zeros(n * n)
    yy = np.tile(np.arange((2 * n - 1) / (2.0 * n), 0, -1.0 / n), n)
    for i in range(n):
        xx[i * n:(i + 1) * n] = (2 * i + 1) / (2.0 * n)
        yy[i * n:(i + 1) * n] -= i / (1.0 * n)
    fold = yy < 0
    xx[fold] = 1 - xx[fold]
    yy[fold] *= -1
    return np.stack([xx, yy], -1).astype(np.float32)


def surface_texture(img: jnp.ndarray, imatch: jnp.ndarray, faces: jnp.ndarray,
                    n: int = 6) -> jnp.ndarray:
    """img (B,H,W,3); imatch (B,V,2); faces (F,3) -> (B, F, n^2, 3)."""
    b = img.shape[0]
    pat = jnp.asarray(barycentric_pattern(n))         # (n^2, 2)
    fm = imatch[:, faces]                             # (B, F, 3, 2)
    m0 = fm[:, :, 0]                                  # (B, F, 2)
    e1 = fm[:, :, 1] - m0
    e2 = fm[:, :, 2] - m0
    pts = (m0[:, :, None]
           + pat[None, None, :, 0:1] * e1[:, :, None]
           + pat[None, None, :, 1:2] * e2[:, :, None])  # (B, F, n^2, 2)
    f, s2 = pts.shape[1], pts.shape[2]
    colors = grid_sample(img, pts.reshape(b, f * s2, 2))
    return colors.reshape(b, f, s2, 3)


def sample_surface_texture(tex: jnp.ndarray, w0, w1, w2, res: int):
    """Texel lookup for barycentric coords (CUDA forward_sample_texture,
    kernel.cu:178-195): cell (floor(w0*R), floor(w1*R)), folded when the
    cell crosses the diagonal. tex (..., R^2, 3); w* broadcastable."""
    wx = jnp.clip((w0 * res).astype(jnp.int32), 0, res - 1)
    wy = jnp.clip((w1 * res).astype(jnp.int32), 0, res - 1)
    upper = ((w0 + w1) * res - wx - wy) <= 1
    idx = jnp.where(upper, wy * res + wx,
                    (res - 1 - wy) * res + (res - 1 - wx))
    return jnp.take_along_axis(tex, idx[..., None, None], axis=-2)[..., 0, :]
