"""Shared rasterizer math: pixel grid and per-face constant packing.

Single source of truth for both the dense jnp reference and the Pallas
kernels. The packing functions are *differentiable jnp* — the Pallas custom
VJP boundary sits at the packed constants, so gradients w.r.t. vertices flow
through this (cheap, O(B*F)) code via ordinary autodiff while the O(B*S^2*F)
pixel loops live in hand-written kernels.

Gradient semantics replicate the reference CUDA kernel
(soft_rasterize_cuda_kernel.cu:486-668): barycentric interpolation weights
are treated as constants (stop_gradient) — vertex-position gradients flow
only through the coverage distance (xy) and the softmax depth weighting (z).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

# look_at eye offset applied by the reference renderer before rasterization
# (softras transform.py:40 with viewing_angle=30): z_rast = z_cam + EYE_OFFSET
EYE_OFFSET = 1.0 / math.tan(math.radians(30.0)) + 1.0  # = sqrt(3) + 1

NEAR = 1.0
FAR = 100.0
BG_EPS = 1e-3          # rasterizer 'eps': background pseudo-depth in softmax
DIST_EPS_RAW = 1e-4    # 'dist_eps' before the log transform
# faces whose (outside) squared boundary distance exceeds sigma * DIST_CUT
# contribute nothing (coverage would be < DIST_EPS_RAW)
DIST_CUT = math.log(1.0 / DIST_EPS_RAW - 1.0)


def pixel_grid(image_size: int, dtype=jnp.float32):
    """Pixel-centre NDC coords, flattened row-major (top row first).

    Matches the CUDA indexing (kernel.cu:341-346): row r has
    y = (S-1-2r)/S (top row near +1), column c has x = (2c+1-S)/S.
    Returns (S*S,) xp and (S*S,) yp.
    """
    s = image_size
    r = jnp.arange(s, dtype=dtype)
    xs = (2.0 * r + 1.0 - s) / s
    ys = (s - 1.0 - 2.0 * r) / s
    xp = jnp.tile(xs, (s,))
    yp = jnp.repeat(ys, s)
    return xp, yp


class FaceConstants(NamedTuple):
    """Per-face affine data; all arrays (B, F, ...), differentiable in verts.

    Evaluations at pixel (x, y):
      bary w_k      = w_a[...,k,0] x + w_a[...,k,1] y + w_a[...,k,2]
      line dist_e   = (line[...,e,0] x + line[...,e,1] y + line[...,e,2])^2
      seg param s_e = seg[...,e,0] x + seg[...,e,1] y + seg[...,e,2]
      |p - v0_e|^2  = (x^2+y^2) + pc[...,e,0] x + pc[...,e,1] y + pc[...,e,2]
      seg dist_e    = |p-v0|^2 - 2 t s e2 + t^2 e2,  t = clamp(s, 0, 1)
    """
    w_a: jnp.ndarray    # (B,F,3,3) barycentric affine coeffs
    line: jnp.ndarray   # (B,F,3,3) normalized line coeffs per edge
    seg: jnp.ndarray    # (B,F,3,3) segment-parameter affine coeffs per edge
    e2: jnp.ndarray     # (B,F,3)   squared edge lengths
    pc: jnp.ndarray     # (B,F,3,3) |p - v0|^2 affine coeffs per edge
    inv_z: jnp.ndarray  # (B,F,3)   1/z per corner
    z: jnp.ndarray      # (B,F,3)   raw z per corner
    front: jnp.ndarray  # (B,F)     front-side flag (float 0/1)
    bbox: jnp.ndarray   # (B,F,4)   xmin, xmax, ymin, ymax


def pack_face_constants(face_verts: jnp.ndarray) -> FaceConstants:
    """face_verts: (B, F, 3, 3) rasterizer-space (x, y NDC; z depth)."""
    x = face_verts[..., 0]  # (B,F,3)
    y = face_verts[..., 1]
    z = face_verts[..., 2]

    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]

    # barycentric inverse (kernel.cu:273-287), det clamped away from zero
    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    det = jnp.where(det >= 0, jnp.maximum(det, 1e-10), jnp.minimum(det, -1e-10))
    inv = jnp.stack([
        jnp.stack([y1 - y2, x2 - x1, x1 * y2 - x2 * y1], -1),
        jnp.stack([y2 - y0, x0 - x2, x2 * y0 - x0 * y2], -1),
        jnp.stack([y0 - y1, x1 - x0, x0 * y1 - x1 * y0], -1),
    ], -2) / det[..., None, None]

    # edges k: v_k -> v_{k+1}
    xn = jnp.stack([x1, x2, x0], -1)  # next-vertex coords
    yn = jnp.stack([y1, y2, y0], -1)
    xv = jnp.stack([x0, x1, x2], -1)
    yv = jnp.stack([y0, y1, y2], -1)
    ex = xn - xv
    ey = yn - yv
    e2 = jnp.maximum(ex * ex + ey * ey, 1e-12)
    elen = jnp.sqrt(e2)

    # line distance (signed magnitude; squared later): n = (-ey, ex)/|e|
    la = -ey / elen
    lb = ex / elen
    lc = (ey * xv - ex * yv) / elen
    line = jnp.stack([la, lb, lc], -1)

    # segment parameter s = (p - v0).e / e2
    seg = jnp.stack([ex / e2, ey / e2, -(xv * ex + yv * ey) / e2], -1)

    # |p - v0|^2 = (x^2 + y^2) - 2 v0x x - 2 v0y y + |v0|^2
    pc = jnp.stack([-2.0 * xv, -2.0 * yv, xv * xv + yv * yv], -1)

    front = ((y2 - y0) * (x1 - x0) < (y1 - y0) * (x2 - x0)).astype(face_verts.dtype)

    bbox = jnp.stack([jnp.min(x, -1), jnp.max(x, -1),
                      jnp.min(y, -1), jnp.max(y, -1)], -1)

    return FaceConstants(w_a=inv, line=line, seg=seg, e2=e2, pc=pc,
                         inv_z=1.0 / z, z=z, front=front, bbox=bbox)


def coverage_distance(consts: FaceConstants, xp: jnp.ndarray, yp: jnp.ndarray):
    """Signed squared distance to each face at each pixel.

    xp, yp: (P,) pixel coords. Broadcast result shapes are (B, P, F).
    Returns (sign, dis2, w) where w is (B, P, F, 3) barycentrics.
    Used by the dense reference; the Pallas kernels inline the same algebra
    with a streaming layout.
    """
    px = xp[None, :, None, None]  # (1,P,1,1)
    py = yp[None, :, None, None]
    wa = consts.w_a[:, None]      # (B,1,F,3,3)
    w = wa[..., 0] * px + wa[..., 1] * py + wa[..., 2]  # (B,P,F,3)

    inside = jnp.all((w > 0) & (w < 1), axis=-1)  # strict, kernel.cu:73-74

    line = consts.line[:, None]
    lval = line[..., 0] * px + line[..., 1] * py + line[..., 2]
    dline2 = jnp.min(lval * lval, axis=-1)  # (B,P,F)

    seg = consts.seg[:, None]
    s = seg[..., 0] * px + seg[..., 1] * py + seg[..., 2]
    t = jnp.clip(s, 0.0, 1.0)
    pcc = consts.pc[:, None]
    p2 = px * px + py * py  # (1,P,1,1)
    pv0 = p2 + pcc[..., 0] * px + pcc[..., 1] * py + pcc[..., 2]  # (B,P,F,3)
    e2 = consts.e2[:, None]
    dseg2 = pv0 - 2.0 * t * s * e2 + t * t * e2
    dseg2 = jnp.min(jnp.maximum(dseg2, 0.0), axis=-1)

    dis2 = jnp.where(inside, dline2, dseg2)
    sign = jnp.where(inside, 1.0, -1.0)
    return sign, dis2, w
