"""Camera / rotation geometry in pure jax.numpy.

Conventions (matching the reference semantics, reimplemented TPU-first):
  * Rotations act on ROW vectors: ``v_cam = v_obj @ R + t``
    (reference: model/module/encoder.py:49-52, model/util/loss_utils.py:56).
  * NDC projection: ``x' = pp_x + x * f_x / z``; the rasterizer consumes
    y-flipped NDC (reference: model/util/loss_utils.py:38-47,57).
  * Quaternions are WXYZ.

Everything here is shape-polymorphic, jit-safe, and has no Python branching
on traced values.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def rot6d_to_matrix(x6: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D rotation parameterization -> (..., 3, 3).

    Matches the reference head exactly (model/module/network/pose_predictor.py:64-74):
    x = normalize(a); z = normalize(a x b); y = normalize(z x x);
    R = stack((x, y, z), axis=-1)  (columns are x,y,z).
    """
    a = x6[..., :3]
    b = x6[..., 3:6]
    x = normalize(a)
    z = normalize(jnp.cross(x, b))
    y = normalize(jnp.cross(z, x))
    return jnp.stack((x, y, z), axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """WXYZ unit quaternion -> rotation matrix (..., 3, 3) acting on column vecs."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> WXYZ quaternion, branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four candidate quaternions (unnormalized), one per largest diagonal term
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cand = jnp.stack([qw, qx, qy, qz], -2)  # (..., 4cand, 4)
    trace_terms = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        -1,
    )
    idx = jnp.argmax(trace_terms, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    # canonical sign: w >= 0
    return q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))


def axisangle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis (..., 3) + angle (...,) -> WXYZ quaternion."""
    axis = normalize(axis)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of WXYZ quaternions, broadcasting."""
    w1, v1 = q1[..., :1], q1[..., 1:]
    w2, v2 = q2[..., :1], q2[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def rigid_transform(verts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Row-vector rigid transform: (..., N, 3) @ (..., 3, 3) + (..., 1, 3)."""
    return jnp.matmul(verts, R) + t


def project_ndc(verts_cam: jnp.ndarray, pp: jnp.ndarray, foc: jnp.ndarray,
                flip_y: bool = True) -> jnp.ndarray:
    """Pinhole projection into NDC, keeping camera-space z in channel 2.

    verts_cam: (B, N, 3) camera-space points.
    pp, foc:   (B, 2) NDC principal point / focal (pixels / (S/2), pp in [-1,1]).
    Returns (B, N, 3) with x' = pp_x + x fx / z, y' = -(pp_y + y fy / z) when
    flip_y (the rasterizer's y-up convention), z' = z.
    Reference: model/util/loss_utils.py:38-47 followed by the y-flip at :57.
    """
    z = verts_cam[..., 2]
    x = pp[..., None, 0] + verts_cam[..., 0] * foc[..., None, 0] / z
    y = pp[..., None, 1] + verts_cam[..., 1] * foc[..., None, 1] / z
    if flip_y:
        y = -y
    return jnp.stack([x, y, z], axis=-1)


def camera_geodesic(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation matrices (reference loss_utils.py:228-234)."""
    m = jnp.matmul(m1, jnp.swapaxes(m2, -1, -2))
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def depth_to_point_cloud(depth: jnp.ndarray, pp: jnp.ndarray, foc: jnp.ndarray) -> jnp.ndarray:
    """Back-project a (B, H, W) depth map with NDC intrinsics -> (B, H*W, 3).

    Pixel centers on an NDC grid (u,v in (-1,1)); X = (u - pp_x) Z / f_x.
    Reference: model/util/loss_utils.py:306-315.
    """
    b, h, w = depth.shape
    u = (jnp.arange(w, dtype=depth.dtype) + 0.5) * 2.0 / w - 1.0
    v = (jnp.arange(h, dtype=depth.dtype) + 0.5) * 2.0 / h - 1.0
    uu, vv = jnp.meshgrid(u, v)
    Z = depth
    X = (uu[None] - pp[:, 0, None, None]) * Z / foc[:, 0, None, None]
    Y = (vv[None] - pp[:, 1, None, None]) * Z / foc[:, 1, None, None]
    return jnp.stack([X, Y, Z], axis=-1).reshape(b, -1, 3)


# ---------------------------------------------------------------------------
# Symmetry / canonical-frame rotation sets (host-side numpy constants)
# ---------------------------------------------------------------------------

def symmetry_rotations(symmetry_idx: int, division: int = 17) -> np.ndarray:
    """Rotation set used by the symmetry loss (reference mesh.py:75-89, symmetry.py).

    symmetry_idx 0: `division`-fold rotation about +y (bottles/bowls/cans).
    symmetry_idx 1: identity + x-mirror (laptops/mugs).
    otherwise:      identity only.
    """
    if symmetry_idx == 0:
        thetas = 2.0 * np.pi * np.arange(division) / division
        c, s = np.cos(thetas), np.sin(thetas)
        rots = np.zeros((division, 3, 3), np.float32)
        rots[:, 0, 0] = c
        rots[:, 0, 2] = s
        rots[:, 1, 1] = 1
        rots[:, 2, 0] = -s
        rots[:, 2, 2] = c
        return rots
    if symmetry_idx == 1:
        rots = np.stack([np.eye(3, dtype=np.float32),
                         np.diag([-1.0, 1.0, 1.0]).astype(np.float32)])
        return rots
    return np.eye(3, dtype=np.float32)[None]


def y_rotation(theta: float) -> np.ndarray:
    """Single rotation about +y by theta (row-vector convention caller-defined)."""
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def base_rotation(flat9) -> np.ndarray:
    """Canonical-frame alignment matrix from a flat 9-list flag
    (reference model/util/base_rot.py:10-17)."""
    v = [float(x) for x in flat9]
    return np.array(v, np.float32).reshape(3, 3)


def base_quaternions(num_az: int = 1, num_el: int = 1,
                     initial_quat_bias_deg: float = 0.0,
                     elevation_bias: float = 0.0,
                     azimuth_bias: float = 0.0) -> np.ndarray:
    """Multipose hypothesis base quaternions (reference base_rot.py:19-38).

    All shipped configs use num_az = num_el = 1 (a single hypothesis).
    """
    axis_x = np.array([1.0, 0, 0], np.float32)
    axis_y = np.array([0, 1.0, 0], np.float32)
    qb = np.asarray(axisangle_to_quat(jnp.asarray(axis_x),
                                      jnp.asarray(initial_quat_bias_deg / 180.0 * np.pi)))
    az = np.linspace(0, 2 * np.pi, num=num_az, endpoint=False) + azimuth_bias * np.pi / 180
    el = np.linspace(-np.pi / 2, np.pi / 2, num=num_el + 1, endpoint=False)[1:] + \
        elevation_bias * np.pi / 180
    qaz = np.asarray(axisangle_to_quat(jnp.asarray(axis_y), jnp.asarray(az)))
    qel = np.asarray(axisangle_to_quat(jnp.asarray(axis_x), jnp.asarray(el)))
    q = np.asarray(quat_product(jnp.asarray(qel)[None, :, :], jnp.asarray(qaz)[:, None, :]))
    q = q.reshape(-1, 4)
    return np.asarray(quat_product(jnp.asarray(q), jnp.asarray(qb)[None]))
