"""Geometric regularizers: Laplacian smoothness, dihedral flatten, symmetry
chamfer, pull-far, deformation, camera geodesic.

Parity with reference loss_utils.py:63-234 and mesh.py:53-62, with one
TPU-first algebraic change in the symmetry loss: instead of sampling the
surface once per symmetry rotation and rotating the samples
(mesh.py:55-60 — k x 10k points per batch element), we rotate the *vertices*
by R^T and reuse ONE sample set per element: |v - sR| = |vR^T - s|. This is
exactly equal (rotations are isometries) and k-fold cheaper.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from selfcorr_tpu.ops.knn import chamfer_single_way
from selfcorr_tpu.ops.mesh_ops import sample_surface


def laplacian_loss(pred_v: jnp.ndarray, laplacian: jnp.ndarray) -> jnp.ndarray:
    """mean over batch of sum_i |L pred_v|^2 (loss_utils.py:86-96).

    laplacian: (V, V) static constant (row-normalized). Returns scalar.
    """
    lx = jnp.einsum("vw,bwc->bvc", laplacian, pred_v)
    return jnp.sum(lx ** 2, axis=(1, 2)).mean()


def flatten_loss(pred_v: jnp.ndarray, quads, eps: float = 1e-6) -> jnp.ndarray:
    """Dihedral-angle flatten loss over edge quadruples
    (loss_utils.py:145-183). quads = (v0s, v1s, v2s, v3s) int arrays."""
    v0s, v1s, v2s, v3s = quads
    v0 = pred_v[:, v0s]
    v1 = pred_v[:, v1s]
    v2 = pred_v[:, v2s]
    v3 = pred_v[:, v3s]

    def perp(a, b, al2, ab):
        c = a * (ab / (al2 + eps))[..., None]
        return b - c

    a1 = v1 - v0
    b1 = v2 - v0
    a1l2 = (a1 ** 2).sum(-1)
    b1l2 = (b1 ** 2).sum(-1)
    b1l1 = jnp.sqrt(b1l2 + eps)
    ab1 = (a1 * b1).sum(-1)
    cos1 = ab1 / (jnp.sqrt(a1l2 + eps) * b1l1 + eps)
    sin1 = jnp.sqrt(1 - cos1 ** 2 + eps)
    cb1 = perp(a1, b1, a1l2, ab1)
    cb1l1 = b1l1 * sin1

    b2 = v3 - v0
    b2l2 = (b2 ** 2).sum(-1)
    b2l1 = jnp.sqrt(b2l2 + eps)
    ab2 = (a1 * b2).sum(-1)
    cos2 = ab2 / (jnp.sqrt(a1l2 + eps) * b2l1 + eps)
    sin2 = jnp.sqrt(1 - cos2 ** 2 + eps)
    cb2 = perp(a1, b2, a1l2, ab2)
    cb2l1 = b2l1 * sin2

    cos = (cb1 * cb2).sum(-1) / (cb1l1 * cb2l1 + eps)
    return ((cos + 1) ** 2).sum(-1).mean()


def symmetry_loss(key: jax.Array, pred_v: jnp.ndarray, faces: jnp.ndarray,
                  symm_rots: jnp.ndarray, n_samples: int = 10000) -> jnp.ndarray:
    """One-way chamfer from vertices to the rotated surface (mesh.py:53-62).

    pred_v (B, V, 3); symm_rots (k, 3, 3). Scalar mean over (B*k).
    Implemented as chamfer(v R^T, samples) with one shared sample set per
    batch element — mathematically identical, k-fold fewer samples.
    """
    b, v, _ = pred_v.shape
    k = symm_rots.shape[0]
    samples = sample_surface(key, pred_v, faces, n_samples)  # (B, S, 3)
    # v @ R^T for every rotation: (B, k, V, 3)
    v_rot = jnp.einsum("bvc,kdc->bkvd", pred_v, symm_rots)
    v_rot = v_rot.reshape(b * k, v, 3)
    samples_rep = jnp.repeat(samples, k, axis=0)  # (B*k, S, 3)
    return chamfer_single_way(v_rot, samples_rep)


def pullfar_loss(translation: jnp.ndarray) -> jnp.ndarray:
    """relu(1 - z).mean() — keeps objects in front of the camera
    (model.py:116)."""
    return jax.nn.relu(1.0 - translation[..., -1]).mean()


def deform_loss(pred_v: jnp.ndarray, mean_v: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 (huber, beta=1) between deformed and mean shape
    (model.py:118 F.smooth_l1_loss)."""
    d = jnp.abs(pred_v - mean_v)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5).mean()


def camera_loss(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance between consecutive-frame rotations
    (loss_utils.py:228-234, model.py:126-129)."""
    from selfcorr_tpu.ops.geometry import camera_geodesic
    return camera_geodesic(r1, r2)
