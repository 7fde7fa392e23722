"""PointNet-style mesh vertex feature encoder.

Parity with reference model/module/network/mesh_encoder.py:6-40: a spatial
transformer (shared per-point MLP 3->128, max-pool, fc->3x3 + I) aligns the
point cloud, then a shared per-point linear 3->n_feat + ReLU produces
per-vertex features. Per-point 1x1 convs are plain matmuls on TPU (MXU).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class STN3d(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: (B, N, 3)
        y = nn.relu(nn.Dense(128, name="conv1")(x))      # (B, N, 128)
        y = jnp.max(y, axis=1)                           # (B, 128)
        m = nn.Dense(9, name="fc")(y)                    # (B, 9)
        m = m + jnp.eye(3).reshape(9)                    # bias toward identity
        return m.reshape(-1, 3, 3)


class MeshEncoder(nn.Module):
    n_feat: int = 64

    @nn.compact
    def __call__(self, x):  # x: (B, N, 3) -> (B, N, n_feat)
        trans = STN3d(name="stn")(x)
        x = jnp.matmul(x, trans)
        return nn.relu(nn.Dense(self.n_feat, name="conv1")(x))
