"""DINO ViT-S/8 dense feature extractor (frozen).

Parity with the reference's flexible DINO wrapper
(model/module/network/dino.py:25-109 + third-party/zsp
vision_transformer_flexible.py): ViT-Small (embed 384, 12 blocks, 6 heads),
patch size 8, returning the pre-softmax attention *keys of block 9* as dense
features — shape (B, 32, 32, 384) for 256x256 inputs — which downstream code
uses for cross-frame cost volumes. A weight converter imports the released
dino_deitsmall8_pretrain.pth (utils/weight_convert.py); position embeddings
are bicubicly resized on import if the grid differs.

The module is frozen at train time (dino.py:36-37): the caller wraps the
apply in stop_gradient / excludes its params from the optimizer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class Attention(nn.Module):
    dim: int = 384
    num_heads: int = 6

    @nn.compact
    def __call__(self, x, return_kqv: bool = False):
        b, t, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b,t,h,d)
        # XLA attention. A hand-written flash-attention Pallas kernel was
        # built and measured in round 3: at these shapes (T=1025, D=64, f32)
        # it only ties XLA's materialized-softmax path on v5e (4.7 vs 5.6 ms
        # isolated; NEUTRAL in the full trunk) because the matmuls, not the
        # (b,h,t,t) HBM traffic, dominate — so the kernel was dropped. The
        # real lever is cfg.dino_bf16 (57.5 -> 40.4 ms full trunk).
        y = jax.nn.dot_product_attention(q, k, v)
        y = y.reshape(b, t, c)
        y = nn.Dense(self.dim, name="proj")(y)
        if return_kqv:
            return y, k.transpose(0, 2, 1, 3)  # k: (b, h, t, d)
        return y


class Block(nn.Module):
    dim: int = 384
    num_heads: int = 6
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, return_k: bool = False):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if return_k:
            a, k = Attention(self.dim, self.num_heads, name="attn")(
                h, return_kqv=True)
        else:
            a = Attention(self.dim, self.num_heads, name="attn")(h)
            k = None
        x = x + a
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, name="mlp")(h)
        return (x, k) if return_k else x


class DinoViTS8(nn.Module):
    """vit_small / patch 8; `feature_layer` selects which block's keys to
    return (reference uses 9, dino.py:14)."""
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 8
    feature_layer: int = 9

    @nn.compact
    def __call__(self, img):  # img: (B, H, W, 3) normalized
        b, h, w, _ = img.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed")(img)
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.dim))
        x = x + pos

        # only blocks up to feature_layer are needed: the reference computes
        # all 12 but consumes only block-9 keys (dino.py:85-105) — truncating
        # the trunk is output-identical and 25% cheaper.
        feat_k = None
        for i in range(self.feature_layer + 1):
            if i == self.feature_layer:
                _, feat_k = Block(self.dim, self.num_heads,
                                  name=f"block{i}")(x, return_k=True)
            else:
                x = Block(self.dim, self.num_heads, name=f"block{i}")(x)
        # keys: (b, heads, t, d) -> drop CLS -> dense (b, gh, gw, heads*d)
        k = feat_k[:, :, 1:, :]                      # (b, h, hw, d)
        k = k.transpose(0, 2, 1, 3).reshape(b, gh, gw, self.dim)
        return k


def dino_features(params, img, model: DinoViTS8 | None = None):
    """Frozen feature extraction: stop-gradient, f32. img NHWC normalized."""
    model = model or DinoViTS8()
    feats = model.apply({"params": params}, img)
    return jax.lax.stop_gradient(feats)
