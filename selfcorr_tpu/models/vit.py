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

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

def flash_attention_available(want: bool = True) -> bool:
    """True when the pallas TPU flash-attention path should be used: the
    caller wants it AND the active backend is a real TPU (the library
    kernel has no CPU interpret path, so CPU tests/dryruns use XLA
    attention)."""
    return bool(want) and jax.default_backend() == "tpu"


# flash-attention tile sizes (q rows x k cols per inner step); both must
# divide the padded T (1152 at flagship shapes -> 128/384/1152 valid). With
# the library default (128, 128) the grid degenerates into b*h*(T/128)^2
# tiny programs that each re-stream K/V from HBM — measured SLOWER than
# XLA's materialized softmax (119 vs 58 ms trunk). Large q-blocks amortize
# the K/V streaming; swept via scripts/ab_flash_attention.py.
_FLASH_BLOCKS = {"q": 1152, "k": 384}


def _flash_attention(q, k, v, n_real: int | None = None):
    """Pallas TPU flash attention over (b, t, h, d) tensors.

    T is padded to a multiple of the kernel's 128-lane block size with
    zero q/k/v rows; segment ids (real=0, pad=1) keep real queries from
    attending to pad keys, and pad queries attend only to (zero) pad keys
    so their rows stay finite. Pad rows are sliced off the output.

    n_real: when the TRUNK is already padded (pad_once mode — t is a
    128-multiple but only the first n_real tokens are real), segment ids
    must still separate the trailing pad rows."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b, t, h, d = q.shape
    t_pad = -(-t // 128) * 128
    pad = t_pad - t
    if n_real is None:
        n_real = t

    def prep(x):  # (b, t, h, d) -> (b, h, t_pad, d)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)

    seg = jnp.broadcast_to(
        (jnp.arange(t_pad, dtype=jnp.int32) >= n_real).astype(jnp.int32),
        (b, t_pad))
    bq = min(_FLASH_BLOCKS["q"], t_pad)
    bk = min(_FLASH_BLOCKS["k"], t_pad)
    blocks = _fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = _fa.flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=_fa.SegmentIds(q=seg, kv=seg),
        sm_scale=1.0 / math.sqrt(d), block_sizes=blocks)
    return out.transpose(0, 2, 1, 3)[:, :t]


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
    flash: bool = False
    attn_bf16: bool = False
    n_real: int | None = None  # pad_once mode: real tokens of the padded t

    @nn.compact
    def __call__(self, x, return_kqv: bool = False):
        b, t, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b,t,h,d)
        # Default: XLA materialized-softmax attention. The (B,H,T,T) score
        # tensor (806 MB/block f32 at flagship shapes) makes it HBM-bound
        # (36 of the 57 ms trunk, dinoparts probe), but every measured
        # alternative loses end-to-end (scripts/ab_flash_attention.py,
        # v5e): the pallas flash kernel wins isolated (-5.7 ms trunk at
        # bq=bk=1152; the library-default 128 tiles are 2x slower) yet the
        # FULL STEP is ~7 ms slower with it — pad/transpose boundaries
        # around the kernel outweigh the saved traffic; attn_bf16 (bf16
        # q/k/v + scores, -18 ms trunk with flash) drifts 0.25 max-rel
        # after 9 blocks of compounding. Both stay available behind flags.
        if self.attn_bf16:
            q, k, v = (z.astype(jnp.bfloat16) for z in (q, k, v))
        if self.flash:
            y = _flash_attention(q, k, v, n_real=self.n_real)
        else:
            y = jax.nn.dot_product_attention(q, k, v)
        y = y.astype(x.dtype)  # attn_bf16 affects scores only, not the trunk
        y = y.reshape(b, t, c)
        y = nn.Dense(self.dim, name="proj")(y)
        if return_kqv:
            return y, k.transpose(0, 2, 1, 3).astype(x.dtype)  # (b, h, t, d)
        return y


class Block(nn.Module):
    dim: int = 384
    num_heads: int = 6
    mlp_ratio: int = 4
    flash: bool = False
    attn_bf16: bool = False
    n_real: int | None = None

    @nn.compact
    def __call__(self, x, return_k: bool = False):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        attn = Attention(self.dim, self.num_heads, self.flash,
                         self.attn_bf16, self.n_real, name="attn")
        if return_k:
            a, k = attn(h, return_kqv=True)
        else:
            a = attn(h)
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
    flash: bool = False      # pallas TPU flash attention (see Attention)
    attn_bf16: bool = False  # bf16 scores/softmax inside attention only
    pad_once: bool = False   # pad tokens to a 128-multiple ONCE at trunk
    # entry instead of per flash call. Requires flash=True (the XLA path
    # has no pad-key masking). Pad rows are zero at entry; each block's
    # LayerNorm maps them to its bias vector, but they can never leak into
    # real tokens: attention excludes pad keys via segment ids and every
    # other op is per-token. Output-identical to per-call padding; saves
    # 9x2 pad/slice relayouts and runs every matmul at t=1152 (a lane
    # multiple) instead of 1025.

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

        n_real = None
        if self.pad_once:
            assert self.flash, "pad_once needs the flash (segment-id) path"
            n_real = gh * gw + 1
            t_pad = -(-n_real // 128) * 128
            x = jnp.pad(x, ((0, 0), (0, t_pad - n_real), (0, 0)))

        # only blocks up to feature_layer are needed: the reference computes
        # all 12 but consumes only block-9 keys (dino.py:85-105) — truncating
        # the trunk is output-identical and 25% cheaper.
        feat_k = None
        for i in range(self.feature_layer + 1):
            blk = Block(self.dim, self.num_heads, flash=self.flash,
                        attn_bf16=self.attn_bf16, n_real=n_real,
                        name=f"block{i}")
            if i == self.feature_layer:
                _, feat_k = blk(x, return_k=True)
            else:
                x = blk(x)
        # keys: (b, heads, t, d) -> drop CLS (and pad_once's trailing pad
        # rows) -> dense (b, gh, gw, heads*d)
        k = feat_k[:, :, 1:gh * gw + 1, :]           # (b, h, hw, d)
        k = k.transpose(0, 2, 1, 3).reshape(b, gh, gw, self.dim)
        return k


def dino_features(params, img, model: DinoViTS8 | None = None):
    """Frozen feature extraction: stop-gradient, f32. img NHWC normalized."""
    model = model or DinoViTS8()
    feats = model.apply({"params": params}, img)
    return jax.lax.stop_gradient(feats)
