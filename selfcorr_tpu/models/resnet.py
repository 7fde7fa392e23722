"""ResNet-18 backbone + FPN-style decoder (NHWC, flax.linen).

Architecture parity with the reference encoder
(model/module/network/image_encoder.py:119-193): the backbone exposes
conv2..conv5 pyramid levels (strides 4/8/16/32, channels 64/128/256/512); the
decoder upsamples bilinearly, concatenates and projects to `out_channels`
dense features at stride 4 (or 8). torchvision weight import is supported via
utils/weight_convert.py (ImageNet pretraining is part of the recipe,
image_encoder.py:121).

TPU notes: NHWC layout; BatchNorm statistics reduce over the *global* sharded
batch under jit (XLA inserts the cross-device reduction — the SyncBatchNorm
equivalent, trainer.py:66, with zero custom code).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from selfcorr_tpu.ops.image_ops import resize_bilinear


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = norm()(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Returns pyramid (conv2, conv3, conv4, conv5) in NHWC."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for i, (filters, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            y = BasicBlock(filters, stride, name=f"layer{i + 1}_0")(y, train)
            y = BasicBlock(filters, 1, name=f"layer{i + 1}_1")(y, train)
            feats.append(y)
        return tuple(feats)


class ConvBnRelu(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        return nn.relu(y)


class FPNDecoder(nn.Module):
    """Up-path: upconv(k+1) ++ conv(k) -> iconv(k); projects stride-4 or -8
    features to out_channels (image_encoder.py:141-193)."""
    out_channels: int = 64
    downsample: int = 4  # 4 -> stride-4 (conv2-level) output; else stride-8

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = True):
        conv2, conv3, conv4, conv5 = feats
        c5x = resize_bilinear(conv5, conv4.shape[1:3])
        c4 = ConvBnRelu(256, name="iconv4")(
            jnp.concatenate([conv4, ConvBnRelu(256, name="upconv5")(c5x, train)],
                            -1), train)
        c4x = resize_bilinear(c4, conv3.shape[1:3])
        c3 = ConvBnRelu(128, name="iconv3")(
            jnp.concatenate([conv3, ConvBnRelu(128, name="upconv4")(c4x, train)],
                            -1), train)
        c3x = resize_bilinear(c3, conv2.shape[1:3])
        c2 = ConvBnRelu(64, name="iconv2")(
            jnp.concatenate([conv2, ConvBnRelu(64, name="upconv3")(c3x, train)],
                            -1), train)
        if self.downsample == 4:
            return nn.Conv(self.out_channels, (1, 1), name="proj")(c2)
        return nn.Conv(self.out_channels, (1, 1), name="proj")(c3)
