"""Weight converter: flax->torch-layout->flax roundtrip consistency.

Builds a synthetic torch-style state dict whose tensors are the flax-init
parameters mapped through the INVERSE layout transforms, converts it, and
checks exact recovery — validating every name/transpose in the converter
against the real flax module trees.
"""
import numpy as np
import jax
import pytest

from selfcorr_tpu.configs import Config
from selfcorr_tpu.models.resnet import ResNet18
from selfcorr_tpu.models.vit import DinoViTS8
from selfcorr_tpu.utils import weight_convert as W


class FakeTensor(np.ndarray):
    pass


def inv_conv(k):   # flax (kh,kw,I,O) -> torch (O,I,kh,kw)
    return np.transpose(k, (3, 2, 0, 1))


def inv_dense(k):  # flax (I,O) -> torch (O,I)
    return np.transpose(k, (1, 0))


def tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, sorted(a), sorted(b))
        for k in a:
            tree_equal(a[k], b[k], path + "/" + str(k))
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=path)


def test_resnet18_roundtrip():
    model = ResNet18()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32), True)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = {}
    pre = "resnet."
    sd[pre + "conv1.weight"] = inv_conv(params["conv1"]["kernel"])

    def put_bn(prefix, p, s):
        sd[prefix + ".weight"] = p["scale"]
        sd[prefix + ".bias"] = p["bias"]
        sd[prefix + ".running_mean"] = s["mean"]
        sd[prefix + ".running_var"] = s["var"]

    put_bn(pre + "bn1", params["BatchNorm_0"], stats["BatchNorm_0"])
    for layer in range(1, 5):
        for blk in range(2):
            name = f"layer{layer}_{blk}"
            src = f"{pre}layer{layer}.{blk}."
            p = params[name]
            s = stats[name]
            sd[src + "conv1.weight"] = inv_conv(p["Conv_0"]["kernel"])
            put_bn(src + "bn1", p["BatchNorm_0"], s["BatchNorm_0"])
            sd[src + "conv2.weight"] = inv_conv(p["Conv_1"]["kernel"])
            put_bn(src + "bn2", p["BatchNorm_1"], s["BatchNorm_1"])
            if "downsample_conv" in p:
                sd[src + "downsample.0.weight"] = inv_conv(
                    p["downsample_conv"]["kernel"])
                put_bn(src + "downsample.1", p["BatchNorm_2"],
                       s["BatchNorm_2"])

    conv_p, conv_s = W.convert_resnet18(sd)
    tree_equal(conv_p, params)
    tree_equal(conv_s, stats)


def test_dino_roundtrip():
    model = DinoViTS8(feature_layer=2)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {
        "patch_embed.proj.weight": inv_conv(params["patch_embed"]["kernel"]),
        "patch_embed.proj.bias": params["patch_embed"]["bias"],
        "cls_token": params["cls_token"],
        "pos_embed": params["pos_embed"],
    }
    for i in range(3):
        blk = params[f"block{i}"]
        src = f"blocks.{i}."
        sd[src + "norm1.weight"] = blk["norm1"]["scale"]
        sd[src + "norm1.bias"] = blk["norm1"]["bias"]
        sd[src + "norm2.weight"] = blk["norm2"]["scale"]
        sd[src + "norm2.bias"] = blk["norm2"]["bias"]
        sd[src + "attn.qkv.weight"] = inv_dense(blk["attn"]["qkv"]["kernel"])
        sd[src + "attn.qkv.bias"] = blk["attn"]["qkv"]["bias"]
        sd[src + "attn.proj.weight"] = inv_dense(blk["attn"]["proj"]["kernel"])
        sd[src + "attn.proj.bias"] = blk["attn"]["proj"]["bias"]
        sd[src + "mlp.fc1.weight"] = inv_dense(blk["mlp"]["fc1"]["kernel"])
        sd[src + "mlp.fc1.bias"] = blk["mlp"]["fc1"]["bias"]
        sd[src + "mlp.fc2.weight"] = inv_dense(blk["mlp"]["fc2"]["kernel"])
        sd[src + "mlp.fc2.bias"] = blk["mlp"]["fc2"]["bias"]

    conv = W.convert_dino_vits8(sd, feature_layer=2,
                                target_grid=int(
                                    (params["pos_embed"].shape[1] - 1) ** 0.5))
    tree_equal(conv, params)


def test_pos_embed_resize():
    c = 8
    g = 4
    pos = np.random.RandomState(0).rand(1, 1 + g * g, c).astype(np.float32)
    sd = {
        "patch_embed.proj.weight": np.zeros((c, 3, 8, 8), np.float32),
        "patch_embed.proj.bias": np.zeros((c,), np.float32),
        "cls_token": np.zeros((1, 1, c), np.float32),
        "pos_embed": pos,
    }
    out = W.convert_dino_vits8(sd, feature_layer=-1, target_grid=8)
    assert out["pos_embed"].shape == (1, 65, c)
    np.testing.assert_allclose(out["pos_embed"][0, 0], pos[0, 0])
