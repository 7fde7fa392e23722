"""PyTorch checkpoint -> flax parameter conversion.

Imports (a) reference MeshNet training checkpoints (pred_net_*.pth,
trainer.py:200-206) for inference-parity evaluation, (b) torchvision
resnet18 ImageNet weights for the backbone (image_encoder.py:121), and
(c) released DINO ViT-S/8 weights (dino_deitsmall8_pretrain.pth, dino.py:29).

Layout rules:
  torch Conv2d (O, I, kh, kw)  -> flax Conv kernel (kh, kw, I, O)
  torch Linear (O, I)          -> flax Dense kernel (I, O)
  torch Conv1d k=1 (O, I, 1)   -> flax Dense kernel (I, O)
  BatchNorm weight/bias        -> scale/bias; running stats -> batch_stats.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x):
    return np.asarray(x, np.float32)


def conv_t(w):
    return _t(w).transpose(2, 3, 1, 0)


def dense_t(w):
    return _t(w).transpose(1, 0)


def conv1d_t(w):
    return _t(w)[:, :, 0].transpose(1, 0)


def _bn(sd, prefix):
    return (
        {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])},
        {"mean": _t(sd[f"{prefix}.running_mean"]),
         "var": _t(sd[f"{prefix}.running_var"])},
    )


def convert_resnet18(sd: Dict[str, Any], prefix: str = "resnet."):
    """torchvision resnet18 state dict -> (params, batch_stats) trees matching
    models/resnet.ResNet18."""
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": conv_t(sd[prefix + "conv1.weight"])}
    bnp, bns = _bn(sd, prefix + "bn1")
    params["BatchNorm_0"] = bnp
    stats["BatchNorm_0"] = bns

    for layer in range(1, 5):
        for blk in range(2):
            src = f"{prefix}layer{layer}.{blk}."
            name = f"layer{layer}_{blk}"
            p: dict = {}
            s: dict = {}
            p["Conv_0"] = {"kernel": conv_t(sd[src + "conv1.weight"])}
            p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, src + "bn1")
            p["Conv_1"] = {"kernel": conv_t(sd[src + "conv2.weight"])}
            p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, src + "bn2")
            if src + "downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": conv_t(sd[src + "downsample.0.weight"])}
                p["BatchNorm_2"], s["BatchNorm_2"] = _bn(
                    sd, src + "downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats


def convert_dino_vits8(sd: Dict[str, Any], feature_layer: int = 9,
                       target_grid: int = 32):
    """DINO ViT-S/8 state dict -> params for models/vit.DinoViTS8 (trunk
    truncated after `feature_layer`). Position embeddings are bicubic-resized
    from the checkpoint grid to `target_grid` via torch F.interpolate, the
    reference's own resize (zsp vision_transformer_flexible.py:192-213;
    cv2.resize caps at 4 channels in OpenCV 5 so it cannot resize the
    (g, g, 384) grid)."""
    import torch
    import torch.nn.functional as tF

    params: dict = {}
    params["patch_embed"] = {
        "kernel": conv_t(sd["patch_embed.proj.weight"]),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = _t(sd["cls_token"])
    pos = _t(sd["pos_embed"])  # (1, 1+g*g, C)
    g = int(round((pos.shape[1] - 1) ** 0.5))
    if g != target_grid:
        grid = torch.tensor(pos[0, 1:].reshape(g, g, -1)).permute(2, 0, 1)
        grid = tF.interpolate(grid[None], size=(target_grid, target_grid),
                              mode="bicubic")[0]
        grid = grid.permute(1, 2, 0).numpy()
        pos = np.concatenate(
            [pos[:, :1], grid.reshape(1, target_grid * target_grid, -1)], 1)
    params["pos_embed"] = pos

    for i in range(feature_layer + 1):
        src = f"blocks.{i}."
        blk = {
            "norm1": {"scale": _t(sd[src + "norm1.weight"]),
                      "bias": _t(sd[src + "norm1.bias"])},
            "norm2": {"scale": _t(sd[src + "norm2.weight"]),
                      "bias": _t(sd[src + "norm2.bias"])},
            "attn": {
                "qkv": {"kernel": dense_t(sd[src + "attn.qkv.weight"]),
                        "bias": _t(sd[src + "attn.qkv.bias"])},
                "proj": {"kernel": dense_t(sd[src + "attn.proj.weight"]),
                         "bias": _t(sd[src + "attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": dense_t(sd[src + "mlp.fc1.weight"]),
                        "bias": _t(sd[src + "mlp.fc1.bias"])},
                "fc2": {"kernel": dense_t(sd[src + "mlp.fc2.weight"]),
                        "bias": _t(sd[src + "mlp.fc2.bias"])},
            },
        }
        params[f"block{i}"] = blk
    return params


def _fc_stack(sd, prefix, n):
    out = {}
    for i in range(n):
        out[f"rot_fc{i}"] = {
            "kernel": dense_t(sd[f"{prefix}.{i}.0.weight"]),
            "bias": _t(sd[f"{prefix}.{i}.0.bias"])}
    return out


def convert_meshnet(sd: Dict[str, Any]):
    """Reference MeshNet state dict (pred_net_*.pth) -> (params tree pieces,
    batch_stats pieces, mean_v).

    Covers: mesh.mean_v, encoder.backbone (resnet18), encoder.featnet (FPN
    decoder), encoder.featnet_mesh (PointNet), encoder.shape_code_predictor,
    encoder.shape_predictor (CondNeRF), encoder.pose_predictor.
    """
    params: dict = {}
    stats: dict = {}

    mean_v = _t(sd["mesh.mean_v"])

    bb_p, bb_s = convert_resnet18(sd, prefix="encoder.backbone.resnet.")
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    # FPN decoder: upconv5/iconv4/upconv4/iconv3/upconv3/iconv2 are
    # conv2DBatchNormRelu(seq cbr_unit: 0 conv, 1 bn), proj is a 1x1 conv
    fp: dict = {}
    fs: dict = {}
    for name in ("upconv5", "iconv4", "upconv4", "iconv3", "upconv3",
                 "iconv2"):
        src = f"encoder.featnet.{name}.cbr_unit."
        fp[name] = {
            "Conv_0": {"kernel": conv_t(sd[src + "0.weight"])},
        }
        bnp, bns = _bn(sd, src + "1")
        fp[name]["BatchNorm_0"] = bnp
        fs[name] = {"BatchNorm_0": bns}
        if src + "0.bias" in sd:
            fp[name]["Conv_0"]["bias"] = _t(sd[src + "0.bias"])
    fp["proj"] = {"kernel": conv_t(sd["encoder.featnet.proj.weight"]),
                  "bias": _t(sd["encoder.featnet.proj.bias"])}
    params["featnet"] = fp
    stats["featnet"] = fs

    params["featnet_mesh"] = {
        "stn": {
            "conv1": {"kernel": conv1d_t(sd["encoder.featnet_mesh.stn.conv1.weight"]),
                      "bias": _t(sd["encoder.featnet_mesh.stn.conv1.bias"])},
            "fc": {"kernel": dense_t(sd["encoder.featnet_mesh.stn.fc.weight"]),
                   "bias": _t(sd["encoder.featnet_mesh.stn.fc.bias"])},
        },
        "conv1": {"kernel": conv1d_t(sd["encoder.featnet_mesh.conv1.weight"]),
                  "bias": _t(sd["encoder.featnet_mesh.conv1.bias"])},
    }

    params["shape_code_predictor"] = {
        "kernel": dense_t(sd["encoder.shape_code_predictor.weight"]),
        "bias": _t(sd["encoder.shape_code_predictor.bias"])}

    sp = "encoder.shape_predictor.shapenerf."
    params["shape_predictor"] = {
        "layer1": {"kernel": dense_t(sd[sp + "layer1.weight"]),
                   "bias": _t(sd[sp + "layer1.bias"])},
        "layer_xyz0": {"kernel": dense_t(sd[sp + "layers_xyz.0.weight"]),
                       "bias": _t(sd[sp + "layers_xyz.0.bias"])},
        "fc_feat": {"kernel": dense_t(sd[sp + "fc_feat.weight"]),
                    "bias": _t(sd[sp + "fc_feat.bias"])},
        "layer_dir0": {"kernel": dense_t(sd[sp + "layers_dir.0.weight"]),
                       "bias": _t(sd[sp + "layers_dir.0.bias"])},
        "fc_rgb": {"kernel": dense_t(sd[sp + "fc_rgb.weight"]),
                   "bias": _t(sd[sp + "fc_rgb.bias"])},
    }

    pp = "encoder.pose_predictor."
    pose = {}
    for i in range(3):
        pose[f"rot_fc{i}"] = {
            "kernel": dense_t(sd[pp + f"rot_pred_layer.0.{i}.0.weight"]),
            "bias": _t(sd[pp + f"rot_pred_layer.0.{i}.0.bias"])}
    pose["rot_out"] = {"kernel": dense_t(sd[pp + "rot_pred_layer.1.weight"]),
                       "bias": _t(sd[pp + "rot_pred_layer.1.bias"])}
    pose["trans"] = {"kernel": dense_t(sd[pp + "trans_pred_layer.weight"]),
                     "bias": _t(sd[pp + "trans_pred_layer.bias"])}
    if pp + "scale_pred_layer.weight" in sd:
        pose["scale"] = {"kernel": dense_t(sd[pp + "scale_pred_layer.weight"]),
                         "bias": _t(sd[pp + "scale_pred_layer.bias"])}
    params["pose_predictor"] = pose

    return params, stats, mean_v


def _load_torch_sd(path: str) -> Dict[str, Any]:
    """torch.load a checkpoint -> {key: np.ndarray}; unwraps the common
    {'state_dict': ...} / {'model': ...} / {'teacher': ...} containers and
    strips 'module.' DDP prefixes."""
    import torch

    sd = torch.load(path, map_location="cpu")
    for key in ("state_dict", "model", "teacher"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            k = k[len("module."):] if k.startswith("module.") else k
            out[k] = v.numpy()
    return out


def load_pretrained_init(cfg, state):
    """Bootstrap a fresh TrainState from released torch checkpoints — the
    reference ALWAYS trains from these (image_encoder.py:121
    `resnet18(pretrained=True)`; dino.py:29,40-44
    `pretrain/dino_deitsmall8_pretrain.pth` loaded at DINO().__init__):

      cfg.resnet_init_path: torchvision resnet18 ImageNet state dict ->
          params['net']['backbone'] + batch_stats['backbone'].
      cfg.dino_init_path: released DINO ViT-S/8 state dict ->
          state.dino_params (frozen trunk; pos embeddings resized to the
          cfg.img_size//8 grid).

    Missing/empty paths leave the corresponding module at its random init.
    """
    params = dict(state.params)
    new_net = dict(params["net"])
    new_stats = dict(state.batch_stats)
    dino_params = state.dino_params

    if getattr(cfg, "resnet_init_path", ""):
        sd = _load_torch_sd(cfg.resnet_init_path)
        # torchvision sd keys have no prefix; reference MeshNet checkpoints
        # nest them under encoder.backbone.resnet.
        prefix = "" if "conv1.weight" in sd else "encoder.backbone.resnet."
        bb_p, bb_s = convert_resnet18(sd, prefix=prefix)
        merged_bb = dict(new_net["backbone"])
        _merge(merged_bb, bb_p)
        new_net["backbone"] = merged_bb
        merged_bs = dict(new_stats["backbone"])
        _merge(merged_bs, bb_s)
        new_stats["backbone"] = merged_bs

    if getattr(cfg, "dino_init_path", ""):
        sd = _load_torch_sd(cfg.dino_init_path)
        dino_params = convert_dino_vits8(
            sd, target_grid=cfg.img_size // 8)

    params["net"] = new_net
    return state._replace(params=params, batch_stats=new_stats,
                          dino_params=dino_params)


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def load_reference_ckpt(path: str, state):
    """Load a reference pred_net_*.pth into a TrainState (strict on shapes,
    lenient on missing keys like the reference's strict=False load,
    model.py:313-328)."""
    import torch

    sd = {k: v.numpy() for k, v in torch.load(
        path, map_location="cpu").items()}
    params, stats, mean_v = convert_meshnet(sd)
    import flax
    new_net = flax.core.unfreeze(state.params["net"]) \
        if hasattr(flax.core, "unfreeze") else dict(state.params["net"])
    _merge(new_net, params)
    new_stats = dict(state.batch_stats)
    _merge(new_stats, stats)
    new_params = dict(state.params)
    new_params["net"] = new_net
    new_params["mean_v"] = mean_v
    return state._replace(params=new_params, batch_stats=new_stats)


def load_warm_start(cfg, state):
    """Encoder transfer from a previous run's orbax checkpoint
    (cfg.warm_start_path): copies params['net']['backbone'] +
    params['net']['featnet'] + the backbone/featnet batch_stats into a
    fresh TrainState, leaving heads/optimizer/mean_v at init.

    The in-sandbox analog of the reference's pretrained-encoder recipe
    (image_encoder.py:121 resnet18(pretrained=True)): no ImageNet download
    exists here, so 'pretrained' features come from a prior synthetic run
    on a DIFFERENT instance family (see scripts/validate_synthetic.py
    --warm_start_path). Only the copied encoder subtrees must match shapes
    (same n_corr_feat); the rest of the checkpoint — including a
    different-resolution DINO pos-embedding — is restored as stored and
    ignored (checkpoint.restore_raw).
    """
    from selfcorr_tpu.utils import checkpoint as ckpt
    src = ckpt.restore_raw(cfg.warm_start_path)
    params = dict(state.params)
    new_net = dict(params["net"])
    new_stats = dict(state.batch_stats)
    for mod in ("backbone", "featnet"):
        new_net[mod] = src["params"]["net"][mod]
        if mod in src["batch_stats"]:
            new_stats[mod] = src["batch_stats"][mod]
    params["net"] = new_net
    return state._replace(params=params, batch_stats=new_stats)
