"""Numerical forward parity against torch-computed references.

The roundtrip tests (test_weight_convert.py) pin the converter's
names/transposes; these tests pin SEMANTICS: each network is rebuilt in
plain torch with the reference's architecture (resnet18 per torchvision,
pose head per pose_predictor.py:36-88, CondNeRF deformer per
shape_predictor.py:13-44 + nerf/models.py:398-407, PointNet per
mesh_encoder.py:6-40, ViT block per zsp vision_transformer_flexible.py),
run on the SAME weights, and compared to our flax modules — catching any
layout, padding, activation or eval-mode regression the converter alone
cannot.

test_load_reference_ckpt_forward additionally exercises the full
pred_net_*.pth import path end-to-end: a reference-format checkpoint is
synthesized (torch.save), loaded via load_reference_ckpt, and forward_test
must reproduce the donor state's outputs exactly.

To run against a real released checkpoint (downloads are unavailable in
this sandbox):
  python predict.py --flagfile config/wild6d/laptop.txt --test \
      --model_path /path/to/pred_net_20000.pth --eval --eval_nocs \
      --test_dataset_path /path/to/Wild6D/test_set/laptop
"""
import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from selfcorr_tpu.utils import weight_convert as W

ATOL = 2e-4


def t2n(x):
    return x.detach().numpy()


def randomize_bn(m, rng):
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            mod.running_mean.copy_(torch.tensor(
                rng.randn(mod.num_features).astype(np.float32) * 0.1))
            mod.running_var.copy_(torch.tensor(
                rng.rand(mod.num_features).astype(np.float32) + 0.5))
            mod.weight.copy_(torch.tensor(
                rng.randn(mod.num_features).astype(np.float32) * 0.2 + 1.0))
            mod.bias.copy_(torch.tensor(
                rng.randn(mod.num_features).astype(np.float32) * 0.1))


# ---------------------------------------------------------------------------
# ResNet18 backbone
# ---------------------------------------------------------------------------

class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tF.relu(y + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(chans):
            setattr(self, f"layer{i + 1}", tnn.Sequential(
                TorchBasicBlock(cin, cout, s), TorchBasicBlock(cout, cout, 1)))

    def forward(self, x):
        y = tF.max_pool2d(tF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        feats = []
        for i in range(4):
            y = getattr(self, f"layer{i + 1}")(y)
            feats.append(y)
        return feats


def test_resnet18_forward_matches_torch():
    from selfcorr_tpu.models.resnet import ResNet18
    rng = np.random.RandomState(0)
    tm = TorchResNet18().eval()
    with torch.no_grad():
        randomize_bn(tm, rng)
    sd = {"resnet." + k: t2n(v) for k, v in tm.state_dict().items()}
    params, stats = W.convert_resnet18(sd)

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        gold = tm(torch.tensor(x))
    ours = ResNet18().apply({"params": params, "batch_stats": stats},
                            np.transpose(x, (0, 2, 3, 1)), False)
    for i, (g, o) in enumerate(zip(gold, ours)):
        np.testing.assert_allclose(np.transpose(t2n(g), (0, 2, 3, 1)),
                                   np.asarray(o), atol=ATOL,
                                   err_msg=f"conv{i + 2}")


# ---------------------------------------------------------------------------
# Pose predictor head
# ---------------------------------------------------------------------------

def test_pose_predictor_matches_torch():
    from selfcorr_tpu.models.heads import PosePredictor
    rng = np.random.RandomState(1)
    offset = (0.2, 0.0, 0.0, 0.0, -0.2, 0.2)
    fcs = [tnn.Linear(512, 128), tnn.Linear(128, 128), tnn.Linear(128, 128)]
    rot_out = tnn.Linear(128, 6)
    trans = tnn.Linear(512, 3)

    feat = rng.randn(4, 512).astype(np.float32)
    with torch.no_grad():
        y = torch.tensor(feat)
        for fc in fcs:
            y = tF.leaky_relu(fc(y), 0.1)
        rot6 = rot_out(y)
        xv = rot6[:, :3] + torch.tensor([offset[:3]])
        yv = rot6[:, 3:] + torch.tensor([offset[3:]])
        xv = tF.normalize(xv)
        zv = tF.normalize(torch.cross(xv, yv, dim=1))
        yv = tF.normalize(torch.cross(zv, xv, dim=1))
        R_gold = torch.stack((xv, yv, zv), 2)
        t_gold = trans(torch.tensor(feat))
        t_gold = torch.cat([t_gold[:, :2] * 0.1, t_gold[:, 2:] + 5.0], 1)

    params = {}
    for i, fc in enumerate(fcs):
        params[f"rot_fc{i}"] = {"kernel": W.dense_t(t2n(fc.weight)),
                                "bias": t2n(fc.bias)}
    params["rot_out"] = {"kernel": W.dense_t(t2n(rot_out.weight)),
                         "bias": t2n(rot_out.bias)}
    params["trans"] = {"kernel": W.dense_t(t2n(trans.weight)),
                       "bias": t2n(trans.bias)}
    R, t, s = PosePredictor(rotation_offset=offset, depth_offset=5.0).apply(
        {"params": params}, feat)
    np.testing.assert_allclose(np.asarray(R), t2n(R_gold), atol=ATOL)
    np.testing.assert_allclose(np.asarray(t), t2n(t_gold), atol=ATOL)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=0)


# ---------------------------------------------------------------------------
# CondNeRF shape deformer
# ---------------------------------------------------------------------------

def test_shape_deformer_matches_torch():
    from selfcorr_tpu.models.heads import ShapeDeformer
    rng = np.random.RandomState(2)
    code_dim, hidden = 8, 256
    l1 = tnn.Linear(3 + code_dim, hidden)
    lx = tnn.Linear(hidden, hidden)
    lf = tnn.Linear(hidden, hidden)
    ld = tnn.Linear(hidden, hidden // 2)
    lo = tnn.Linear(hidden // 2, 3)

    mean_v = rng.randn(2, 42, 3).astype(np.float32)
    code = rng.randn(2, code_dim).astype(np.float32)
    with torch.no_grad():
        x = torch.cat([torch.tensor(mean_v),
                       torch.tensor(code)[:, None, :].expand(-1, 42, -1)], -1)
        # NB no activation after layer1 (nerf/models.py:398-407 quirk)
        x = l1(x)
        x = tF.relu(lx(x))
        feat = tF.relu(lf(x))
        y = tF.relu(ld(feat))
        d = lo(y)
        d = d - d.mean(1, keepdim=True)
        gold = torch.tensor(mean_v) + d * 0.5

    params = {
        "layer1": {"kernel": W.dense_t(t2n(l1.weight)), "bias": t2n(l1.bias)},
        "layer_xyz0": {"kernel": W.dense_t(t2n(lx.weight)),
                       "bias": t2n(lx.bias)},
        "fc_feat": {"kernel": W.dense_t(t2n(lf.weight)), "bias": t2n(lf.bias)},
        "layer_dir0": {"kernel": W.dense_t(t2n(ld.weight)),
                       "bias": t2n(ld.bias)},
        "fc_rgb": {"kernel": W.dense_t(t2n(lo.weight)), "bias": t2n(lo.bias)},
    }
    out = ShapeDeformer(code_dim=code_dim, deform_ratio=0.5).apply(
        {"params": params}, mean_v, code)
    np.testing.assert_allclose(np.asarray(out), t2n(gold), atol=ATOL)


# ---------------------------------------------------------------------------
# PointNet mesh encoder
# ---------------------------------------------------------------------------

def test_mesh_encoder_matches_torch():
    from selfcorr_tpu.models.pointnet import MeshEncoder
    rng = np.random.RandomState(3)
    n_feat = 16
    stn_c = tnn.Linear(3, 128)
    stn_f = tnn.Linear(128, 9)
    conv1 = tnn.Linear(3, n_feat)

    pts = rng.randn(2, 42, 3).astype(np.float32)
    with torch.no_grad():
        y = tF.relu(stn_c(torch.tensor(pts)))        # (B, N, 128)
        y = y.max(dim=1).values                      # (B, 128)
        m = stn_f(y) + torch.eye(3).reshape(9)
        m = m.reshape(-1, 3, 3)
        aligned = torch.bmm(torch.tensor(pts), m)
        gold = tF.relu(conv1(aligned))

    params = {
        "stn": {"conv1": {"kernel": W.dense_t(t2n(stn_c.weight)),
                          "bias": t2n(stn_c.bias)},
                "fc": {"kernel": W.dense_t(t2n(stn_f.weight)),
                       "bias": t2n(stn_f.bias)}},
        "conv1": {"kernel": W.dense_t(t2n(conv1.weight)),
                  "bias": t2n(conv1.bias)},
    }
    out = MeshEncoder(n_feat).apply({"params": params}, pts)
    np.testing.assert_allclose(np.asarray(out), t2n(gold), atol=ATOL)


# ---------------------------------------------------------------------------
# DINO ViT block (attention + MLP + keys extraction)
# ---------------------------------------------------------------------------

def test_vit_block_matches_torch():
    from selfcorr_tpu.models.vit import Block
    rng = np.random.RandomState(4)
    dim, heads, t = 32, 4, 9
    hd = dim // heads
    norm1 = tnn.LayerNorm(dim, eps=1e-6)
    norm2 = tnn.LayerNorm(dim, eps=1e-6)
    qkv = tnn.Linear(dim, dim * 3)
    proj = tnn.Linear(dim, dim)
    fc1 = tnn.Linear(dim, dim * 4)
    fc2 = tnn.Linear(dim * 4, dim)
    with torch.no_grad():
        for m in (norm1, norm2):
            m.weight.copy_(torch.tensor(
                rng.randn(dim).astype(np.float32) * 0.2 + 1.0))
            m.bias.copy_(torch.tensor(
                rng.randn(dim).astype(np.float32) * 0.1))

    x = rng.randn(2, t, dim).astype(np.float32)
    with torch.no_grad():
        h = norm1(torch.tensor(x))
        q3 = qkv(h).reshape(2, t, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = q3[0], q3[1], q3[2]                # (b, h, t, d)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        a = (attn.softmax(-1) @ v)                   # (b, h, t, d)
        a = a.transpose(1, 2).reshape(2, t, dim)
        y = torch.tensor(x) + proj(a)
        gold = y + fc2(tF.gelu(norm2(y) @ fc1.weight.T + fc1.bias))

    params = {
        "norm1": {"scale": t2n(norm1.weight), "bias": t2n(norm1.bias)},
        "norm2": {"scale": t2n(norm2.weight), "bias": t2n(norm2.bias)},
        "attn": {"qkv": {"kernel": W.dense_t(t2n(qkv.weight)),
                         "bias": t2n(qkv.bias)},
                 "proj": {"kernel": W.dense_t(t2n(proj.weight)),
                          "bias": t2n(proj.bias)}},
        "mlp": {"fc1": {"kernel": W.dense_t(t2n(fc1.weight)),
                        "bias": t2n(fc1.bias)},
                "fc2": {"kernel": W.dense_t(t2n(fc2.weight)),
                        "bias": t2n(fc2.bias)}},
    }
    out, k_ours = Block(dim, heads).apply({"params": params}, x,
                                          return_k=True)
    np.testing.assert_allclose(np.asarray(out), t2n(gold), atol=ATOL)
    np.testing.assert_allclose(np.asarray(k_ours), t2n(k), atol=ATOL)


# ---------------------------------------------------------------------------
# Full pred_net_*.pth import -> forward_test equivalence
# ---------------------------------------------------------------------------

def _inv_bn(sd, prefix, p, s):
    sd[prefix + ".weight"] = p["scale"]
    sd[prefix + ".bias"] = p["bias"]
    sd[prefix + ".running_mean"] = s["mean"]
    sd[prefix + ".running_var"] = s["var"]


def _inv_conv(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _inv_dense(k):
    return np.transpose(np.asarray(k), (1, 0))


def _inv_linear(sd, key, p):
    sd[key + ".weight"] = _inv_dense(p["kernel"])
    sd[key + ".bias"] = np.asarray(p["bias"])


def make_reference_sd(params, stats, mean_v):
    """Inverse of weight_convert.convert_meshnet: our param trees -> a
    reference-format pred_net state dict (trainer.py:200-206 layout)."""
    sd = {"mesh.mean_v": np.asarray(mean_v)}

    bb, bs = params["backbone"], stats["backbone"]
    pre = "encoder.backbone.resnet."
    sd[pre + "conv1.weight"] = _inv_conv(bb["conv1"]["kernel"])
    _inv_bn(sd, pre + "bn1", bb["BatchNorm_0"], bs["BatchNorm_0"])
    for layer in range(1, 5):
        for blk in range(2):
            name = f"layer{layer}_{blk}"
            src = f"{pre}layer{layer}.{blk}."
            p, s = bb[name], bs[name]
            sd[src + "conv1.weight"] = _inv_conv(p["Conv_0"]["kernel"])
            _inv_bn(sd, src + "bn1", p["BatchNorm_0"], s["BatchNorm_0"])
            sd[src + "conv2.weight"] = _inv_conv(p["Conv_1"]["kernel"])
            _inv_bn(sd, src + "bn2", p["BatchNorm_1"], s["BatchNorm_1"])
            if "downsample_conv" in p:
                sd[src + "downsample.0.weight"] = _inv_conv(
                    p["downsample_conv"]["kernel"])
                _inv_bn(sd, src + "downsample.1", p["BatchNorm_2"],
                        s["BatchNorm_2"])

    fp, fs = params["featnet"], stats["featnet"]
    for name in ("upconv5", "iconv4", "upconv4", "iconv3", "upconv3",
                 "iconv2"):
        src = f"encoder.featnet.{name}.cbr_unit."
        sd[src + "0.weight"] = _inv_conv(fp[name]["Conv_0"]["kernel"])
        if "bias" in fp[name]["Conv_0"]:
            sd[src + "0.bias"] = np.asarray(fp[name]["Conv_0"]["bias"])
        _inv_bn(sd, src + "1", fp[name]["BatchNorm_0"],
                fs[name]["BatchNorm_0"])
    sd["encoder.featnet.proj.weight"] = _inv_conv(fp["proj"]["kernel"])
    sd["encoder.featnet.proj.bias"] = np.asarray(fp["proj"]["bias"])

    fm = params["featnet_mesh"]
    sd["encoder.featnet_mesh.stn.conv1.weight"] = _inv_dense(
        fm["stn"]["conv1"]["kernel"])[:, :, None]
    sd["encoder.featnet_mesh.stn.conv1.bias"] = np.asarray(
        fm["stn"]["conv1"]["bias"])
    _inv_linear(sd, "encoder.featnet_mesh.stn.fc", fm["stn"]["fc"])
    sd["encoder.featnet_mesh.conv1.weight"] = _inv_dense(
        fm["conv1"]["kernel"])[:, :, None]
    sd["encoder.featnet_mesh.conv1.bias"] = np.asarray(fm["conv1"]["bias"])

    _inv_linear(sd, "encoder.shape_code_predictor",
                params["shape_code_predictor"])

    sp = params["shape_predictor"]
    _inv_linear(sd, "encoder.shape_predictor.shapenerf.layer1", sp["layer1"])
    _inv_linear(sd, "encoder.shape_predictor.shapenerf.layers_xyz.0",
                sp["layer_xyz0"])
    _inv_linear(sd, "encoder.shape_predictor.shapenerf.fc_feat", sp["fc_feat"])
    _inv_linear(sd, "encoder.shape_predictor.shapenerf.layers_dir.0",
                sp["layer_dir0"])
    _inv_linear(sd, "encoder.shape_predictor.shapenerf.fc_rgb", sp["fc_rgb"])

    pp = params["pose_predictor"]
    for i in range(3):
        _inv_linear(sd, f"encoder.pose_predictor.rot_pred_layer.0.{i}.0",
                    pp[f"rot_fc{i}"])
    _inv_linear(sd, "encoder.pose_predictor.rot_pred_layer.1", pp["rot_out"])
    _inv_linear(sd, "encoder.pose_predictor.trans_pred_layer", pp["trans"])
    return sd


def test_load_reference_ckpt_forward(tmp_path):
    from selfcorr_tpu.models.meshnet import build_mesh_constants, forward_test
    from selfcorr_tpu.train.step import init_state
    from selfcorr_tpu.utils.weight_convert import load_reference_ckpt
    from tests.test_train_step import tiny_cfg, synthetic_batch

    cfg = tiny_cfg()
    constants = build_mesh_constants(cfg)
    # donor state (what the "checkpoint" holds) and a differently-seeded
    # receiver; after import the receiver must reproduce the donor exactly
    donor = init_state(cfg, constants, jax.random.PRNGKey(7))
    # perturb mean_v too (both inits share the deterministic icosphere)
    mv = np.asarray(donor.params["mean_v"])
    mv = mv + np.random.RandomState(5).randn(*mv.shape).astype(mv.dtype) * 0.02
    donor = donor._replace(params={**donor.params, "mean_v": mv})
    receiver = init_state(cfg, constants, jax.random.PRNGKey(8))
    receiver = receiver._replace(dino_params=donor.dino_params)

    donor_np = jax.tree_util.tree_map(np.asarray, donor.params)
    stats_np = jax.tree_util.tree_map(np.asarray, donor.batch_stats)
    sd = make_reference_sd(donor_np["net"], stats_np, donor_np["mean_v"])
    path = tmp_path / "pred_net_20000.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(path))

    loaded = load_reference_ckpt(str(path), receiver)
    cfg_t = cfg.replace(train=False)
    batch = synthetic_batch(cfg_t)
    rng = jax.random.PRNGKey(3)
    out_donor = forward_test(donor.params, donor.batch_stats, batch,
                             constants, rng, cfg_t)
    out_loaded = forward_test(loaded.params, loaded.batch_stats, batch,
                              constants, rng, cfg_t)
    for k in out_donor:
        np.testing.assert_allclose(np.asarray(out_loaded[k]),
                                   np.asarray(out_donor[k]), atol=1e-5,
                                   err_msg=k)
    # and the receiver was genuinely different before the import
    assert not np.allclose(np.asarray(receiver.params["mean_v"]),
                           np.asarray(loaded.params["mean_v"]))


# ---------------------------------------------------------------------------
# Pretrained bootstrap: resnet/DINO torch checkpoints -> training init
# ---------------------------------------------------------------------------

def _make_dino_sd(rng, g=7, dim=384, n_blocks=10):
    """Synthesized released-DINO-format ViT-S/8 state dict (the real
    dino_deitsmall8_pretrain.pth layout, dino.py:40-44), checkpoint pos grid
    g x g so the import must resize it."""
    sd = {
        "patch_embed.proj.weight": rng.randn(dim, 3, 8, 8).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": rng.randn(dim).astype(np.float32) * 0.02,
        "cls_token": rng.randn(1, 1, dim).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, 1 + g * g, dim).astype(np.float32) * 0.02,
    }
    for i in range(n_blocks):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = np.ones(dim, np.float32)
        sd[p + "norm1.bias"] = np.zeros(dim, np.float32)
        sd[p + "norm2.weight"] = np.ones(dim, np.float32)
        sd[p + "norm2.bias"] = np.zeros(dim, np.float32)
        sd[p + "attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32) * 0.02
        sd[p + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[p + "attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32) * 0.02
        sd[p + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[p + "mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32) * 0.02
        sd[p + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[p + "mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32) * 0.02
        sd[p + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
    return sd


def test_pretrained_bootstrap_init(tmp_path):
    """--resnet_init_path/--dino_init_path wire released torch checkpoints
    into a FRESH training init (reference: image_encoder.py:121 always
    resnet18(pretrained=True); dino.py:29,40-44 always loads
    pretrain/dino_deitsmall8_pretrain.pth). End-to-end: synthesized
    torchvision/DINO-format .pth files -> init_state -> one finite train
    step from the bootstrapped weights."""
    from selfcorr_tpu.models.meshnet import build_mesh_constants
    from selfcorr_tpu.train.optim import make_optimizer
    from selfcorr_tpu.train.step import init_state, make_train_step
    from tests.test_train_step import tiny_cfg, synthetic_batch

    rng = np.random.RandomState(0)
    # torchvision-format resnet18 (keys WITHOUT a prefix, plus the fc head
    # the converter must ignore)
    tm = TorchResNet18().eval()
    with torch.no_grad():
        randomize_bn(tm, rng)
    rsd = {k: v for k, v in tm.state_dict().items()}
    rsd["fc.weight"] = torch.zeros(1000, 512)
    rsd["fc.bias"] = torch.zeros(1000)
    resnet_path = tmp_path / "resnet18-imagenet.pth"
    torch.save(rsd, str(resnet_path))

    dsd = _make_dino_sd(rng)
    dino_path = tmp_path / "dino_deitsmall8_pretrain.pth"
    torch.save({k: torch.tensor(v) for k, v in dsd.items()}, str(dino_path))

    cfg = tiny_cfg(resnet_init_path=str(resnet_path),
                   dino_init_path=str(dino_path))
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    rand_state = init_state(cfg.replace(resnet_init_path="",
                                        dino_init_path=""),
                            constants, jax.random.PRNGKey(0))

    # backbone took the checkpoint values (layout-converted)
    np.testing.assert_allclose(
        np.asarray(state.params["net"]["backbone"]["conv1"]["kernel"]),
        W.conv_t(t2n(rsd["conv1.weight"])), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["backbone"]["layer3_0"]["BatchNorm_0"]["mean"]),
        t2n(rsd["layer3.0.bn1.running_mean"]), atol=1e-6)
    # DINO trunk took the checkpoint values; pos embed resized to the
    # img_size//8 grid (tiny cfg: 32//8=4 -> (1, 17, 384))
    np.testing.assert_allclose(
        np.asarray(state.dino_params["block9"]["attn"]["qkv"]["kernel"]),
        W.dense_t(dsd["blocks.9.attn.qkv.weight"]), atol=1e-6)
    assert state.dino_params["pos_embed"].shape == \
        rand_state.dino_params["pos_embed"].shape
    # non-backbone modules keep their (seeded) random init
    np.testing.assert_allclose(
        np.asarray(state.params["net"]["pose_predictor"]["trans"]["kernel"]),
        np.asarray(rand_state.params["net"]["pose_predictor"]["trans"]["kernel"]))
    # tree structures identical -> flax apply / optimizer stay valid
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(rand_state.params))
    assert (jax.tree_util.tree_structure(state.dino_params)
            == jax.tree_util.tree_structure(rand_state.dino_params))

    # one finite train step FROM the bootstrapped init
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=False)
    new_state, metrics = step_fn(state, synthetic_batch(cfg),
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["bad_grad"]) == 0.0
    # the pretrained backbone actually trains (gradients flow into it)
    assert not np.allclose(
        np.asarray(new_state.params["net"]["backbone"]["conv1"]["kernel"]),
        np.asarray(state.params["net"]["backbone"]["conv1"]["kernel"]))
