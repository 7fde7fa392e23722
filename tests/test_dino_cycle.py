"""Pin the factored DINO cycle-loss transport against the dense reference
transcription (pretrained_corr.py:107-140).

`dino_cycle_loss` never materializes the (B, P, Q) corr matrix or the
half-res tgt volume; `dino_cycle_loss_dense` is the literal transcription.
They must agree in value AND in gradients wrt the model's image/mesh
features (the only differentiable inputs — DINO feats are frozen and only
reach the loss through argmax indices).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfcorr_tpu.models import correspondence as corr
from selfcorr_tpu.ops.image_ops import resize_nearest


HF = WF = 8          # model feature res
H = W = 16           # full image res
N = 13               # mesh vertices
CM = 5               # model feature dim
CD = 6               # frozen DINO feature dim
K = 3
B = 2                # pairs per side
TAU_I, TAU_M = 10.0, 15.0


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    feats = tuple(jnp.asarray(rng.randn(B, (HF // 2) * (WF // 2), CD)
                              .astype(np.float32)) for _ in range(2))
    # blobby masks with both on and off pixels on every frame
    masks = []
    for _ in range(2):
        m = np.zeros((B, H, W), np.float32)
        for b in range(B):
            y0, x0 = rng.randint(0, 6, 2)
            m[b, y0:y0 + 9, x0:x0 + 9] = 1.0
        masks.append(jnp.asarray(m))
    dws = tuple(jnp.asarray(rng.rand(B, N).astype(np.float32))
                for _ in range(2))
    ifs = tuple(jnp.asarray(rng.randn(B, HF * WF, CM).astype(np.float32))
                for _ in range(2))
    mfs = tuple(jnp.asarray(rng.randn(B, N, CM).astype(np.float32))
                for _ in range(2))
    return feats, tuple(masks), dws, ifs, mfs


def _dense_loss(ifs, mfs, feats, masks, dws, meshgrid):
    pcs = []
    for side in range(2):
        md = resize_nearest(masks[side][..., None], (HF, WF)).reshape(B, -1)
        pcs.append(corr.masked_cost_volume(ifs[side], mfs[side], md))
    loss, vis = corr.dino_cycle_loss_dense(
        feats, masks, dws, tuple(pcs), meshgrid, TAU_I, TAU_M, HF, WF, K)
    return loss, vis


def _fact_loss(ifs, mfs, feats, masks, dws, meshgrid):
    return corr.dino_cycle_loss(
        feats, masks, dws, ifs, mfs, meshgrid, TAU_I, TAU_M, HF, WF, K)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_factored_matches_dense_value_and_vis(seed):
    feats, masks, dws, ifs, mfs = _inputs(seed)
    meshgrid = corr.make_meshgrid(HF, WF)
    ld, vd = _dense_loss(ifs, mfs, feats, masks, dws, meshgrid)
    lf, vf = _fact_loss(ifs, mfs, feats, masks, dws, meshgrid)
    # rtol 1e-3: when a selected tgt row's softmax mass lands entirely on
    # dw-masked vertices, den ~ 0 and match = num/1e-5 amplifies fp
    # reassociation noise (seed 2 exercises this); an algebra bug would be
    # O(1) relative, not 1e-4
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lf),
                               rtol=1e-3, atol=2e-5)
    for key in ("pts_src", "pts_tgt", "mask"):
        np.testing.assert_array_equal(np.asarray(vd[key]), np.asarray(vf[key]))
    np.testing.assert_allclose(np.asarray(vd["match"]),
                               np.asarray(vf["match"]), rtol=2e-2, atol=2e-5)


def test_factored_matches_dense_grads():
    feats, masks, dws, ifs, mfs = _inputs(3)
    meshgrid = corr.make_meshgrid(HF, WF)

    gd = jax.grad(lambda i, m: _dense_loss(i, m, feats, masks, dws,
                                           meshgrid)[0], argnums=(0, 1))(
        ifs, mfs)
    gf = jax.grad(lambda i, m: _fact_loss(i, m, feats, masks, dws,
                                          meshgrid)[0], argnums=(0, 1))(
        ifs, mfs)
    for d, f in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gf)):
        assert np.asarray(jnp.abs(d)).max() > 0  # non-degenerate check
        np.testing.assert_allclose(np.asarray(d), np.asarray(f),
                                   rtol=2e-4, atol=2e-5)


def test_attention_impl_flags():
    """Pin the DINO attention variants (models/vit.py):

    * flash_attention_available auto-falls back off-TPU, so CPU tests /
      dryruns can never reach the TPU-only pallas kernel;
    * attn_bf16 (bf16 scores/softmax INSIDE attention only) keeps the
      param tree, output shape and f32 dtype identical, and stays within a
      loose tolerance of the f32 path on a short random-init trunk (the
      flagship 9-block drift is measured on TPU by
      scripts/ab_flash_attention.py and documented in configs.py).
    """
    from selfcorr_tpu.models.vit import DinoViTS8, flash_attention_available

    assert jax.default_backend() == "cpu"  # tests/conftest.py forces CPU
    assert flash_attention_available(True) is False
    assert flash_attention_available(False) is False

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    m32 = DinoViTS8(feature_layer=2)
    mbf = DinoViTS8(feature_layer=2, attn_bf16=True)
    params = m32.init(jax.random.PRNGKey(0), img)["params"]
    # identical param trees: attn_bf16 adds no parameters
    pbf = mbf.init(jax.random.PRNGKey(0), img)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pbf))

    y32 = m32.apply({"params": params}, img)
    ybf = mbf.apply({"params": params}, img)
    assert ybf.shape == y32.shape and ybf.dtype == jnp.float32
    rel = float(jnp.abs(ybf - y32).max() / (jnp.abs(y32).max() + 1e-9))
    assert rel < 0.05, rel


def test_pad_once_matches_default_trunk(monkeypatch):
    """pad_once pads the trunk to a 128-multiple ONCE at entry (vit.py
    DinoViTS8.pad_once); pad rows pass through LayerNorm/MLP but must never
    leak into real tokens. The pallas flash kernel is TPU-only, so on CPU we
    substitute a segment-masked XLA attention with the same semantics
    (real/pad queries attend only to their own segment) and assert the
    padded trunk's features match the default unpadded path bit-for-nearly."""
    from selfcorr_tpu.models import vit as vit_mod

    def mock_flash(q, k, v, n_real=None):
        b, t, h, d = q.shape
        if n_real is None:
            n_real = t
        seg = jnp.arange(t) >= n_real
        mask = (seg[None, :, None] == seg[None, None, :])[:, None]
        return jax.nn.dot_product_attention(q, k, v, mask=mask)

    monkeypatch.setattr(vit_mod, "_flash_attention", mock_flash)

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    base = vit_mod.DinoViTS8(feature_layer=2)
    padded = vit_mod.DinoViTS8(feature_layer=2, flash=True, pad_once=True)
    params = base.init(jax.random.PRNGKey(0), img)["params"]
    # pad_once adds no parameters
    pp = padded.init(jax.random.PRNGKey(0), img)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pp))

    y0 = base.apply({"params": params}, img)       # XLA attention, t=17
    y1 = padded.apply({"params": params}, img)     # masked attn, t=128
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-5)
