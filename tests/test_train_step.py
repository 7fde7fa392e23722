"""End-to-end smoke tests: model init, one jitted train step on synthetic
data, eval forward — all on CPU with the dense rasterizer backend."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.configs import Config
from selfcorr_tpu.models.meshnet import (build_mesh_constants, forward_test)
from selfcorr_tpu.train.optim import make_optimizer
from selfcorr_tpu.train.step import init_state, make_train_step


def tiny_cfg(**kw):
    base = dict(
        img_size=32, corr_h=8, corr_w=8, subdivide=1, batch_size=2, repeat=2,
        total_iters=10, symmetry_idx=0, symmetry_npts=128, use_depth=True,
        divide_fn="both", pretrain_k=8, use_pallas=False, n_corr_feat=16,
        codedim=8, depth_offset=5.0,
    )
    base.update(kw)
    return Config(**base)


def synthetic_batch(cfg, b=None, seed=0):
    b = b or cfg.batch_size * cfg.repeat
    rng = np.random.RandomState(seed)
    s = cfg.img_size
    img = rng.rand(b, s, s, 3).astype(np.float32)
    # a centered square mask
    mask = np.zeros((b, s, s), np.float32)
    mask[:, s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1.0
    depth = (mask * (5.0 + rng.rand(b, s, s)) ).astype(np.float32)
    return {
        "img": jnp.asarray(img),
        "mask": jnp.asarray(mask),
        "depth": jnp.asarray(depth),
        "occ": jnp.zeros((b, s, s), jnp.float32),
        "pp_crop": jnp.zeros((b, 2), jnp.float32),
        "foc_crop": jnp.full((b, 2), 2.0, jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    return cfg, constants, state


def test_init_shapes(setup):
    cfg, constants, state = setup
    assert state.params["mean_v"].shape == (42, 3)
    assert constants.faces.shape == (80, 3)
    assert constants.symm_rots.shape == (17, 3, 3)
    # param groups exist
    net = state.params["net"]
    for mod in ("backbone", "featnet", "featnet_mesh", "shape_code_predictor",
                "shape_predictor", "pose_predictor"):
        assert mod in net, sorted(net)


def test_one_train_step(setup):
    cfg, constants, state = setup
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=False)
    batch = synthetic_batch(cfg)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["bad_grad"]) == 0.0
    assert float(metrics["total_loss"]) > 0
    # every expected loss channel present
    for k in ("mask_loss", "texture_loss", "match_loss", "imatch_loss",
              "depth_loss", "symmetry_loss", "triangle_loss", "pullfar_loss",
              "deform_loss", "cycle_loss", "cycle_loss_pretrain"):
        assert k in metrics, k
    # parameters changed and stayed finite
    before = jax.tree_util.tree_leaves(state.params["net"])
    after = jax.tree_util.tree_leaves(new_state.params["net"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed
    for leaf in after + [new_state.params["mean_v"]]:
        assert np.isfinite(np.asarray(leaf)).all()
    assert int(new_state.step) == 1
    # frozen pieces
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(new_state.dino_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.dino_params)[0]))


def test_dino_bf16_at_rest(setup):
    """dino_bf16 stores the frozen trunk in bfloat16 at init (one cast at
    rest; the in-step astype compiles to a no-op) and the step still runs
    finite with a loss close to the f32 program's."""
    cfg_f32, constants, state_f32 = setup
    cfg = cfg_f32.replace(dino_bf16=True)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(state.dino_params):
        assert leaf.dtype == jnp.bfloat16
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=False)
    batch = synthetic_batch(cfg)
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["bad_grad"]) == 0.0
    assert np.isfinite(float(metrics["total_loss"]))
    # same init seed -> bf16 trunk features only perturb the cycle loss a
    # little; the totals must be close
    tx32 = make_optimizer(cfg_f32, state_f32.params)
    step32 = make_train_step(cfg_f32, constants, tx32, donate=False)
    _, m32 = step32(state_f32, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(m32["total_loss"]), rtol=0.05)


def test_mean_v_updates_only_with_prior_deform(setup):
    cfg, constants, state = setup
    # sphere prior always trains (mesh.py:116); an OBJ shape prior with
    # prior_deform=False keeps the mean shape fixed (mesh.py:90) — neither
    # gradients nor AdamW weight decay may touch it
    cfg2 = tiny_cfg(prior_deform=False, shape_prior=True)
    state2 = init_state(cfg2, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg2, state2.params)
    step_fn = make_train_step(cfg2, constants, tx, donate=False)
    batch = synthetic_batch(cfg2)
    new_state, _ = step_fn(state2, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(new_state.params["mean_v"]),
                               np.asarray(state2.params["mean_v"]), atol=1e-7)


def test_forward_test(setup):
    cfg, constants, state = setup
    cfg_t = cfg.replace(train=False)
    batch = synthetic_batch(cfg_t)
    out = forward_test(state.params, state.batch_stats, batch, constants,
                       jax.random.PRNGKey(3), cfg_t)
    b = cfg.batch_size * cfg.repeat
    assert out["pred_v"].shape == (b, 42, 3)
    assert out["match"].shape == (b, 32, 32, 3)
    assert out["imatch"].shape == (b, 42, 2)
    assert out["match_conf"].shape == (b, 32, 32)
    assert out["rotation"].shape == (b, 3, 3)
    R = np.asarray(out["rotation"])
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.eye(3)[None].repeat(b, 0), atol=1e-5)
    assert np.isfinite(np.asarray(out["match_conf"])).all()


def test_compress_roundtrip(setup):
    """compress_batch_host -> decompress_batch must be unbiased and tight:
    depth within 0.5 mm (round-to-nearest), img within one u8 quantum, and a
    train step on the compressed batch must track the f32 step (pinning the
    compact_transfer path, train/step.py:59-86)."""
    from selfcorr_tpu.train.step import (compress_batch_host,
                                         decompress_batch, make_train_step)
    cfg, constants, state = setup
    batch = synthetic_batch(cfg, seed=7)
    # non-integral depths (the synthetic ray tracer emits t*1000-style values)
    batch = dict(batch)
    batch["depth"] = batch["depth"] * 997.3
    comp = compress_batch_host(batch)
    assert comp["img"].dtype == np.uint8
    assert comp["depth"].dtype == np.uint16
    dec = jax.tree_util.tree_map(jnp.asarray, decompress_batch(
        {k: jnp.asarray(v) for k, v in comp.items()}))
    d0 = np.asarray(batch["depth"])
    d1 = np.asarray(dec["depth"])
    assert np.abs(d0 - d1).max() <= 0.5 + 1e-3
    # unbiased: mean error ~0, not systematically low
    assert abs(float((d1 - d0).mean())) < 0.05
    assert np.abs(np.asarray(batch["img"]) - np.asarray(dec["img"])).max() \
        <= 0.5 / 255.0 + 1e-6
    np.testing.assert_array_equal(np.asarray(dec["mask"]),
                                  np.asarray(batch["mask"]))

    # a step on the compressed batch stays close to the f32 step
    tx = make_optimizer(cfg, state.params)
    step_fn = make_train_step(cfg, constants, tx, donate=False)
    _, m_f32 = step_fn(state, batch, jax.random.PRNGKey(11))
    _, m_cmp = step_fn(state, {k: jnp.asarray(v) for k, v in comp.items()},
                       jax.random.PRNGKey(11))
    np.testing.assert_allclose(float(m_cmp["total_loss"]),
                               float(m_f32["total_loss"]), rtol=2e-2)


def test_warm_start_encoder_transfer(tmp_path):
    """cfg.warm_start_path initializes backbone+featnet (+stats) from a
    previous run's orbax checkpoint while heads/mean_v stay fresh (the
    in-sandbox analog of the reference's pretrained encoder,
    image_encoder.py:121)."""
    import jax
    from selfcorr_tpu.models.meshnet import build_mesh_constants
    from selfcorr_tpu.train.step import init_state
    from selfcorr_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg()
    constants = build_mesh_constants(cfg)
    src = init_state(cfg, constants, jax.random.PRNGKey(7))
    ckpt_dir = str(tmp_path / "src_ckpt")
    ckpt.save_state(ckpt_dir, src, 5)

    warm = init_state(cfg.replace(warm_start_path=ckpt_dir), constants,
                      jax.random.PRNGKey(8))
    fresh = init_state(cfg, constants, jax.random.PRNGKey(8))

    def leaves(tree):
        return jax.tree_util.tree_leaves(tree)

    for a, b in zip(leaves(warm.params["net"]["backbone"]),
                    leaves(src.params["net"]["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(leaves(warm.params["net"]["featnet"]),
                    leaves(src.params["net"]["featnet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # heads stay at the fresh init (key 8), not the source's (key 7)
    pose_w = leaves(warm.params["net"]["pose_predictor"])
    pose_f = leaves(fresh.params["net"]["pose_predictor"])
    for a, b in zip(pose_w, pose_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and at least one head leaf differs from the source run (zero-init
    # biases are legitimately equal everywhere)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(pose_w, leaves(src.params["net"]["pose_predictor"])))

    # cross-RESOLUTION transfer: a checkpoint from a different img_size has
    # a different DINO pos-embedding token count; restore_raw must not
    # shape-check it (the conv encoder subtrees are resolution-agnostic)
    cfg_big = tiny_cfg(img_size=64, corr_h=16, corr_w=16)
    const_big = build_mesh_constants(cfg_big)
    warm_big = init_state(cfg_big.replace(warm_start_path=ckpt_dir),
                          const_big, jax.random.PRNGKey(9))
    for a, b in zip(leaves(warm_big.params["net"]["backbone"]),
                    leaves(src.params["net"]["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_ablation_skips_run_and_zero_aux():
    """Zero-weighted loss terms are skipped at trace time (cfg is static
    under jit) but keep their aux keys as zeros, so ablation configs train
    with identical metric schemas (PERF.md round-3 matrix relies on this)."""
    import jax
    from selfcorr_tpu.models.meshnet import build_mesh_constants, forward_train
    from selfcorr_tpu.train.step import init_state

    cfg = tiny_cfg(symmetry_wt=0.0, cycle_loss_wt=0.0,
                   cycle_loss_pretrain_wt=0.0, tex_wt=0.0,
                   match_wt=0.0, imatch_wt=0.0)
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg)
    (loss, (aux, _)) = jax.jit(
        lambda p: forward_train(p, state.batch_stats, state.dino_params,
                                batch, constants, jax.random.PRNGKey(1),
                                cfg, state.step))(state.params)
    assert np.isfinite(float(loss))
    for k in ("symmetry_loss", "cycle_loss", "cycle_loss_pretrain",
              "texture_loss", "match_loss", "imatch_loss"):
        assert float(aux[k]) == 0.0, k
