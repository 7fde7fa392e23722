"""Multi-device (8 virtual CPU devices) data-parallel train step."""
import numpy as np
import jax
import jax.numpy as jnp

from selfcorr_tpu.parallel import make_mesh, shard_batch, replicate
from selfcorr_tpu.models.meshnet import build_mesh_constants
from selfcorr_tpu.train.optim import make_optimizer
from selfcorr_tpu.train.step import init_state, make_sharded_train_step

from tests.test_train_step import tiny_cfg, synthetic_batch


def test_eight_device_train_step():
    assert len(jax.devices()) == 8, jax.devices()
    n_dev = 8
    cfg = tiny_cfg(batch_size=n_dev, repeat=2, num_devices=n_dev)
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    mesh = make_mesh(n_dev)

    # NOTE batch pairing happens per shard: local videos = batch/n_dev
    local_cfg = cfg.replace(batch_size=1)
    step_fn = make_sharded_train_step(local_cfg, constants, tx, mesh,
                                      donate=False)

    batch = synthetic_batch(cfg, b=n_dev * 2)  # 8 videos x 2 frames
    batch = shard_batch(mesh, batch)
    state_r = replicate(mesh, state)

    new_state, metrics = step_fn(state_r, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["bad_grad"]) == 0.0
    # replicated parameters remain consistent
    mv = new_state.params["mean_v"]
    assert mv.shape == (42, 3)
    assert np.isfinite(np.asarray(mv)).all()
    assert int(new_state.step) == 1


def test_single_vs_multi_device_equivalence():
    """DDP semantics check (reference trainer.py:66-78): the 8-device
    sharded step on a global batch must equal the composite of 8
    single-device forward/backwards on the shards (same folded RNG per
    shard), pmean'd — catching any drift in the batch-pairing layout,
    the gradient pmean, or the post-reduce clip/update path.
    """
    import functools
    from selfcorr_tpu.models.meshnet import forward_train
    from selfcorr_tpu.train.optim import clip_and_guard
    import optax

    n_dev = 8
    cfg = tiny_cfg(batch_size=n_dev, repeat=2, num_devices=n_dev)
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    mesh = make_mesh(n_dev)
    local_cfg = cfg.replace(batch_size=1)

    rng = jax.random.PRNGKey(11)
    global_batch = synthetic_batch(cfg, b=n_dev * cfg.repeat, seed=5)

    step_fn = make_sharded_train_step(local_cfg, constants, tx, mesh,
                                      donate=False)
    sh_state, sh_metrics = step_fn(replicate(mesh, state),
                                   shard_batch(mesh, global_batch), rng)

    # --- single-device composite over the same shards -----------------
    def fwd(params, shard, lrng):
        return forward_train(params, state.batch_stats, state.dino_params,
                             shard, constants, lrng, local_cfg, state.step)

    grad_fn = jax.jit(jax.value_and_grad(fwd, has_aux=True))
    aux_all, grads_all = [], []
    per = cfg.repeat  # frames per shard (1 video x repeat)
    for i in range(n_dev):
        shard = {k: v[i * per:(i + 1) * per] for k, v in global_batch.items()}
        lrng = jax.random.fold_in(rng, i)
        (_, (aux, _)), grads = grad_fn(state.params, shard, lrng)
        aux_all.append(jax.tree_util.tree_map(np.asarray, aux))
        grads_all.append(jax.tree_util.tree_map(np.asarray, grads))

    mean_aux = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack(xs), 0), *aux_all)
    for k, v in mean_aux.items():
        np.testing.assert_allclose(float(sh_metrics[k]), float(v),
                                   rtol=2e-4, atol=1e-5, err_msg=k)

    mean_grads = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack(xs), 0), *grads_all)
    clipped, norms, bad = clip_and_guard(mean_grads)
    assert float(bad) == 0.0
    for k, v in norms.items():
        np.testing.assert_allclose(float(sh_metrics[k]), float(v),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    updates, _ = tx.update(clipped, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(sh_state.params))
    for path, leaf in flat_ref:
        got = np.asarray(flat_sh[path])
        np.testing.assert_allclose(got, np.asarray(leaf), rtol=1e-4,
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
