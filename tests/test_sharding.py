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
