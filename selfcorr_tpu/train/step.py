"""Train state + the single jitted train step.

The WHOLE iteration — forward (all losses incl. the fused Pallas renders and
the frozen DINO pass), backward, per-group clipping, NaN guard, AdamW +
OneCycle update, metric reduction — is ONE donated, sharded XLA program.
The reference syncs the host every step for gradient collection and logging
(trainer.py:122-150); here metrics come back as device scalars fetched
asynchronously by the loop.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from selfcorr_tpu.configs import Config
from selfcorr_tpu.models.meshnet import (MeshConstants, Networks,
                                         build_mesh_constants, forward_train)
from selfcorr_tpu.models.vit import DinoViTS8
from selfcorr_tpu.train.optim import make_optimizer, clip_and_guard


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any            # {"net": flax params, "mean_v": (V, 3)}
    batch_stats: Any
    opt_state: Any
    dino_params: Any       # frozen


def init_state(cfg: Config, constants: MeshConstants, rng) -> TrainState:
    k_net, k_dino = jax.random.split(rng)
    net = Networks(cfg)
    b = 2
    dummy_img = jnp.zeros((b, cfg.img_size, cfg.img_size, 3))
    dummy_meanv = jnp.zeros((b,) + constants.mean_v_init.shape)
    dummy_pp = jnp.zeros((b, 2))
    dummy_foc = jnp.ones((b, 2))
    variables = net.init(k_net, dummy_img, dummy_meanv, dummy_pp, dummy_foc,
                        True)
    dino = DinoViTS8()
    dino_vars = dino.init(k_dino, dummy_img)
    params = {"net": variables["params"],
              "mean_v": jnp.asarray(constants.mean_v_init)}
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        dino_params=dino_vars["params"],
    )
    if cfg.resnet_init_path or cfg.dino_init_path:
        # the reference always trains from ImageNet resnet18 + released DINO
        # weights (image_encoder.py:121, dino.py:40-44); opt_state stays
        # valid (same tree/shapes, Adam moments start at zero either way)
        from selfcorr_tpu.utils.weight_convert import load_pretrained_init
        state = load_pretrained_init(cfg, state)
    if cfg.warm_start_path:
        from selfcorr_tpu.utils.weight_convert import load_warm_start
        state = load_warm_start(cfg, state)
    if cfg.dino_bf16:
        # the trunk is frozen, so cast ONCE at rest: the in-step
        # tree_map(astype(bf16)) in forward_train then compiles to a no-op
        # and the program carries a single dtype through the trunk instead
        # of per-step f32->bf16 param casts + layout conversions.
        state = state._replace(dino_params=jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), state.dino_params))
    return state


def compress_batch_host(batch):
    """Host-side: pack the train batch into compact dtypes for upload
    (u8 img/mask/occ, u16 depth-mm) — ~3.4x less H2D traffic than f32.
    Depth crops are nearest-resampled integral millimetres (crops.py:82),
    so u16 round-trips exactly for real datasets; non-integral depths
    (e.g. the synthetic ray tracer's t*1000) are rounded-to-nearest so the
    worst-case error is 0.5 mm with no systematic bias. Img quantization
    (<0.4%) is far below the ColorJitter augmentation noise."""
    out = dict(batch)
    out["img"] = np.clip(np.asarray(batch["img"]) * 255.0 + 0.5,
                         0, 255).astype(np.uint8)
    out["mask"] = (np.asarray(batch["mask"]) > 0).astype(np.uint8)
    out["occ"] = (np.asarray(batch["occ"]) > 0).astype(np.uint8)
    out["depth"] = np.clip(np.asarray(batch["depth"]) + 0.5,
                           0, 65535).astype(np.uint16)
    return out


def decompress_batch(batch):
    """In-graph inverse of compress_batch_host (no-op on f32 batches)."""
    out = dict(batch)
    if batch["img"].dtype == jnp.uint8:
        out["img"] = batch["img"].astype(jnp.float32) / 255.0
    if batch["mask"].dtype != jnp.float32:
        out["mask"] = batch["mask"].astype(jnp.float32)
    if batch["occ"].dtype != jnp.float32:
        out["occ"] = batch["occ"].astype(jnp.float32)
    if batch["depth"].dtype != jnp.float32:
        out["depth"] = batch["depth"].astype(jnp.float32)
    return out


def train_step(state: TrainState, batch, rng, constants: MeshConstants,
               cfg: Config, tx: optax.GradientTransformation):
    """Pure step function; jit with donate_argnums=0 via make_train_step."""
    batch = decompress_batch(batch)

    def loss_fn(params):
        return forward_train(params, state.batch_stats, state.dino_params,
                             batch, constants, rng, cfg, state.step)

    (loss, (aux, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    grads, norms, bad = clip_and_guard(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_state = TrainState(step=state.step + 1, params=new_params,
                           batch_stats=new_bs, opt_state=new_opt,
                           dino_params=state.dino_params)
    metrics = {**aux, **norms, "bad_grad": bad.astype(jnp.float32)}
    return new_state, metrics


def make_train_step(cfg: Config, constants: MeshConstants,
                    tx: optax.GradientTransformation, donate: bool = True):
    fn = functools.partial(train_step, constants=constants, cfg=cfg, tx=tx)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Multi-chip: shard_map over a 1-D data mesh
# ---------------------------------------------------------------------------

def train_step_sharded(state: TrainState, batch, rng,
                       constants: MeshConstants, cfg: Config,
                       tx: optax.GradientTransformation):
    """Per-device forward/backward with pmean'd gradients and metrics.

    Replaces the reference's DDP+NCCL stack (trainer.py:66-78): each device
    rasterizes and differentiates its local sub-batch (the Pallas kernels run
    per shard), then gradients are all-reduced over the `data` axis — the
    collective XLA emits rides ICI. Parameters and optimizer state stay
    replicated. The per-device RNG is folded with the axis index so each
    shard draws its own augmentation, like per-process torch RNG.
    """
    axis = "data"
    batch = decompress_batch(batch)
    local_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

    def loss_fn(params):
        return forward_train(params, state.batch_stats, state.dino_params,
                             batch, constants, local_rng, cfg, state.step)

    (loss, (aux, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    # NOTE: shard_map AD's cotangent typing for replicated (P()) inputs is
    # SUBTLE and has flipped under us once already: with the round-2 graph
    # (scan/einsum chamfer) every param cotangent came out 'unreduced' (a
    # lazy psum — pmean materialized the cross-shard SUM, needing an extra
    # /axis_size); after the round-3 argmin-gather chamfer rewrite the same
    # graph yields plain per-shard local grads (pmean IS the DDP mean; the
    # old division made grads 8x too small). Measured leaf-by-leaf against
    # the single-device composite (all 108 leaves ratio 1.000). Keep
    # test_single_vs_multi_device_equivalence green after ANY change to loss
    # internals or a jax upgrade — it pins these semantics exactly
    # (reference DDP mean: trainer.py:66-78).
    grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
    aux = jax.lax.pmean(aux, axis)
    new_bs = jax.lax.pmean(new_bs, axis)

    grads, norms, bad = clip_and_guard(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_state = TrainState(step=state.step + 1, params=new_params,
                           batch_stats=new_bs, opt_state=new_opt,
                           dino_params=state.dino_params)
    metrics = {**aux, **norms, "bad_grad": bad.astype(jnp.float32)}
    return new_state, metrics


def make_sharded_train_step(cfg: Config, constants: MeshConstants,
                            tx: optax.GradientTransformation, mesh,
                            donate: bool = True):
    """shard_map'd step: batch sharded over `data`, state replicated."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    fn = functools.partial(train_step_sharded, constants=constants, cfg=cfg,
                           tx=tx)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata, so jax's vma checker rejects the Pallas rasterizer inside
    # shard_map (found by dryrun_multichip with use_pallas=True). The manual
    # pmean/axis_size reductions below make the sharding explicit anyway.
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
