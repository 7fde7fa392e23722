"""Five-group AdamW + OneCycle, per-group gradient clipping, NaN guard.

Parity with reference model/module/optimizers.py:17-79 and
model/trainer.py:132-150:
  groups: mean_v (lr x vert_lr_ratio), pose_predictor (x cam_lr_ratio),
  shape (shape_predictor + shape_code_predictor), feat (featnet +
  featnet_mesh), backbone — AdamW betas (0.9, 0.999), wd 1e-4, per-group
  OneCycleLR (pct_start 0.05, cos anneal, div = final_div = 25).
  Pre-optimizer clipping: mean_v and shape_predictor grads to global-norm 1,
  pose_predictor to 0.1 (trainer.py:138-149). BatchNorm scale/bias are frozen
  (trainer.py:54-58 set_bn_eval) — labeled 'frozen' and zeroed.
  NaN guard: any non-finite gradient anywhere zeroes the whole step
  (trainer.py:144-147), implemented in-graph (no host sync).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from selfcorr_tpu.configs import Config

GROUP_OF_MODULE = {
    "backbone": "backbone",
    "featnet": "feat",
    "featnet_mesh": "feat",
    "shape_code_predictor": "shape",
    "shape_predictor": "shape",
    "pose_predictor": "cam",
}

CLIP_OF_GROUP = {"vert": 1.0, "shape_mlp": 1.0, "cam": 0.1}


def _is_bn_param(path) -> bool:
    """BatchNorm parameters are under a BatchNorm_* module in flax."""
    return any(isinstance(p, str) and p.startswith("BatchNorm") for p in path)


def param_labels(params, train_mean_v: bool = True) -> Any:
    """Label tree: {mean_v -> 'vert', net/<module> -> group, BN -> 'frozen'}.

    mean_v is frozen when a shape prior is used without prior_deform
    (mesh.py:90 `requires_grad=opts.prior_deform`); a frozen torch Parameter
    receives neither gradient nor AdamW weight decay, so it must be excluded
    from the optimizer, not merely given zero gradients.
    """
    def label_net(path, _):
        keys = [getattr(p, "key", getattr(p, "name", p)) for p in path]
        if any(str(k).startswith("BatchNorm") for k in keys):
            return "frozen"
        top = str(keys[0])
        return GROUP_OF_MODULE.get(top, "feat")

    net_labels = jax.tree_util.tree_map_with_path(label_net, params["net"])
    return {"net": net_labels,
            "mean_v": "vert" if train_mean_v else "frozen"}


def onecycle(peak_lr: float, total_steps: int) -> optax.Schedule:
    # warmup must span at least one step or optax divides by a zero-length
    # interval (NaN) — only relevant for tiny smoke-test schedules
    pct_start = max(0.05, 1.001 / max(total_steps, 2))
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=peak_lr, pct_start=pct_start,
        div_factor=25.0, final_div_factor=25.0)


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    total = cfg.total_iters
    lrs = {
        "vert": cfg.vert_lr_ratio * cfg.learning_rate,
        "cam": cfg.cam_lr_ratio * cfg.learning_rate,
        "shape": cfg.learning_rate,
        "feat": cfg.learning_rate,
        "backbone": cfg.learning_rate,
    }

    def adamw(group):
        return optax.adamw(onecycle(lrs[group], total), b1=0.9, b2=0.999,
                           weight_decay=1e-4)

    transforms = {g: adamw(g) for g in lrs}
    transforms["frozen"] = optax.set_to_zero()
    train_mean_v = (not cfg.shape_prior) or cfg.prior_deform
    labels = param_labels(params, train_mean_v=train_mean_v)
    return optax.multi_transform(transforms, labels)


def clip_and_guard(grads, params_struct=None):
    """Per-group clipping + global NaN guard, all in-graph.

    Returns (clipped_grads, grad_norms dict, bad_flag).
    """
    net = grads["net"]

    def group_norm(subtrees):
        leaves = []
        for t in subtrees:
            leaves += jax.tree_util.tree_leaves(t)
        if not leaves:
            return jnp.zeros(())
        return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                            for l in leaves))

    def clip_tree(tree, max_norm, norm):
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, tree)

    norm_meanv = group_norm([grads["mean_v"]])
    norm_shape = group_norm([net.get("shape_predictor", {})])
    norm_pose = group_norm([net.get("pose_predictor", {})])

    out = dict(grads)
    out["mean_v"] = clip_tree(grads["mean_v"], 1.0, norm_meanv)
    out_net = dict(net)
    if "shape_predictor" in net:
        out_net["shape_predictor"] = clip_tree(net["shape_predictor"], 1.0,
                                               norm_shape)
    if "pose_predictor" in net:
        out_net["pose_predictor"] = clip_tree(net["pose_predictor"], 0.1,
                                              norm_pose)
    out["net"] = out_net

    finite = jnp.array(True)
    for leaf in jax.tree_util.tree_leaves(out):
        finite = finite & jnp.all(jnp.isfinite(leaf))
    out = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), out)

    norms = dict(grad_meanv_norm=norm_meanv, grad_shapenerf_norm=norm_shape,
                 grad_pose_predictor_norm=norm_pose)
    return out, norms, ~finite
