"""Training driver: data, jitted step, logging, orbax checkpoints, resume.

Counterpart of the reference Trainer (model/trainer.py:41-206) with TPU-first
mechanics: the device never waits on the host — batches are prefetched by a
thread pool, metrics are fetched one step late (no forced sync), and
checkpoints include optimizer state for true resume (the reference cannot
resume mid-run, trainer.py:200-206).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.loader import TrainLoader
from selfcorr_tpu.models.meshnet import build_mesh_constants
from selfcorr_tpu.parallel import make_mesh, replicate, shard_batch
from selfcorr_tpu.train.optim import make_optimizer
from selfcorr_tpu.train.step import (init_state, make_sharded_train_step,
                                     make_train_step)
from selfcorr_tpu.utils import checkpoint as ckpt
from selfcorr_tpu.utils.logging import (log_metrics, make_writer,
                                        write_config_snapshot)


def make_train_dataset(cfg: Config, num_shards: int):
    if cfg.dataset_name == "Wild6D":
        from selfcorr_tpu.data.wild6d import Wild6DTrain
        return Wild6DTrain(cfg, num_shards=num_shards, seed=cfg.seed)
    if cfg.dataset_name == "synthetic":
        from selfcorr_tpu.data.synthetic import SyntheticTrain
        return SyntheticTrain(cfg, num_shards=num_shards, seed=cfg.seed)
    if cfg.dataset_name == "nocs":
        from selfcorr_tpu.data.nocs import NOCSTrain
        return NOCSTrain(cfg, num_shards=num_shards, seed=cfg.seed)
    if cfg.dataset_name == "cub":
        from selfcorr_tpu.data.cub import CUBTrain
        return CUBTrain(cfg, num_shards=num_shards, seed=cfg.seed)
    raise ValueError(cfg.dataset_name)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.run_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
        os.makedirs(self.run_dir, exist_ok=True)
        write_config_snapshot(self.run_dir, cfg)
        self.writer = make_writer(self.run_dir)

        self.constants = build_mesh_constants(cfg)
        self.n_dev = min(cfg.num_devices, len(jax.devices()))
        self.mesh = make_mesh(self.n_dev) if self.n_dev > 1 else None

        key = jax.random.PRNGKey(cfg.seed)
        self.state = init_state(cfg, self.constants, key)
        self.tx = make_optimizer(cfg, self.state.params)

        start = ckpt.latest_step(os.path.join(self.run_dir, "ckpt"))
        if start is not None:
            print(f"resuming from checkpoint step {start}")
            self.state = ckpt.restore_state(os.path.join(self.run_dir, "ckpt"),
                                            self.state)
        self.start_step = int(self.state.step)

        if self.mesh is not None:
            local_cfg = cfg  # batch pairing uses runtime shapes
            self.step_fn = make_sharded_train_step(local_cfg, self.constants,
                                                   self.tx, self.mesh)
            self.state = replicate(self.mesh, self.state)
        else:
            self.step_fn = make_train_step(cfg, self.constants, self.tx)

    def train(self):
        cfg = self.cfg
        dataset = make_train_dataset(cfg, self.n_dev)
        # NOTE: uploading from the producer thread (TrainLoader's
        # device_put_fn) measures SLOWER on the tunneled TPU transport —
        # cross-thread device_put contends with step dispatch; keep transfers
        # on the main thread (the jit call moves host batches itself)
        loader = TrainLoader(dataset, cfg,
                             use_processes=cfg.loader_processes)
        key = jax.random.PRNGKey(cfg.seed + 1)

        import jax.numpy as jnp

        t0 = time.time()
        metrics = None
        for i, batch in enumerate(loader):
            step_idx = self.start_step + i
            if step_idx >= cfg.total_iters:
                break
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            step_key = jax.random.fold_in(key, step_idx)
            self.state, metrics = self.step_fn(self.state, batch, step_key)

            # scalar fetches over the TPU transport are expensive (~tens of
            # ms each); log every batch_log_interval steps with ONE stacked
            # transfer instead of per-scalar per-step fetches
            if (step_idx + 1) % cfg.batch_log_interval == 0:
                names = sorted(metrics)
                packed = np.asarray(jnp.stack([metrics[n] for n in names]))
                vals = dict(zip(names, packed))
                log_metrics(self.writer, vals, step_idx)
                dt = (time.time() - t0) / cfg.batch_log_interval
                print(f"iter {step_idx + 1}/{cfg.total_iters} "
                      f"loss {vals['total_loss']:.4f} "
                      f"{dt * 1000:.0f} ms/iter "
                      f"({batch['img'].shape[0] / dt:.1f} imgs/s)")
                t0 = time.time()

            if cfg.profile_steps > 0 and step_idx == 10:
                jax.profiler.start_trace(os.path.join(self.run_dir, "trace"))
            if cfg.profile_steps > 0 and step_idx == 10 + cfg.profile_steps:
                jax.block_until_ready(metrics["total_loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace written to {self.run_dir}/trace")

            if (step_idx + 1) % cfg.vis_freq == 0:
                self._log_images(batch, step_idx + 1)

            if (step_idx + 1) % cfg.save_freq == 0:
                self.save(step_idx + 1)
        loader.close()
        self.save(int(np.asarray(self.state.step)))

    def save(self, step: int):
        ckpt.save_state(os.path.join(self.run_dir, "ckpt"), self.state, step)
        print(f"saved checkpoint at step {step}")

    def _log_images(self, batch, step: int):
        """TensorBoard image panels (trainer.py:175-198 counterpart):
        input, mask, depth, canonical-coordinate match, rendered mask/tex/
        depth, imatch overlay — computed with an eval forward + one fused
        render on the first sample."""
        try:
            import jax.numpy as jnp
            from selfcorr_tpu.models.meshnet import (forward_test,
                                                     render_products)
            from selfcorr_tpu.utils import vis as V

            cfg = self.cfg
            sub = {k: jnp.asarray(np.asarray(batch[k])[:1]) for k in
                   ("img", "mask", "depth", "occ", "pp_crop", "foc_crop")}
            params = jax.tree_util.tree_map(np.asarray, self.state.params)
            params = {"net": params["net"],
                      "mean_v": jnp.asarray(params["mean_v"])}
            bs = jax.tree_util.tree_map(np.asarray, self.state.batch_stats)
            pred = forward_test(params, bs, sub, self.constants,
                                jax.random.PRNGKey(step), cfg)
            r = render_products(
                pred["pred_v"], jnp.asarray(self.constants.faces),
                pred["tex"], sub["foc_crop"], sub["pp_crop"],
                pred["rotation"], pred["translation"], cfg,
                use_pallas=jax.default_backend() != "cpu")

            def addim(tag, img_hwc):
                self.writer.add_image(tag, np.asarray(img_hwc), step,
                                      dataformats="HWC")

            img0 = np.asarray(sub["img"][0])
            mask0 = np.asarray(sub["mask"][0])
            addim("vis/img", V.to_u8(img0))
            addim("vis/mask", V.draw_mask(mask0)[:, :, ::-1])
            addim("vis/match", V.draw_match(
                img0, np.asarray(pred["match"][0]), mask0)[:, :, ::-1])
            addim("vis/imatch", V.draw_imatch(
                img0, np.asarray(pred["imatch"][0]),
                np.asarray(pred["pred_v"][0]))[:, :, ::-1])
            addim("vis/mask_render", V.draw_mask(
                np.asarray(r["mask_render"][0]))[:, :, ::-1])
            addim("vis/texture_render", V.to_u8(
                np.asarray(r["tex_render"][0])))
            addim("vis/depth_render", V.draw_depth(
                np.asarray(r["depth_render"][0]),
                np.asarray(r["depth_mask"][0]))[:, :, ::-1])
            if cfg.use_depth:
                addim("vis/depth_gt", V.draw_depth(
                    np.asarray(sub["depth"][0]), mask0)[:, :, ::-1])

            # export the current mean shape (trainer vis exports the mean
            # mesh OBJ each vis_freq, model.py:228-236)
            from selfcorr_tpu.ops.mesh_ops import save_obj
            save_obj(os.path.join(self.run_dir,
                                  f"{step}-iter-mean-mesh.obj"),
                     np.asarray(self.state.params["mean_v"]),
                     np.asarray(self.constants.faces))
        except Exception as e:  # vis must never kill training
            print(f"[vis] image logging failed: {e}")
