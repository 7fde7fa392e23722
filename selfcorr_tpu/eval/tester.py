"""Evaluation driver: jitted eval forward + batched pose fit + host metrics.

Counterpart of the reference Tester (model/tester.py:126-321): per batch the
model forward and the whole-batch RANSAC pose fit run on device; the exact 3D
IoU / deg-cm metrics run on the host. Prints the same summary channels
(iou@25/50, {5,10}deg x {2,5}cm for NOCS-style eval; mIoU + PCK for CUB).

Multi-chip: with --num_devices N > 1 the eval batch is sharded over the same
1-D `data` mesh training uses (params replicated, batch rows split) and XLA's
GSPMD partitions the forward + the whole-batch RANSAC fit across chips — an
upgrade over the reference Tester, which is single-GPU (tester.py:325 pins
`cuda:0`). Every op in forward_test / fit_poses is batched, so no shard_map
is needed; outputs are fetched to host for the (cheap) metric accumulation.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.loader import TestLoader
from selfcorr_tpu.eval.metrics import NocsAccumulator, mask_iou, map_kp
from selfcorr_tpu.eval.pose_fit import fit_poses
from selfcorr_tpu.models.meshnet import build_mesh_constants, forward_test
from selfcorr_tpu.train.step import init_state
from selfcorr_tpu.utils import checkpoint as ckpt
from selfcorr_tpu.utils.logging import write_config_snapshot


def make_test_dataset(cfg: Config):
    if cfg.dataset_name == "Wild6D":
        from selfcorr_tpu.data.wild6d import Wild6DTest
        return Wild6DTest(cfg)
    if cfg.dataset_name == "synthetic":
        from selfcorr_tpu.data.synthetic import SyntheticTest
        return SyntheticTest(cfg, shape=cfg.synthetic_shape)
    if cfg.dataset_name == "nocs":
        from selfcorr_tpu.data.nocs import NOCSTest
        return NOCSTest(cfg)
    if cfg.dataset_name == "cub":
        from selfcorr_tpu.data.cub import CUBTest
        return CUBTest(cfg)
    raise ValueError(cfg.dataset_name)


class Tester:
    __test__ = False  # not a pytest class
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.run_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
        os.makedirs(self.run_dir, exist_ok=True)
        write_config_snapshot(self.run_dir, cfg, "config-test.txt")
        self.constants = build_mesh_constants(cfg)

        self.state = init_state(cfg, self.constants, jax.random.PRNGKey(cfg.seed))
        if cfg.model_path:
            if cfg.model_path.endswith(".pth"):
                from selfcorr_tpu.utils.weight_convert import load_reference_ckpt
                self.state = load_reference_ckpt(cfg.model_path, self.state)
            else:
                self.state = ckpt.restore_state(cfg.model_path, self.state)

        self.mesh = None
        self.row_range = None  # multi-host: this process's global-batch rows
        if cfg.num_devices > 1 or jax.process_count() > 1:
            from selfcorr_tpu.parallel import (make_mesh, process_row_range,
                                               replicate)
            if cfg.batch_size % cfg.num_devices:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by "
                    f"num_devices {cfg.num_devices}")
            self.mesh = make_mesh(cfg.num_devices)
            # params/BN stats replicated once; batches are sharded per call
            self.state = self.state._replace(
                params=replicate(self.mesh, self.state.params),
                batch_stats=replicate(self.mesh, self.state.batch_stats))
            if jax.process_count() > 1:
                # each controller decodes + scores only its own rows of the
                # global eval batch (DistributedSampler equivalent for eval;
                # the reference Tester is single-GPU, tester.py:325);
                # metrics are merged across processes at summary time
                if cfg.eval_cub:
                    raise NotImplementedError(
                        "eval_cub pairs the FIRST and SECOND half of the "
                        "global batch (tester.py:252-258) — per-process row "
                        "slices would pair differently; run CUB eval on a "
                        "single controller")
                self.row_range = process_row_range(self.mesh, cfg.batch_size)

        constants = self.constants

        @jax.jit
        def _forward(params, batch_stats, batch, rng):
            return forward_test(params, batch_stats, batch, constants, rng, cfg)

        self._forward = _forward
        self._fit = functools.partial(
            fit_poses, max_points=cfg.pose_fit_max_points,
            n_iters=cfg.ransac_iters)

    def predict_batch(self, batch, rng):
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ("img", "mask", "depth", "occ", "pp_crop", "foc_crop")}
        if self.mesh is not None:
            from selfcorr_tpu.parallel import shard_batch
            jb = shard_batch(self.mesh, jb)
        pred = self._forward(self.state.params, self.state.batch_stats, jb, rng)
        fit = self._fit(rng, pred["match"], pred["match_conf"], jb["depth"],
                        jb["mask"], jb["pp_crop"], jb["foc_crop"],
                        pred["pred_v"], jnp.asarray(self.constants.base_rot))
        return pred, fit

    def test(self):
        cfg = self.cfg
        from selfcorr_tpu.parallel import local_rows
        dataset = make_test_dataset(cfg)
        loader = TestLoader(dataset, cfg, row_range=self.row_range)
        rng = jax.random.PRNGKey(cfg.seed + 123)

        acc = NocsAccumulator(cfg.symmetry_idx) if cfg.eval_nocs else None
        cub_iou, cub_pck = [], []

        for bi, batch in enumerate(loader):
            rng, step_rng = jax.random.split(rng)
            pred, fit = self.predict_batch(batch, step_rng)
            valid = batch["valid"]

            if cfg.eval_nocs and "rot_gt" in batch:
                bbox9 = local_rows(fit["bbox9"])
                for i in range(len(valid)):
                    if not valid[i]:
                        continue
                    acc.add(bbox9[i], batch["rot_gt"][i],
                            batch["trans_gt"][i], batch["scale_gt"][i])
            if cfg.eval_cub and "kp" in batch:
                self._eval_cub(batch, pred, fit, cub_iou, cub_pck)
            if cfg.vis_pred:
                from selfcorr_tpu.utils.vis import save_visualizations
                out_dir = cfg.vis_path or os.path.join(self.run_dir, "vis")
                pred_np = {k: local_rows(v) if v is not None else None
                           for k, v in pred.items()}
                fit_np = {k: local_rows(v) for k, v in fit.items()}
                read_orig = (None if cfg.eval_cub  # ref skips vis for CUB
                             else getattr(dataset, "read_original", None))
                for i in range(len(valid)):
                    if not valid[i]:
                        continue
                    tag = (f"{int(batch['idx'][i]):03d}_"
                           f"{int(batch['frame_idx'][i]):03d}")
                    orig = renders = None
                    if read_orig is not None:
                        try:
                            orig = read_orig(int(batch["idx"][i]),
                                             int(batch["frame_idx"][i]))
                            renders = self._debug_panels(batch, pred_np,
                                                         fit_np, i, orig)
                        except Exception as e:  # vis must never kill eval
                            print(f"[vis] full-frame panels unavailable "
                                  f"({e}); falling back to crop panels")
                            orig = renders = None
                    save_visualizations(out_dir, tag, batch, pred_np,
                                        fit_np, i, cfg, orig=orig,
                                        renders=renders)
            if (bi + 1) % 10 == 0:
                print(f"tested batch {bi + 1}/{len(loader)}")

        if acc is not None and jax.process_count() > 1:
            self._merge_across_processes(acc)

        results = {}
        if acc is not None:
            results = acc.summary()
            print("iou@25:", results["iou@25"])
            print("iou@50:", results["iou@50"])
            print("5deg*2cm:", results["5deg2cm"])
            print("5deg*5cm:", results["5deg5cm"])
            print("10deg*2cm:", results["10deg2cm"])
            print("10deg*5cm:", results["10deg5cm"])
        if cfg.eval_cub and cub_iou:
            results["mIoU"] = float(np.mean(cub_iou))
            pck = np.asarray(cub_pck, np.float64)
            results["kp@0.1"] = float(pck[:, 0].mean())
            results["kp@0.2"] = float(pck[:, 1].mean())
            print("mIoU:", results["mIoU"])
            print("kp@0.1:", results["kp@0.1"])
            print("kp@0.2:", results["kp@0.2"])
        return results

    @staticmethod
    def _merge_across_processes(acc):
        """Replace the per-process NOCS accumulator contents with the union
        across all controllers (counts differ per process only on the padded
        tail batch, so rows are NaN-padded to the max before the allgather;
        every process ends with the identical global summary)."""
        from jax.experimental import multihost_utils as mh
        import jax.numpy as jnp

        def gather(rows, width):
            a = np.asarray(rows, np.float64).reshape(-1, width)
            counts = np.asarray(mh.process_allgather(
                jnp.asarray([len(a)], jnp.int32))).reshape(-1)
            m = int(counts.max())
            padded = np.full((m, width), np.nan)
            padded[:len(a)] = a
            g = np.asarray(mh.process_allgather(
                jnp.asarray(padded, jnp.float32)))  # (P, m, width)
            return [g[p, i].tolist() for p in range(g.shape[0])
                    for i in range(counts[p])]

        acc.iou_hits = [[v > 0.5 for v in r] for r in gather(acc.iou_hits, 2)]
        acc.degcm_hits = [[v > 0.5 for v in r]
                          for r in gather(acc.degcm_hits, 4)]
        acc.raw = gather(acc.raw, 3)

    def _debug_panels(self, batch, pred, fit, i, orig):
        """Full-frame depth / hard-texture / mask render panels
        (reference tester.py:629-688): the FITTED mesh re-rendered with the
        ORIGINAL frame's intrinsics (converted to per-axis NDC units,
        tester.py:632-635), square render resized to (w, h).

        Deviations (documented): the render square is rounded up to the
        Pallas tile multiple (output-identical up to resampling — the NDC
        field of view is resolution-independent) and the white background
        of the tex panel is composited host-side from alpha rather than via
        a softmax background term (visually equivalent for a debug panel).
        """
        import cv2
        cfg = self.cfg
        any_specific = any(getattr(cfg, f, False) for f in (
            "visualize_bbox", "visualize_match", "visualize_imatch",
            "visualize_conf", "visualize_depth", "visualize_mask",
            "visualize_tex", "visualize_mesh", "visualize_gt"))
        want = {n for n in ("depth", "tex", "mask")
                if (not any_specific) or getattr(cfg, f"visualize_{n}")}
        if not want:
            return None
        import jax.numpy as jnp
        from selfcorr_tpu.ops import geometry as G
        from selfcorr_tpu.ops.rasterizer import render_fused
        from selfcorr_tpu.ops.rasterizer.common import EYE_OFFSET
        from selfcorr_tpu.utils.vis import to_u8

        h, w = orig["img"].shape[:2]
        on_cpu = jax.default_backend() == "cpu"
        backend = "dense" if on_cpu else "pallas"
        s = h if on_cpu else -(-h // 128) * 128  # Pallas tile multiple

        verts = jnp.asarray(fit["verts"][i])[None]          # (1, V, 3) posed
        faces = np.asarray(pred["faces"])
        tex = jnp.asarray(pred["tex"][i])[None]             # (1, V, 3)
        pp = np.asarray(batch["pp"][i])
        foc = np.asarray(batch["foc"][i])
        ppn = jnp.asarray([[pp[0] / (w / 2.0) - 1.0,
                            pp[1] / (h / 2.0) - 1.0]], jnp.float32)
        focn = jnp.asarray([[foc[0] / (w / 2.0),
                             foc[1] / (h / 2.0)]], jnp.float32)
        proj = G.project_ndc(verts, ppn, focn, flip_y=True)
        rast = proj.at[..., 2].add(EYE_OFFSET)
        fv = rast[:, faces]
        tex_f = tex[:, faces]
        vert_f = verts[:, faces]
        # one fused call renders tex+alpha; a second (soft_tex=camera verts)
        # gives the z channel for the depth panel (ref renders tex=verts)
        out = render_fused(fv, tex_f, tex_f, s, gamma_t=1e-4,
                           backend=backend)
        alpha = np.asarray(out["alpha1"][0])
        panels = {}
        if "tex" in want:
            rgb = np.asarray(out["tex"][0])
            white = np.ones_like(rgb)
            comp = rgb + (1.0 - alpha[..., None]) * white
            panels["tex"] = cv2.resize(to_u8(comp)[:, :, ::-1], (w, h),
                                       interpolation=cv2.INTER_LINEAR)
        if "mask" in want:
            m = np.repeat(alpha[..., None], 3, -1)
            panels["mask"] = cv2.resize(to_u8(m), (w, h),
                                        interpolation=cv2.INTER_LINEAR)
        if "depth" in want:
            outz = render_fused(fv, vert_f, vert_f, s, gamma_t=1e-4,
                                backend=backend)
            z = np.asarray(outz["tex"][0, :, :, 2])
            fg = alpha > 0
            if fg.any():
                z = np.where(fg, z, z[fg].max() * 1.1)
            lo, hi = z.min(), z.max()
            z01 = (z - lo) / max(hi - lo, 1e-9)
            panels["depth"] = cv2.resize(
                to_u8(np.repeat(z01[..., None], 3, -1)), (w, h),
                interpolation=cv2.INTER_LINEAR)
        return panels

    def _eval_cub(self, batch, pred, fit, cub_iou, cub_pck):
        """Mask IoU of the fitted render + keypoint transfer PCK
        (tester.py:224-292).

        Reference-parity note: CUB has no depth, so pose_fitting's point set
        is empty and EVERY sample takes the DEFAULT fallback pose (identity
        R, t=[0,0,0.5]m, scale 0.1 — tester.py:374-379); the reference's
        eval_cub still renders the mask from that fallback
        (tester.py:233-241). Pinned by test_cub_eval_end_to_end."""
        cfg = self.cfg
        from selfcorr_tpu.ops.rasterizer import render_fused
        from selfcorr_tpu.ops import geometry as G
        from selfcorr_tpu.ops.rasterizer.common import EYE_OFFSET

        pred_v = fit["verts"]
        faces = pred["faces"]
        cam = pred_v  # already posed by the fit
        proj = G.project_ndc(cam, jnp.asarray(batch["pp_crop"]),
                             jnp.asarray(batch["foc_crop"]), flip_y=True)
        rast = proj.at[..., 2].add(EYE_OFFSET)
        fv = rast[:, np.asarray(faces)]
        ones = jnp.ones_like(fv)
        out = render_fused(fv, ones, ones, cfg.img_size,
                           backend="dense" if jax.default_backend() == "cpu"
                           else "pallas")
        mask_render = np.asarray(out["alpha1"]) > 0.5
        ious = mask_iou(np.asarray(batch["mask"]), mask_render)
        valid = batch["valid"]
        cub_iou.extend([float(v) for v, ok in zip(ious, valid) if ok])

        if "kp" in batch:
            b = len(valid)
            half = b // 2
            kps = np.asarray(batch["kp"], np.float32)
            match = np.asarray(pred["match"])
            mask = np.asarray(batch["mask"])
            vis = (kps[..., 2] > 0).astype(np.float32)
            transfer, err, _, kp_mask = map_kp(
                vis[:half], vis[half: 2 * half], kps[:half],
                kps[half: 2 * half], match[:half], match[half: 2 * half],
                mask[:half], mask[half: 2 * half])
            if cfg.vis_pred:
                # keypoint-transfer panels (reference tester.py:270-279):
                # source kps on src image, transferred kps on tgt image,
                # GT kps on tgt image -> {tag}_1 / _2 / _2_gt .png
                from selfcorr_tpu.utils.vis import draw_kp
                import cv2
                out_dir = cfg.vis_path or os.path.join(self.run_dir, "vis")
                os.makedirs(out_dir, exist_ok=True)
                img = np.asarray(batch["img"], np.float32)
                for i in range(half):
                    if not (valid[i] and valid[i + half]):
                        continue
                    p1, pt, p2 = draw_kp(img[i], img[i + half], kps[i],
                                         kps[i + half], transfer[i],
                                         kp_mask[i])
                    tag = (f"{int(batch['idx'][i]):03d}_"
                           f"{int(batch['frame_idx'][i]):03d}")
                    cv2.imwrite(os.path.join(out_dir, f"{tag}_1.png"), p1)
                    cv2.imwrite(os.path.join(out_dir, f"{tag}_2.png"), pt)
                    cv2.imwrite(os.path.join(out_dir, f"{tag}_2_gt.png"), p2)

            padding, base_padding = 0.2, 0.0
            kp_scale = (1 + 2 * padding) / (1 + 2 * base_padding) / 2
            sel = err[kp_mask > 0]
            for e in sel:
                cub_pck.append([e * kp_scale < 0.1, e * kp_scale < 0.2])
