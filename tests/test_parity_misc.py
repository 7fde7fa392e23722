"""Misc parity tests against the torch reference implementations
(importable pieces only — no CUDA required)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

from selfcorr_tpu.losses.match_losses import (divide_by_frame,
                                              divide_by_instance,
                                              divide_by_both)
from selfcorr_tpu.models.meshnet import weights_schedule
from selfcorr_tpu.configs import Config


def test_divide_fns_match_reference():
    """Explicit expectations per loss_utils.py:326-345 (the reference module
    itself imports the CUDA soft_renderer, so the formulas are re-stated):
    frame: tgt = cat([src[:, 1:], src[:, :1]], 1); instance: roll videos."""
    rng = np.random.RandomState(0)
    x = rng.rand(8, 5).astype(np.float32)  # 2 videos x 4 frames
    xs = x.reshape(2, 4, 5)

    s, t = divide_by_frame(jnp.asarray(x), 2, 4)
    exp_t = np.concatenate([xs[:, 1:], xs[:, :1]], 1).reshape(8, 5)
    np.testing.assert_allclose(np.asarray(s), x)
    np.testing.assert_allclose(np.asarray(t), exp_t)

    s, t = divide_by_instance(jnp.asarray(x), 2, 4)
    exp_t = np.concatenate([xs[1:], xs[:1]], 0).reshape(8, 5)
    np.testing.assert_allclose(np.asarray(s), x)
    np.testing.assert_allclose(np.asarray(t), exp_t)

    s, t = divide_by_both(jnp.asarray(x), 2, 4)
    assert s.shape == (16, 5) and t.shape == (16, 5)
    np.testing.assert_allclose(np.asarray(s)[:8], x)
    np.testing.assert_allclose(np.asarray(s)[8:], x)


def test_weights_schedule_matches_reference_formula():
    cfg = Config(total_iters=1000, decay_ratio=0.1, triangle_wt=0.002,
                 match_wt=0.02)

    def ref_reg_decay(curr, max_steps, min_wt, max_wt):
        if curr > max_steps:
            return min_wt
        return curr / float(max_steps) * (min_wt - max_wt) + max_wt

    for step in (0, 1, 500, 999, 1000, 2000):
        w = weights_schedule(jnp.asarray(step), cfg)
        exp_tri = ref_reg_decay(step, 1000, 0.1 * 0.002, 0.002)
        exp_match = ref_reg_decay(step, 1000, 0.02, 0.1 * 0.02)
        np.testing.assert_allclose(float(w["triangle"]), exp_tri, rtol=1e-6)
        np.testing.assert_allclose(float(w["match"]), exp_match, rtol=1e-6)


def test_crop_intrinsics_formula():
    from selfcorr_tpu.data.crops import crop_intrinsics, to_ndc_intrinsics
    foc = [600.0, 590.0]
    pp = [320.0, 240.0]
    center = np.array([300, 260])
    length = np.array([80, 100])
    out_size = 256
    fc, pc = crop_intrinsics(foc, pp, center, length, out_size)
    # reference formula (dataset_wild6d.py:151-155)
    cf = [out_size / 2 / 80, out_size / 2 / 100]
    np.testing.assert_allclose(fc, [600 * cf[0], 590 * cf[1]], rtol=1e-6)
    np.testing.assert_allclose(
        pc, [(320 - (300 - 80)) * cf[0], (240 - (260 - 100)) * cf[1]],
        rtol=1e-6)
    fn, pn = to_ndc_intrinsics(fc, pc, out_size)
    np.testing.assert_allclose(pn, pc / 128.0 - 1.0, rtol=1e-6)
    np.testing.assert_allclose(fn, fc / 128.0, rtol=1e-6)


def test_crop_resize_matches_cv2_region():
    from selfcorr_tpu.data.crops import crop_resize
    import cv2
    rng = np.random.RandomState(1)
    img = rng.rand(50, 60, 3).astype(np.float32)
    center = np.array([30, 25])
    length = np.array([10, 8])
    out = crop_resize(img, center, length, 32, "bilinear")
    region = img[17:33, 20:40]
    expect = cv2.resize(region, (32, 32), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_crop_resize_pads_outside():
    from selfcorr_tpu.data.crops import crop_resize
    img = np.ones((20, 20), np.float32)
    out = crop_resize(img, np.array([0, 0]), np.array([10, 10]), 20, "nearest")
    # upper-left quadrant of the crop is out of bounds -> zero
    assert out[0, 0] == 0.0
    assert out[15, 15] == 1.0


def test_loader_batch_layout_contract():
    """[shard, video, frame] layout: frames of one video are consecutive."""
    from selfcorr_tpu.data.synthetic import SyntheticTrain
    from selfcorr_tpu.data.loader import TrainLoader
    cfg = Config(dataset_name="synthetic", img_size=32, batch_size=3,
                 repeat=2, total_iters=2, use_depth=True, num_workers=2)
    ds = SyntheticTrain(cfg, num_shards=2, seed=0)
    loader = TrainLoader(ds, cfg)
    batch = next(iter(loader))
    idx = batch["idx"].reshape(2, 3, 2)  # shards x videos x frames
    # all frames within a video slot share the video id
    assert (idx[..., 0] == idx[..., 1]).all()
    assert batch["img"].shape == (12, 32, 32, 3)
    loader.close()


def test_pinhole_matches_reference_formula():
    """pinhole_cam semantics (loss_utils.py:38-47): x' = pp + x*f/z per axis,
    z unchanged."""
    from selfcorr_tpu.ops.geometry import project_ndc

    rng = np.random.RandomState(3)
    verts = rng.rand(2, 10, 3).astype(np.float32) + np.array([0, 0, 4],
                                                             np.float32)
    pp = rng.rand(2, 2).astype(np.float32) * 0.2
    foc = rng.rand(2, 2).astype(np.float32) + 1.5
    exp = verts.copy()
    exp[..., 0] = pp[:, None, 0] + verts[..., 0] * foc[:, None, 0] / verts[..., 2]
    exp[..., 1] = pp[:, None, 1] + verts[..., 1] * foc[:, None, 1] / verts[..., 2]
    ours = np.asarray(project_ndc(jnp.asarray(verts), jnp.asarray(pp),
                                  jnp.asarray(foc), flip_y=False))
    np.testing.assert_allclose(ours, exp, atol=1e-5)
