"""TB image-panel set: forward_vis products + host drawing + Trainer hookup.

The reference logs ~17 image channels every vis_freq (trainer.py:175-198);
these tests pin that the full set renders without error on the tiny config.
"""
import glob
import os

import numpy as np
import jax
import pytest

from selfcorr_tpu.configs import Config
from selfcorr_tpu.models.meshnet import build_mesh_constants, forward_vis
from selfcorr_tpu.train.step import init_state
from tests.test_train_step import tiny_cfg, synthetic_batch

PANEL_KEYS = ("match", "match_gt", "tex_render", "mask_render",
              "depth_render", "depth_mask", "mean_v_depth", "mean_v_mask",
              "depth_diff", "imatch", "imatch_gt", "depth_weight",
              "cycle_match", "cycle_match_gt", "cycle_mask",
              "pt_pts_src", "pt_pts_tgt", "pt_match", "pt_mask")


@pytest.fixture(scope="module")
def vis_setup():
    cfg = tiny_cfg()
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, b=2)
    v = forward_vis(state.params, state.batch_stats, state.dino_params,
                    batch, constants, jax.random.PRNGKey(1), cfg)
    return cfg, batch, v


def test_forward_vis_products(vis_setup):
    cfg, batch, v = vis_setup
    for k in PANEL_KEYS:
        assert k in v, k
        arr = np.asarray(v[k])
        assert np.isfinite(arr).all(), k
    s = cfg.img_size
    assert v["match_gt"].shape == (2, s, s, 3)
    assert v["mean_v_depth"].shape == (2, s, s)
    assert v["cycle_match"].shape[0] == 2 and v["cycle_match"].shape[-1] == 2
    assert v["pt_pts_src"].shape == (1, cfg.pretrain_k, 2)


def test_drawing_functions(vis_setup):
    from selfcorr_tpu.utils import vis as V
    cfg, batch, v = vis_setup
    s = cfg.img_size
    img0 = np.asarray(batch["img"][0])
    mask0 = np.asarray(batch["mask"][0])
    pv = np.asarray(v["pred_v"][0])
    ranges = (pv.min(0), pv.max(0))

    panels = [
        V.draw_match(img0, np.asarray(v["match"][0]), mask0, ranges),
        V.draw_match(img0, np.asarray(v["match_gt"][0]),
                     np.asarray(v["match_mask"][0]) > 0.5, ranges),
        V.draw_depth(np.asarray(v["mean_v_depth"][0]),
                     np.asarray(v["mean_v_mask"][0])),
        V.draw_depth_diff(np.asarray(v["depth_diff"][0])),
        V.draw_point_set(np.asarray(v["imatch"][0]),
                         V.to_u8(V.colorize_canonical(pv)),
                         np.asarray(v["depth_weight"][0]), s),
        V.draw_point_set(np.asarray(v["cycle_match"][0]),
                         V.grid_point_colors(np.asarray(v["cycle_match_gt"][0])),
                         np.asarray(v["cycle_mask"][0]), s),
        V.draw_point_set(np.asarray(v["pt_pts_src"][0]),
                         V.grid_point_colors(np.asarray(v["pt_pts_tgt"][0])),
                         np.asarray(v["pt_mask"][0]), s, base=img0,
                         blend=0.3),
    ]
    for i, p in enumerate(panels):
        assert p.shape == (s, s, 3), i
        assert p.dtype == np.uint8, i


def test_trainer_log_images_end_to_end(tmp_path, capsys):
    """_log_images must emit every channel without tripping the vis
    try/except (a failure prints '[vis] image logging failed')."""
    from selfcorr_tpu.train.loop import Trainer
    cfg = tiny_cfg(dataset_name="synthetic", total_iters=2,
                   checkpoint_dir=str(tmp_path), name="vistest")
    trainer = Trainer(cfg)
    batch = synthetic_batch(cfg, b=4)
    trainer._log_images(batch, step=1)
    out = capsys.readouterr().out
    assert "image logging failed" not in out, out
    assert glob.glob(os.path.join(str(tmp_path), "vistest",
                                  "*mean-mesh.obj"))
    events = glob.glob(os.path.join(str(tmp_path), "vistest", "events*"))
    assert events and os.path.getsize(events[0]) > 1000
