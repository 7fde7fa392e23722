"""Pin the on-device synthetic generator (data/synthetic_device.py) against
the host pipeline (data/synthetic.py + data/crops.py) it replaces.

Deviations are documented in the module docstring: the analytic conic bbox
vs the rendered-mask bbox (~1 px pixel-center quantization) and direct
crop-camera rendering vs raw render + cv2.resize (bilinear footprint)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.crops import crop_frame, mask_bbox
from selfcorr_tpu.data.synthetic import SyntheticVideos
from selfcorr_tpu.data import synthetic_device as SD


@pytest.mark.parametrize("shape", ["ellipsoid", "duo"])
def test_analytic_bbox_matches_mask_bbox(shape):
    videos = SyntheticVideos(num_videos=3, frames_per_video=5, seed=2,
                             shape=shape)
    tables = SD._video_tables(videos)
    n_parts = 1 if shape == "ellipsoid" else 2
    cases = [(v, f) for v in range(3) for f in range(0, 5, 2)]
    vids = jnp.asarray([v for v, _ in cases])
    fids = jnp.asarray([f for _, f in cases])
    theta = (tables["phase"][vids]
             + 2.0 * jnp.pi * fids.astype(jnp.float32) / videos.n_frames)
    rmats = SD._rot_mats(tables["tilt"][vids], theta)
    center, length = SD.crop_bbox_analytic(tables, vids, rmats,
                                           tables["z0"][vids], videos.raw,
                                           n_parts)
    center, length = np.asarray(center), np.asarray(length)
    for i, (v, f) in enumerate(cases):
        _, mask, _, _, _ = videos.render_frame(v, f)
        c_host, l_host = mask_bbox(mask)
        assert np.abs(center[i] - c_host).max() <= 2, (v, f, center[i], c_host)
        assert np.abs(length[i] - l_host).max() <= 2, (v, f, length[i], l_host)


@pytest.mark.parametrize("shape", ["ellipsoid", "duo"])
def test_render_crop_matches_host_crop(shape):
    """Same (vid, fid) and the HOST's crop box on both sides, so the only
    difference left is direct rendering vs raw render + cv2.resize."""
    videos = SyntheticVideos(num_videos=2, frames_per_video=4, seed=5,
                             shape=shape)
    tables = SD._video_tables(videos)
    n_parts = 1 if shape == "ellipsoid" else 2
    s = 64
    for (v, f) in [(0, 1), (1, 3)]:
        img, mask, depth, foc, pp = videos.render_frame(v, f)
        host = crop_frame(img, mask, depth, foc, pp, s,
                          np.array([1.35, 1.35]))
        c_host, l0 = mask_bbox(mask)
        length = np.maximum((1.35 * l0).astype(np.int64), 1)
        out = SD.render_crop(tables, jnp.asarray([v]), jnp.asarray([f]),
                             jnp.asarray(c_host[None], jnp.int32),
                             jnp.asarray(length[None], jnp.int32),
                             s, videos.raw, videos.n_frames, n_parts)
        np.testing.assert_allclose(np.asarray(out["foc_crop"][0]),
                                   host["foc_crop"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["pp_crop"][0]),
                                   host["pp_crop"], rtol=1e-4, atol=1e-5)
        m_dev = np.asarray(out["mask"][0]) > 0.5
        m_host = host["mask"] > 0.5
        iou = (m_dev & m_host).sum() / max((m_dev | m_host).sum(), 1)
        assert iou > 0.95, iou
        both = m_dev & m_host
        # interior pixels: away from the silhouette the bilinear footprint
        # and the exact evaluation agree closely
        img_err = np.abs(np.asarray(out["img"][0]) - host["img"])[both]
        assert np.median(img_err) < 0.02, np.median(img_err)
        d_err = np.abs(np.asarray(out["depth"][0]) - host["depth"])[both]
        assert np.median(d_err) < 20.0, np.median(d_err)  # mm


def test_gen_contract_and_train_step():
    """make_device_synth output feeds make_train_step directly (tiny CPU)."""
    cfg = Config(dataset_name="synthetic", synthetic_shape="duo",
                 img_size=32, corr_h=8, corr_w=8, batch_size=2, repeat=2,
                 pretrain_k=8, codedim=8, n_corr_feat=16, subdivide=1,
                 use_depth=True, depth_offset=5.0, use_pallas=False,
                 synthetic_on_device=True)
    gen = SD.make_device_synth(cfg)
    b1 = gen(jax.random.PRNGKey(0))
    b2 = gen(jax.random.PRNGKey(1))
    b = cfg.batch_size * cfg.repeat
    assert b1["img"].shape == (b, 32, 32, 3)
    assert b1["mask"].shape == (b, 32, 32)
    assert b1["img"].dtype == jnp.float32
    assert float(jnp.abs(b2["img"] - b1["img"]).max()) > 0  # fresh samples
    assert 0.0 < float(b1["mask"].mean()) < 1.0
    d = b1["depth"][b1["mask"] > 0]
    assert float(d.min()) > 1000.0  # metric mm, objects at z ~4-6 m

    from selfcorr_tpu.models.meshnet import build_mesh_constants
    from selfcorr_tpu.train.optim import make_optimizer
    from selfcorr_tpu.train.step import init_state, make_train_step
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    step = make_train_step(cfg, constants, tx)
    state, m = step(state, b1, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["total_loss"]))
