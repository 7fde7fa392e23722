"""Oracle pose-fit: GT canonical coordinates through the full fit+metrics.

Feeds the ray tracer's own object-frame coordinates as the `match` field
(a perfect correspondence model) into fit_poses and the NOCS metrics. This
pins every convention in the chain — depth back-projection, Umeyama
similarity, base_rot, bbox9 construction, Box3D IoU, deg/cm — independent
of any learned model: the oracle must score ~100% at the tightest bucket.
"""
import numpy as np
import jax
import jax.numpy as jnp

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.synthetic import SyntheticTest, duo_prior_mesh
from selfcorr_tpu.eval.metrics import NocsAccumulator
from selfcorr_tpu.eval.pose_fit import fit_poses


def test_oracle_match_recovers_gt_pose():
    cfg = Config(img_size=64, use_depth=True, eval=True, dframe_eval=2,
                 pose_fit_max_points=2048, symmetry_idx=-1)
    ds = SyntheticTest(cfg, num_videos=2, frames_per_video=6, seed=1,
                       shape="duo")

    items = [ds.load_item(i) for i in range(len(ds))]
    batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
    b, s = batch["img"].shape[0], cfg.img_size

    # oracle match: back-project crop depth at GT pose -> object frame
    ys, xs = np.meshgrid(np.arange(s) + 0.5, np.arange(s) + 0.5,
                         indexing="ij")
    uv = np.stack([xs, ys], -1) / (s / 2.0) - 1.0  # NDC pixel centres
    match = np.zeros((b, s, s, 3), np.float32)
    for i in range(b):
        z = batch["depth"][i] / 1000.0  # mm -> m
        x = (uv[..., 0] - batch["pp_crop"][i, 0]) * z / batch["foc_crop"][i, 0]
        y = (uv[..., 1] - batch["pp_crop"][i, 1]) * z / batch["foc_crop"][i, 1]
        cam = np.stack([x, y, z], -1)
        R = batch["rot_gt"][i]
        # ray tracer: cam = R @ obj + center  =>  obj = R^T (cam - center)
        center = np.array([0, 0, ds.videos.z0[ds.samples[i][0]]])
        obj = (cam - center) @ R  # row-vector R^T application
        match[i] = obj

    # oracle mesh: the true canonical box via the duo union extents
    vid_boxes = [ds.videos.canonical_box(ds.samples[i][0]) for i in range(b)]
    n_pts = 64
    pred_v = np.zeros((b, n_pts, 3), np.float32)
    rng = np.random.RandomState(0)
    for i, (cb0, size) in enumerate(vid_boxes):
        corners = cb0 + (rng.rand(n_pts, 3) - 0.5) * size
        # include the true extremes so min/max reproduce the box exactly
        corners[0] = cb0 - size / 2
        corners[1] = cb0 + size / 2
        pred_v[i] = corners

    conf = (batch["depth"] > 0).astype(np.float32)
    fit = fit_poses(jax.random.PRNGKey(0), jnp.asarray(match),
                    jnp.asarray(conf), jnp.asarray(batch["depth"]),
                    jnp.asarray(batch["mask"]), jnp.asarray(batch["pp_crop"]),
                    jnp.asarray(batch["foc_crop"]), jnp.asarray(pred_v),
                    jnp.eye(3), max_points=cfg.pose_fit_max_points,
                    n_iters=50)
    assert np.asarray(fit["ok"]).all()

    acc = NocsAccumulator(symmetry_idx=-1)
    bbox9 = np.asarray(fit["bbox9"])
    for i in range(b):
        acc.add(bbox9[i], batch["rot_gt"][i], batch["trans_gt"][i],
                batch["scale_gt"][i])
    res = acc.summary()
    assert res["5deg2cm"] >= 0.95, res
    assert res["iou@50"] >= 0.95, res
    assert res["median_deg"] < 2.0, res
    assert res["median_cm"] < 1.0, res
