"""End-to-end eval pipeline on the synthetic dataset (untrained model)."""
import numpy as np
import jax
import pytest

from selfcorr_tpu.configs import Config
from selfcorr_tpu.eval.tester import Tester


@pytest.mark.slow
def test_tester_synthetic_nocs_eval(tmp_path):
    cfg = Config(
        dataset_name="synthetic", img_size=32, corr_h=8, corr_w=8,
        subdivide=1, batch_size=4, repeat=1, symmetry_idx=0,
        use_depth=True, use_pallas=False, n_corr_feat=16, codedim=8,
        depth_offset=5.0, checkpoint_dir=str(tmp_path), name="ev",
        train=False, eval=True, eval_nocs=True, dframe_eval=3,
        pose_fit_max_points=256, ransac_iters=10, num_workers=2,
    )
    t = Tester(cfg)
    results = t.test()
    # untrained model: metrics exist and are finite fractions
    for k in ("iou@25", "iou@50", "5deg5cm", "10deg5cm"):
        assert 0.0 <= results[k] <= 1.0
    assert results["count"] > 0


@pytest.mark.slow
def test_tester_sharded_eval_equivalence(tmp_path):
    """--num_devices N shards the eval batch over the data mesh (params
    replicated, GSPMD-partitioned forward + RANSAC fit). Same inputs + same
    rng must give the same predictions and pose fits as the single-device
    Tester (modulo float reassociation from the partitioned reductions)."""
    base = dict(
        dataset_name="synthetic", img_size=32, corr_h=8, corr_w=8,
        subdivide=1, batch_size=8, repeat=1, symmetry_idx=0,
        use_depth=True, use_pallas=False, n_corr_feat=16, codedim=8,
        depth_offset=5.0, checkpoint_dir=str(tmp_path), name="sh1",
        train=False, eval=True, eval_nocs=True, dframe_eval=3,
        pose_fit_max_points=256, ransac_iters=10, num_workers=2,
    )
    t1 = Tester(Config(**base))
    t8 = Tester(Config(**{**base, "name": "sh8", "num_devices": 8}))
    assert t8.mesh is not None and t8.mesh.devices.size == 8

    from selfcorr_tpu.data.loader import TestLoader
    from selfcorr_tpu.eval.tester import make_test_dataset
    batch = next(iter(TestLoader(make_test_dataset(t1.cfg), t1.cfg)))
    rng = jax.random.PRNGKey(7)
    pred1, fit1 = t1.predict_batch(batch, rng)
    pred8, fit8 = t8.predict_batch(batch, rng)

    np.testing.assert_allclose(np.asarray(pred8["match"]),
                               np.asarray(pred1["match"]),
                               rtol=1e-4, atol=1e-5)
    for k in ("bbox9", "rotation", "translation", "scale_fit"):
        np.testing.assert_allclose(np.asarray(fit8[k]), np.asarray(fit1[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)

    # batch size must divide the mesh
    with pytest.raises(ValueError):
        Tester(Config(**{**base, "name": "bad", "batch_size": 4,
                         "num_devices": 8}))


@pytest.mark.slow
def test_tester_visualization_panels(tmp_path):
    """The reference Tester's visualization behaviors (tester.py:461-688):
    full-frame paste-back panels (bbox/match/imatch/gt via center+length),
    the hard-texture render (--visualize_tex), --match_with_bbox, and the
    depth/mask render panels, all written for each valid sample."""
    import os
    cfg = Config(
        dataset_name="synthetic", img_size=32, corr_h=8, corr_w=8,
        subdivide=1, batch_size=4, repeat=1, symmetry_idx=0,
        use_depth=True, use_pallas=False, n_corr_feat=16, codedim=8,
        depth_offset=5.0, checkpoint_dir=str(tmp_path), name="vis",
        train=False, eval=True, eval_nocs=True, dframe_eval=3,
        pose_fit_max_points=256, ransac_iters=10, num_workers=2,
        vis_pred=True, match_with_bbox=True,
        vis_path=str(tmp_path / "vis"),
    )
    t = Tester(cfg)
    t.test()
    files = os.listdir(cfg.vis_path)
    assert files, "no panels written"
    tags = {f.rsplit("_", 1)[0] for f in files if f.endswith(".png")}
    some_tag = sorted(tags)[0]
    for suffix in ("img", "bbox", "match", "imatch", "conf", "depth",
                   "mask", "tex", "gt", "3d"):
        assert f"{some_tag}_{suffix}.png" in files, (suffix, sorted(files))
    # full-frame paste-back: panels are at the ORIGINAL frame resolution
    # (synthetic raw size), not the 32^2 crop
    import cv2
    panel = cv2.imread(os.path.join(cfg.vis_path, f"{some_tag}_match.png"))
    from selfcorr_tpu.data.synthetic import SyntheticVideos
    raw = SyntheticVideos(2, 6).raw
    assert panel.shape[:2] == (raw, raw), panel.shape
    mesh_files = [f for f in files if f.endswith("_mesh.obj")]
    assert mesh_files
