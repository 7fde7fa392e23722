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
