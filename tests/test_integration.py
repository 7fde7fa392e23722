"""Integration: config parsing, short synthetic training run via the Trainer,
checkpoint save/restore round trip."""
import os

import numpy as np
import jax
import pytest

from selfcorr_tpu.configs import Config, parse_args


def test_parse_flagfile(tmp_path):
    ff = tmp_path / "cfg.txt"
    ff.write_text("--category=mug\n--symmetry_idx=1\n--mask_wt=0.15\n"
                  "--use_depth=True\n--rotation_offset=0.1,0,0,0,-0.1,0.1\n")
    cfg = parse_args(["--flagfile", str(ff), "--total_iters", "123",
                      "--shape_prior"])
    assert cfg.category == "mug"
    assert cfg.symmetry_idx == 1
    assert cfg.mask_wt == 0.15
    assert cfg.use_depth is True
    assert cfg.total_iters == 123
    assert cfg.shape_prior is True
    assert cfg.rotation_offset == (0.1, 0, 0, 0, -0.1, 0.1)


def test_parse_repo_configs():
    for cat in ("laptop", "bottle", "bowl", "camera", "mug"):
        cfg = parse_args(["--flagfile", f"config/wild6d/{cat}.txt"])
        assert cfg.category == cat
        assert cfg.total_iters == 20000
        assert cfg.use_depth
        assert len(cfg.base_rot) == 9


def test_parse_nocs_cub_configs():
    """The shipped NOCS/CUB example flagfiles parse into coherent configs
    (BASELINE.md's 'NOCS REAL275 eval' and 'CUB training' paths)."""
    cfg = parse_args(["--flagfile", "config/nocs/laptop.txt"])
    assert cfg.dataset_name == "nocs"
    assert cfg.category == "laptop"
    assert cfg.use_depth and cfg.use_occ
    assert cfg.shape_prior and cfg.symmetry_idx == 1

    cfg = parse_args(["--flagfile", "config/cub/cub.txt"])
    assert cfg.dataset_name == "cub"
    assert not cfg.use_depth
    assert cfg.camera_loss and cfg.flatten_loss
    assert cfg.symmetry_idx == -1 and not cfg.shape_prior


def test_parse_ignores_reference_only_flags(capsys):
    cfg = parse_args(["--ngpu", "2", "--local_rank", "-1", "--topk_img=5"])
    assert cfg == Config()


@pytest.mark.slow
def test_short_synthetic_training(tmp_path):
    """3 iterations of the real Trainer on procedural data + resume."""
    from selfcorr_tpu.train.loop import Trainer

    cfg = Config(
        dataset_name="synthetic", img_size=32, corr_h=8, corr_w=8,
        subdivide=1, batch_size=2, repeat=2, total_iters=3,
        symmetry_idx=0, symmetry_npts=64, use_depth=True, divide_fn="both",
        pretrain_k=8, use_pallas=False, n_corr_feat=16, codedim=8,
        depth_offset=5.0, checkpoint_dir=str(tmp_path), name="t",
        save_freq=3, batch_log_interval=1, num_workers=2,
    )
    tr = Trainer(cfg)
    tr.train()
    assert int(np.asarray(tr.state.step)) == 3
    # checkpoint written and resumable
    ckpt_dir = os.path.join(str(tmp_path), "t", "ckpt")
    assert os.path.isdir(ckpt_dir)

    tr2 = Trainer(cfg)  # picks up the checkpoint
    assert tr2.start_step == 3
    mv1 = np.asarray(tr.state.params["mean_v"])
    mv2 = np.asarray(tr2.state.params["mean_v"])
    np.testing.assert_allclose(mv1, mv2, atol=1e-7)
