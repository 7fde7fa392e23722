"""CUB dataset against a synthetic on-disk tree (mat annotations)."""
import os

import numpy as np
import cv2
import scipy.io as sio

from selfcorr_tpu.configs import Config


def make_cub_tree(root, n_classes=2, per_class=3, hw=(60, 80),
                  split="train"):
    h, w = hw
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    class_lines = []
    entries = []
    for c in range(n_classes):
        cname = f"{c + 1:03d}.Bird{c}"
        class_lines += [str(c + 1), cname]
        os.makedirs(os.path.join(root, "images", cname))
        for i in range(per_class):
            rel = f"{cname}/img{i}.jpg"
            cv2.imwrite(os.path.join(root, "images", rel),
                        (rng.rand(h, w, 3) * 255).astype(np.uint8))
            mask = np.zeros((h, w), np.uint8)
            mask[10:50, 20:60] = 1
            parts = np.zeros((3, 15))
            parts[0] = rng.randint(20, 60, 15)  # x
            parts[1] = rng.randint(10, 50, 15)  # y
            parts[2] = 1
            entries.append((rel, mask, parts))
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write(" ".join(class_lines))

    # build a struct array like <split>_cub_cleaned.mat
    images = np.zeros((len(entries),), dtype=[
        ("rel_path", "O"), ("mask", "O"), ("parts", "O"), ("bbox", "O")])
    for i, (rel, mask, parts) in enumerate(entries):
        bbox = np.zeros((1,), dtype=[("x1", "O"), ("y1", "O"), ("x2", "O"),
                                     ("y2", "O")])
        bbox[0] = (21, 11, 59, 49)
        images[i] = (rel, mask, parts, bbox)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    sio.savemat(os.path.join(root, "data", f"{split}_cub_cleaned.mat"),
                {"images": images})

    sfm = np.zeros((len(entries),), dtype=[
        ("scale", "O"), ("trans", "O"), ("rot", "O")])
    for i in range(len(entries)):
        sfm[i] = (np.float64(50.0), np.array([30.0, 30.0]), np.eye(3))
    os.makedirs(os.path.join(root, "sfm"), exist_ok=True)
    sio.savemat(os.path.join(root, "sfm", f"anno_{split}.mat"),
                {"sfm_anno": sfm})

    list_file = os.path.join(os.path.dirname(root),
                             f"cub_{split}_list.txt")
    with open(list_file, "w") as f:
        f.write(" ".join(str(c) for c in range(n_classes)))
    return list_file


def test_cub_train(tmp_path):
    root = str(tmp_path / "cub")
    os.makedirs(root)
    list_file = make_cub_tree(root)
    cfg = Config(dataset_name="cub", dataset_path=root, train_list=list_file,
                 img_size=32, batch_size=2, repeat=2, num_workers=2,
                 total_iters=1)
    from selfcorr_tpu.data.cub import CUBTrain
    ds = CUBTrain(cfg, num_shards=1, seed=0)
    assert len(ds.class_groups) == 2
    assert all(len(g) == 3 for g in ds.class_groups)
    item = ds.load_item(0, 1)
    assert item["img"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32)
    assert item["kp"].shape == (15, 3)
    assert item["sfm_pose"].shape == (7,)  # scale, trans2, quat4
    assert np.abs(item["kp"][:, :2]).max() <= 1.0 + 1e-6
    assert np.isfinite(item["foc_crop"]).all()
    plan = ds.sample_plan(0)
    assert len(plan) == 4


def test_cub_eval_end_to_end(tmp_path):
    """Full Tester pass on a fake CUB tree: mask mIoU + KP-transfer PCK
    must come out finite, and — reference parity — the pose fit must hit
    the DEFAULT fallback pose on every sample because CUB has no depth
    (tester.py:370-379 degenerates on the empty point set; eval_cub still
    renders the mask from that fallback, tester.py:233-241)."""
    import jax
    root = str(tmp_path / "cub")
    os.makedirs(root)
    list_file = make_cub_tree(root, n_classes=2, per_class=4, split="test")
    cfg = Config(dataset_name="cub", test_dataset_path=root,
                 test_list=list_file, img_size=32, corr_h=8, corr_w=8,
                 subdivide=1, batch_size=4, repeat=1, num_workers=2,
                 n_corr_feat=16, codedim=8, pretrain_k=8, use_pallas=False,
                 train=False, eval=True, eval_cub=True, shuffle_test=True,
                 dframe_eval=1, pose_fit_max_points=256,
                 depth_offset=5.0, checkpoint_dir=str(tmp_path), name="cubev",
                 vis_pred=True, vis_path=str(tmp_path / "vis"))
    from selfcorr_tpu.eval.tester import Tester
    tester = Tester(cfg)

    # pin the fallback-pose parity on one batch before the full run
    from selfcorr_tpu.data.loader import TestLoader
    from selfcorr_tpu.eval.tester import make_test_dataset
    loader_batch = next(iter(TestLoader(make_test_dataset(cfg), cfg)))
    _, fit = tester.predict_batch(loader_batch, jax.random.PRNGKey(0))
    assert not np.asarray(fit["ok"]).any()  # no depth -> every fit fails
    np.testing.assert_allclose(np.asarray(fit["scale_fit"]).ravel(), 0.1)
    np.testing.assert_allclose(np.asarray(fit["translation"])[:, 0, 2], 0.5)

    results = tester.test()
    assert "mIoU" in results and np.isfinite(results["mIoU"])
    assert 0.0 <= results["mIoU"] <= 1.0
    for k in ("kp@0.1", "kp@0.2"):
        assert k in results and np.isfinite(results[k])

    # keypoint-transfer panels (reference tester.py:270-279 triple)
    import glob
    vis = str(tmp_path / "vis")
    ones = glob.glob(os.path.join(vis, "*_1.png"))
    assert ones, "no KP source panels written"
    for p1 in ones:
        assert os.path.exists(p1.replace("_1.png", "_2.png"))
        assert os.path.exists(p1.replace("_1.png", "_2_gt.png"))
        im = cv2.imread(p1)
        assert im is not None and im.shape == (32, 32, 3)
