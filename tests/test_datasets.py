"""Dataset pipelines exercised against synthetic on-disk directory trees
matching the reference layouts."""
import json
import os
import pickle

import numpy as np
import cv2
import pytest

from selfcorr_tpu.configs import Config


def make_wild6d_tree(root, n_videos=2, n_frames=4, hw=(64, 80)):
    h, w = hw
    rng = np.random.RandomState(0)
    names = []
    for obj_i in range(n_videos):
        obj = f"obj{obj_i}"
        seq = "seq0"
        d = os.path.join(root, obj, seq, "images")
        os.makedirs(d)
        for f in range(n_frames):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            mask = np.zeros((h, w), np.uint8)
            mask[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 255
            depth = (rng.rand(h, w) * 1000).astype(np.uint16)
            cv2.imwrite(os.path.join(d, f"{f}.jpg"), img)
            cv2.imwrite(os.path.join(d, f"{f}-mask.png"), mask)
            cv2.imwrite(os.path.join(d, f"{f}-depth.png"), depth)
        K = np.array([[100.0, 0, 0], [0, 100.0, 0],
                      [w / 2, h / 2, 1.0]])  # stored transposed (metadata K.T)
        meta = dict(K=K.reshape(-1).tolist(), w=w, h=h, fps=30)
        with open(os.path.join(root, obj, seq, "metadata"), "w") as fh:
            json.dump(meta, fh)
        names.append(f"video_{obj_i}_0")
    list_file = os.path.join(os.path.dirname(root), "train_list.txt")
    with open(list_file, "w") as fh:
        fh.write("\n".join(names))
    return list_file


def test_wild6d_train(tmp_path):
    root = str(tmp_path / "w6d")
    os.makedirs(root)
    list_file = make_wild6d_tree(root)
    cfg = Config(dataset_name="Wild6D", dataset_path=root,
                 train_list=list_file, img_size=32, batch_size=2, repeat=2,
                 use_depth=True, total_iters=2, num_workers=2)
    from selfcorr_tpu.data.wild6d import Wild6DTrain
    from selfcorr_tpu.data.loader import TrainLoader
    ds = Wild6DTrain(cfg, num_shards=1, seed=0)
    assert len(ds.videos) == 2
    loader = TrainLoader(ds, cfg)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 32, 32, 3)
    assert batch["depth"].shape == (4, 32, 32)
    assert np.isfinite(batch["foc_crop"]).all()
    assert batch["mask"].max() == 1.0
    # intrinsics in NDC units: |pp| should be within a couple units
    assert np.abs(batch["pp_crop"]).max() < 5
    loader.close()


def test_wild6d_test_fixture(tmp_path):
    """Wild6DTest against the generated on-disk fixture (VERDICT r4 item 6):
    directory/list resolution, dframe_eval striding, pkl GT parsing
    (rotation/translation/size passthrough — Wild6D GT has NO flip, unlike
    NOCS's diag(1,-1,-1); reference dataset_wild6d_test.py:100-117 stores
    the pkl values verbatim), metric depth survival through the uint16-mm
    PNG roundtrip, and crop intrinsics."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.gen_wild6d_fixture import generate, _gt_pose
    from selfcorr_tpu.data.synthetic import SyntheticVideos

    root = str(tmp_path / "w6dfix")
    generate(root, cat="laptop", n_train_videos=1, n_test_videos=2,
             frames_per_video=2, test_frames=5, raw_size=96, seed=0)
    test_root = os.path.join(root, "test_set", "laptop")
    list_file = str(tmp_path / "test_list.txt")
    from scripts.gen_lists import main as gen_lists_main
    assert gen_lists_main(test_root, list_file) == 0

    cfg = Config(dataset_name="Wild6D", test_dataset_path=test_root + "/",
                 test_list=list_file, img_size=32, use_depth=True,
                 eval=True, dframe_eval=2, train=False)
    from selfcorr_tpu.data.wild6d import Wild6DTest
    ds = Wild6DTest(cfg)
    # striding: 5 frames at dframe_eval=2 -> frames 0, 2, 4 per video
    assert ds.samples == [(0, 0), (0, 2), (0, 4), (1, 0), (1, 2), (1, 4)]

    ref = SyntheticVideos(2, 5, raw_size=96, seed=0, shape="duo")
    for idx in (1, 4):  # (vid 0, fid 2) and (vid 1, fid 0)
        vid, fid = ds.samples[idx]
        it = ds.load_item(idx)
        assert it["img"].shape == (32, 32, 3)
        assert it["idx"] == vid and it["frame_idx"] == fid
        # GT passthrough: exact values written to the pkl
        R, t, size = _gt_pose(ref, vid, fid)
        np.testing.assert_allclose(it["rot_gt"], R, atol=1e-6)
        np.testing.assert_allclose(it["trans_gt"], t, atol=1e-6)
        np.testing.assert_allclose(it["scale_gt"], size, atol=1e-6)
        # depth in mm through the uint16 PNG: crop pixels within 1 mm of
        # the ray tracer's, intrinsics finite NDC
        img, mask, depth, foc, pp = ref.render_frame(vid, fid)
        assert it["depth"][it["mask"] > 0].min() > 1000  # z0 >= 4 m
        assert np.isfinite(it["foc_crop"]).all()
        assert np.abs(it["pp_crop"]).max() < 5
        orig = ds.read_original(vid, fid)
        assert np.abs(orig["depth"] - depth).max() <= 1.0
        assert (orig["mask"] > 0.5).sum() == mask.sum()


def make_nocs_tree(root, n_frames=3, hw=(48, 64)):
    h, w = hw
    rng = np.random.RandomState(1)
    scene = os.path.join(root, "scene_1")
    os.makedirs(scene)
    for f in range(n_frames):
        mask = np.full((h, w), 255, np.uint8)
        mask[10:30, 20:50] = 7  # instance id 7
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        depth = (rng.rand(h, w) * 1000).astype(np.uint16)
        base = os.path.join(scene, f"{f:04d}")
        cv2.imwrite(base + "_mask.png", mask)
        cv2.imwrite(base + "_color.png", img)
        cv2.imwrite(base + "_depth.png", depth)
        with open(base + "_meta.txt", "w") as fh:
            fh.write("7 5 laptop_norm\n")  # inst 7, class 5 (laptop)
        label = dict(instance_ids=[7], class_ids=[5],
                     model_list=["laptop_norm"],
                     rotations=[np.eye(3)], translations=[np.zeros(3)],
                     scales=[np.float32(1.0)],
                     bboxes=[np.array([10, 20, 30, 50])])
        with open(base + "_label.pkl", "wb") as fh:
            pickle.dump(label, fh)
    list_file = os.path.join(os.path.dirname(root), "list.txt")
    with open(list_file, "w") as fh:
        fh.write("0")
    return list_file


def test_nocs_train_and_test(tmp_path):
    root = str(tmp_path / "real")
    os.makedirs(root)
    list_file = make_nocs_tree(root)
    cfg = Config(dataset_name="nocs", category="laptop", dataset_path=root,
                 train_list=list_file, test_dataset_path=root,
                 test_list=list_file, img_size=32, batch_size=1, repeat=2,
                 use_depth=True, use_occ=True, eval=True, dframe_eval=1,
                 num_workers=2)
    from selfcorr_tpu.data.nocs import NOCSTrain, NOCSTest
    tr = NOCSTrain(cfg, num_shards=1, seed=0)
    assert len(tr.tracks) == 1
    item = tr.load_item(0, 1)
    assert item["img"].shape == (32, 32, 3)
    assert item["occ"].shape == (32, 32)
    assert item["mask"].max() == 1.0

    te = NOCSTest(cfg)
    assert len(te) == 3
    it = te.load_item(0)
    assert "rot_gt" in it
    # GT rotation flip: R @ diag(1,-1,-1)
    np.testing.assert_allclose(it["rot_gt"], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-6)
    assert it["scale_gt"].shape == (3,)


def test_synthetic_duo_geometry():
    """The 'duo' synthetic family: union rendering + GT pose consistency.

    Back-projecting the rendered depth at the GT pose must land every
    surface point ON one of the two ellipsoid lobes, and inside the
    canonical box whose (center, size) feed trans_gt/scale_gt."""
    from selfcorr_tpu.data.synthetic import SyntheticVideos

    vids = SyntheticVideos(num_videos=2, frames_per_video=4, raw_size=96,
                           seed=3, shape="duo")
    img, mask, depth, foc, pp = vids.render_frame(0, 1)
    assert mask.any() and (depth[mask] > 0).all()

    theta = vids.phase[0] + 2 * np.pi * 1 / vids.n_frames
    from selfcorr_tpu.data.synthetic import _rot_x, _rot_y
    R = _rot_x(vids.tilt[0]) @ _rot_y(theta)
    c = np.array([0.0, 0.0, vids.z0[0]])

    ys, xs = np.meshgrid(np.arange(96) + 0.5, np.arange(96) + 0.5,
                         indexing="ij")
    t = depth / 1000.0
    pts = np.stack([(xs - pp[0]) / foc[0] * t,
                    (ys - pp[1]) / foc[1] * t, t], -1)[mask]
    obj = (pts - c) @ R  # R^T p, row vectors

    # on the union surface: min over lobes of | |A(obj-cb)| - 1 | ~ 0
    err = np.inf
    for r, cb in vids.parts(0):
        q = np.linalg.norm((obj - cb) / r, axis=-1)
        err = np.minimum(err, np.abs(q - 1.0))
    assert err.max() < 1e-3, err.max()

    cb0, size = vids.canonical_box(0)
    u = np.abs((obj - cb0) / (size / 2.0))
    assert u.max() <= 1.0 + 1e-6

    # asymmetric: the small lobe makes +x extent exceed -x extent
    assert size[0] > size[1] and size[0] > size[2]

    # GT transform maps the canonical box center onto the camera-frame
    # centroid used by eval (trans_gt = R @ cb0 + c)
    trans_gt = R @ cb0 + c
    assert np.linalg.norm((obj - cb0).mean(0)) < size.max()  # sanity
    np.testing.assert_allclose(trans_gt, R @ cb0 + c)


def test_synthetic_ellipsoid_unchanged():
    """shape='ellipsoid' must reproduce the original single-lobe frames
    (regression guard for the union refactor)."""
    from selfcorr_tpu.data.synthetic import SyntheticVideos
    vids = SyntheticVideos(num_videos=1, frames_per_video=2, raw_size=64,
                           seed=0)
    img, mask, depth, foc, pp = vids.render_frame(0, 0)
    assert vids.parts(0)[0][1].sum() == 0.0
    assert len(vids.parts(0)) == 1
    cb0, size = vids.canonical_box(0)
    np.testing.assert_allclose(cb0, 0.0, atol=1e-12)
    np.testing.assert_allclose(size, 2 * vids.radii[0])
    assert mask.any()


def test_synthetic_mix_family():
    """shape='mix' (VERDICT r4 item 5: multi-family pretrain stream): even
    videos render EXACTLY like the duo family, odd videos exactly like the
    plain ellipsoid — the odd videos' second lobe is coincident with the
    first, so n_parts stays 2 for the device-synth tables."""
    from selfcorr_tpu.data.synthetic import SyntheticVideos
    kw = dict(num_videos=4, frames_per_video=3, raw_size=64, seed=3)
    mix = SyntheticVideos(shape="mix", **kw)
    duo = SyntheticVideos(shape="duo", **kw)
    ell = SyntheticVideos(shape="ellipsoid", **kw)
    for vid, ref in [(0, duo), (2, duo), (1, ell), (3, ell)]:
        a = mix.render_frame(vid, 1)
        b = ref.render_frame(vid, 1)
        for x, y in zip(a[:3], b[:3]):  # img, mask, depth
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       atol=1e-6)
        np.testing.assert_allclose(mix.canonical_box(vid)[1],
                                   ref.canonical_box(vid)[1])
    assert all(len(mix.parts(v)) == 2 for v in range(4))
