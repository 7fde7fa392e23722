#!/usr/bin/env python
"""Render the procedural synthetic scenes into the reference's EXACT Wild6D
on-disk layout, so the shipped CLI (scripts/train.sh + scripts/predict.sh)
can be driven end-to-end without the real download (VERDICT r4 item 1).

Layout written (mirrors /root/reference/data/dataset_wild6d.py:55-75 and
dataset_wild6d_test.py:65-117):

  <root>/<cat>/<obj>/<seq>/images/{N}.jpg            RGB frame (jpeg)
  <root>/<cat>/<obj>/<seq>/images/{N}-mask.png       0/255 uint8 mask
  <root>/<cat>/<obj>/<seq>/images/{N}-depth.png      uint16 depth in mm
  <root>/<cat>/<obj>/<seq>/metadata                  JSON {K (transposed,
                                                     row-major flat), w, h,
                                                     fps}
  <root>/test_set/<cat>/... (same per-video layout)
  <root>/test_set/pkl_annotations/<cat>/<cat>-<obj>-<seq>.pkl
      {"annotations": [{"name": "<cat>/<obj>/<seq>/<frame>",
                        "rotation": (3,3), "translation": (3,),
                        "size": (3,)}, ...]}  one entry per frame

The scenes are the 'duo' ray-traced family from data/synthetic.py with
exact GT poses, so `predict.sh --eval --eval_nocs` produces meaningful
(finite) NOCS metrics against the pkl annotations.

Usage:
  python scripts/gen_wild6d_fixture.py /tmp/wild6d_fixture [--cat laptop]
Then:
  scripts/train.sh laptop /tmp/wild6d_fixture fixture-run --total_iters 200
  scripts/predict.sh laptop /tmp/wild6d_fixture log/fixture-run/ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_video(seq_dir: str, videos, vid: int, jpg_quality: int = 95):
    """Write one synthetic video's frames + metadata under seq_dir."""
    img_dir = os.path.join(seq_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    foc = pp = None
    for fid in range(videos.num_frames(vid)):
        img, mask, depth, foc, pp = videos.render_frame(vid, fid)
        bgr = (np.clip(img[:, :, ::-1], 0.0, 1.0) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{fid}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, jpg_quality])
        cv2.imwrite(os.path.join(img_dir, f"{fid}-mask.png"),
                    (mask.astype(np.uint8)) * 255)
        cv2.imwrite(os.path.join(img_dir, f"{fid}-depth.png"),
                    np.round(depth).astype(np.uint16))
    s = videos.raw
    K = np.array([[foc[0], 0, pp[0]], [0, foc[1], pp[1]], [0, 0, 1.0]])
    # metadata stores K TRANSPOSED: both loaders do reshape(3,3).T
    # (dataset_wild6d.py:71, selfcorr_tpu/data/wild6d.py:51)
    meta = dict(K=K.T.reshape(-1).tolist(), w=s, h=s, fps=30)
    with open(os.path.join(seq_dir, "metadata"), "w") as f:
        json.dump(meta, f)


def _gt_pose(videos, vid: int, fid: int):
    """Exact ray-tracer GT in the test-pkl convention (same math as
    data/synthetic.py SyntheticTest.load_item): column-acting R,
    metric translation of the canonical-box center, metric size."""
    from selfcorr_tpu.data.synthetic import _rot_x, _rot_y
    theta = videos.phase[vid] + 2 * np.pi * fid / videos.n_frames
    R = _rot_x(videos.tilt[vid]) @ _rot_y(theta)
    cb0, size = videos.canonical_box(vid)
    trans = R @ cb0 + np.array([0.0, 0.0, videos.z0[vid]])
    return R.astype(np.float64), trans.astype(np.float64), \
        np.asarray(size, np.float64)


def generate(root: str, cat: str = "laptop", n_train_videos: int = 4,
             n_test_videos: int = 2, frames_per_video: int = 24,
             test_frames: int = 6, raw_size: int = 320, seed: int = 0):
    """Create the full fixture tree; returns (train_root, test_root)."""
    from selfcorr_tpu.data.synthetic import SyntheticVideos

    train_root = os.path.join(root, cat)
    test_root = os.path.join(root, "test_set", cat)
    pkl_dir = os.path.join(root, "test_set", "pkl_annotations", cat)
    os.makedirs(pkl_dir, exist_ok=True)

    train_videos = SyntheticVideos(n_train_videos, frames_per_video,
                                   raw_size=raw_size, seed=seed, shape="duo")
    for vid in range(n_train_videos):
        # zero-padded names keep sorted() == index order (the list files
        # index the SORTED directory listing, dataset_wild6d.py:55-56)
        seq_dir = os.path.join(train_root, f"obj{vid:02d}", "seq00")
        _write_video(seq_dir, train_videos, vid)
        print(f"train video {vid}: {seq_dir} ({frames_per_video} frames)")

    # test split: SAME instance family (same seed => same objects as train;
    # a from-scratch fixture run cannot show cross-instance generalization),
    # fewer frames
    test_videos = SyntheticVideos(n_test_videos, test_frames,
                                  raw_size=raw_size, seed=seed, shape="duo")
    for vid in range(n_test_videos):
        obj, seq = f"obj{vid:02d}", "seq00"
        seq_dir = os.path.join(test_root, obj, seq)
        _write_video(seq_dir, test_videos, vid)
        annos = []
        for fid in range(test_frames):
            R, t, size = _gt_pose(test_videos, vid, fid)
            annos.append(dict(name=f"{cat}/{obj}/{seq}/{fid}",
                              rotation=R, translation=t, size=size))
        with open(os.path.join(pkl_dir, f"{cat}-{obj}-{seq}.pkl"),
                  "wb") as f:
            pickle.dump({"annotations": annos}, f)
        print(f"test video {vid}: {seq_dir} ({test_frames} frames + pkl GT)")
    return train_root, test_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="fixture root (plays /data/Wild6D)")
    ap.add_argument("--cat", default="laptop")
    ap.add_argument("--n_train_videos", type=int, default=4)
    ap.add_argument("--n_test_videos", type=int, default=2)
    ap.add_argument("--frames_per_video", type=int, default=24)
    ap.add_argument("--test_frames", type=int, default=6)
    ap.add_argument("--raw_size", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.root, args.cat, args.n_train_videos, args.n_test_videos,
             args.frames_per_video, args.test_frames, args.raw_size,
             args.seed)
    print(f"fixture complete at {args.root}")


if __name__ == "__main__":
    main()
