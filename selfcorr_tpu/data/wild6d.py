"""Wild6D dataset (train + test), host-side.

Directory layout and semantics follow the reference
(data/dataset_wild6d.py:36-182, data/dataset_wild6d_test.py:35-210):
  <root>/<object>/<seq>/images/{N}.jpg, {N}-mask.png, {N}-depth.png
  <root>/<object>/<seq>/metadata              (JSON: K (transposed), w, h, fps)
  test: <...>/pkl_annotations/<cat>/<cat>-<object>-<seq>.pkl with per-frame
  GT rotation / translation / size.

Train sampling plan (dataset_wild6d.py:99-112): per iteration pick
`batch_size` random videos and `repeat` strided+jittered frames per video;
the plan is precomputed, seeded, and laid out [shard, video, frame] so the
batch-pairing contract holds per device shard.
"""
from __future__ import annotations

import glob
import json
import os
import pickle

import numpy as np
import cv2

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.crops import crop_frame


class Wild6DVideos:
    """Index of videos: frame paths + intrinsics."""

    def __init__(self, root: str, video_list_file: str):
        with open(video_list_file) as f:
            names = f.read().strip().split()
        self.videos = []
        # directories only, so stray files (README, .DS_Store) can't shift
        # the index mapping; scripts/gen_lists.py enumerates the same way
        obj_list = sorted(d for d in os.listdir(root)
                          if os.path.isdir(os.path.join(root, d)))
        for seqname in names:
            parts = seqname.split("_")
            obj_index, seq_index = int(parts[-2]), int(parts[-1])
            obj = obj_list[obj_index]
            seq_list = sorted(d for d in os.listdir(os.path.join(root, obj))
                              if os.path.isdir(os.path.join(root, obj, d)))
            seq = seq_list[seq_index]
            seq_dir = os.path.join(root, obj, seq)
            masks = glob.glob(os.path.join(seq_dir, "images/*-mask.png"))
            masks.sort(key=lambda p: int(os.path.basename(p).split("-")[0]))
            meta = json.load(open(os.path.join(seq_dir, "metadata")))
            K = np.array(meta["K"]).reshape(3, 3).T if "K" in meta else None
            self.videos.append(dict(
                obj=obj, seq=seq,
                masks=masks,
                imgs=[m.replace("-mask.png", ".jpg") for m in masks],
                depths=[m.replace("-mask.png", "-depth.png") for m in masks],
                K=K,
            ))

    def __len__(self):
        return len(self.videos)

    def num_frames(self, vid: int) -> int:
        return len(self.videos[vid]["masks"])

    def read_frame(self, vid: int, fid: int, use_depth: bool):
        v = self.videos[vid]
        img = cv2.imread(v["imgs"][fid])[:, :, ::-1].astype(np.float32) / 255.0
        mask = cv2.imread(v["masks"][fid], cv2.IMREAD_GRAYSCALE) > 0
        depth = None
        if use_depth:
            depth = cv2.imread(v["depths"][fid], -1).astype(np.float32)
        K = v["K"]
        foc = np.array([K[0, 0], K[1, 1]], np.float32)
        pp = np.array([K[0, 2], K[1, 2]], np.float32)
        return img, mask, depth, foc, pp


class Wild6DTrain:
    def __init__(self, cfg: Config, num_shards: int = 1, seed: int = 0):
        self.cfg = cfg
        self.num_shards = num_shards
        self.videos = Wild6DVideos(cfg.dataset_path, cfg.train_list)
        self.rng = np.random.RandomState(seed)

    def sample_plan(self, step: int):
        """[(video, frame)] laid out shard-major, video-major, frame-minor."""
        cfg = self.cfg
        plan = []
        for _ in range(self.num_shards):
            vids = self.rng.randint(0, len(self.videos), size=cfg.batch_size)
            for vid in vids:
                n = self.videos.num_frames(int(vid))
                gap = max(n // cfg.repeat, 1)
                for i in range(cfg.repeat):
                    fid = min(gap * i + self.rng.randint(0, gap), n - 1)
                    plan.append((int(vid), int(fid)))
        return plan

    def load_item(self, vid: int, fid: int):
        cfg = self.cfg
        img, mask, depth, foc, pp = self.videos.read_frame(
            vid, fid, cfg.use_depth)
        scale = self.rng.uniform(1.2, 1.5, size=(2,))
        out = crop_frame(img, mask, depth, foc, pp, cfg.img_size, scale,
                         no_stretch=cfg.no_stretch)
        out["idx"] = np.int32(vid)
        out["frame_idx"] = np.int32(fid)
        out["occ"] = np.zeros_like(out["mask"])
        return out


class Wild6DTest:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.videos = Wild6DVideos(cfg.test_dataset_path, cfg.test_list)
        self.gt = self._load_gt() if cfg.eval else None
        self.samples = []
        for vid in range(len(self.videos)):
            for fid in range(0, self.videos.num_frames(vid), cfg.dframe_eval):
                self.samples.append((vid, fid))

    def _load_gt(self):
        cfg = self.cfg
        root = cfg.test_dataset_path
        prefix = root.rfind("test_set") + 9
        cat = root[prefix:].strip("/")
        gt = []
        for v in self.videos.videos:
            path = os.path.join(root[:prefix], "pkl_annotations", cat,
                                f"{cat}-{v['obj']}-{v['seq']}.pkl")
            with open(path, "rb") as f:
                data = pickle.load(f)
            gt.append([dict(rotation=np.array(a["rotation"]),
                            translation=np.array(a["translation"]),
                            size=np.array(a["size"]))
                       for a in data["annotations"]])
        return gt

    def __len__(self):
        return len(self.samples)

    def read_original(self, vid: int, fid: int):
        """Full-resolution frame for visualization paste-back
        (reference tester.py:493-497 re-reads dataset.imglist/masklist)."""
        img, mask, depth, _, _ = self.videos.read_frame(
            vid, fid, self.cfg.use_depth)
        return dict(img=img, mask=mask.astype(np.float32), depth=depth)

    def load_item(self, index: int):
        cfg = self.cfg
        vid, fid = self.samples[index]
        img, mask, depth, foc, pp = self.videos.read_frame(
            vid, fid, cfg.use_depth)
        out = crop_frame(img, mask, depth, foc, pp, cfg.img_size,
                         np.array([1.35, 1.35]))
        out["idx"] = np.int32(vid)
        out["frame_idx"] = np.int32(fid)
        out["occ"] = np.zeros_like(out["mask"])
        if self.gt is not None:
            g = self.gt[vid][fid]
            out["rot_gt"] = g["rotation"].astype(np.float32)
            out["trans_gt"] = g["translation"].astype(np.float32).reshape(-1)
            out["scale_gt"] = g["size"].astype(np.float32)
        return out
