"""NOCS REAL275 dataset (train + test), host-side.

Parity with reference data/dataset_nocs.py and data/dataset_nocs_test.py:
a 'video' is one tracked object instance within one scene — instances are
discovered by parsing per-frame `*_meta.txt` files for the category id and
following the instance name across frames (dataset_nocs.py:42-99). Labels
come from `*_label.pkl` (rotation/translation/scale/bbox per instance).
Fixed REAL275 intrinsics (dataset_nocs.py:166-167). Crops use the labeled
2D bbox rather than the mask. Occlusion masks mark other objects' pixels
(dataset_nocs.py:154; note the reference test split computes occ AFTER
binarizing the mask — a bug not reproduced here).

Test split extras (dataset_nocs_test.py:54,101-110): GT rotation is flipped
by diag(1,-1,-1) on the right, and metric size comes from per-model extents
(obj_models/real_test.pkl) scaled by the label's scale factor.
"""
from __future__ import annotations

import glob
import os
import pickle

import numpy as np
import cv2

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.crops import (crop_resize, crop_intrinsics,
                                     to_ndc_intrinsics)

CATEGORY_IDS = {"bottle": 1, "bowl": 2, "camera": 3, "can": 4, "laptop": 5,
                "mug": 6}
REAL275_FOC = np.array([591.0125, 590.16775], np.float32)
REAL275_PP = np.array([322.525, 244.11084], np.float32)
# the reference truncates the intrinsics to ints (dataset_nocs.py:166-167)
REAL275_FOC_INT = np.floor(REAL275_FOC).astype(np.float32)
REAL275_PP_INT = np.floor(REAL275_PP).astype(np.float32)


def _index_instances(root: str, scene_names, category: str):
    """Track per-category object instances across frames of each scene."""
    cat_id = CATEGORY_IDS[category]
    scene_list = sorted(os.listdir(root))
    tracks = []
    for seq in scene_names:
        scene = scene_list[int(seq)]
        masks = glob.glob(os.path.join(root, scene, "*_mask.png"))
        masks.sort(key=lambda p: int(os.path.basename(p).split("_")[0]))
        per_obj: dict = {}
        for frame, mask_fn in enumerate(masks):
            with open(mask_fn.replace("_mask.png", "_meta.txt")) as f:
                for ln in f.read().strip().split("\n"):
                    parts = ln.split()
                    if int(parts[1]) == cat_id:
                        per_obj.setdefault(parts[2], []).append(
                            (frame, int(parts[0])))
        for obj_name, occurrences in per_obj.items():
            track = dict(name=obj_name, masks=[], metas=[])
            for frame, inst_id in occurrences:
                mask_fn = masks[frame]
                with open(mask_fn.replace("_mask.png", "_label.pkl"),
                          "rb") as f:
                    data = pickle.load(f)
                ids = list(data["instance_ids"])
                iid = ids.index(inst_id)
                track["masks"].append(mask_fn)
                track["metas"].append(dict(
                    rotation=np.array(data["rotations"][iid]),
                    translation=np.array(data["translations"][iid]),
                    scale=np.array(data["scales"][iid]),
                    bbox=np.array(data["bboxes"][iid]),
                    model=data["model_list"][iid],
                    inst_id=inst_id,
                ))
            track["imgs"] = [m.replace("_mask.png", "_color.png")
                             for m in track["masks"]]
            track["depths"] = [m.replace("_mask.png", "_depth.png")
                               for m in track["masks"]]
            tracks.append(track)
    return tracks


def _load_frame(track, fid, cfg: Config, rand_scale):
    img = cv2.imread(track["imgs"][fid])[:, :, ::-1].astype(np.float32) / 255.0
    mask_raw = cv2.imread(track["masks"][fid], cv2.IMREAD_GRAYSCALE)
    meta = track["metas"][fid]
    inst = meta["inst_id"]
    occ = ((mask_raw != inst) & (mask_raw != 255)).astype(np.float32)
    mask = (mask_raw == inst).astype(np.float32)
    depth = None
    if cfg.use_depth:
        depth = cv2.imread(track["depths"][fid], -1).astype(np.float32)

    bbox = meta["bbox"]  # (y0, x0, y1, x1)
    center = np.array([int((bbox[1] + bbox[3]) / 2),
                       int((bbox[0] + bbox[2]) / 2)], np.int64)
    length = np.array([int((bbox[3] - bbox[1]) / 2),
                       int((bbox[2] - bbox[0]) / 2)], np.int64)
    length = np.maximum(
        np.array([int(rand_scale[0] * length[0]),
                  int(rand_scale[1] * length[1])]), 1)

    out_size = cfg.img_size
    out = dict(
        img=crop_resize(img, center, length, out_size, "bilinear"),
        mask=crop_resize(mask, center, length, out_size, "nearest"),
        occ=crop_resize(occ, center, length, out_size, "nearest"),
        depth=(crop_resize(depth, center, length, out_size, "nearest")
               if depth is not None
               else np.zeros((out_size, out_size), np.float32)),
        center=center.astype(np.float32), length=length.astype(np.float32),
        foc=REAL275_FOC_INT, pp=REAL275_PP_INT,
    )
    foc_crop, pp_crop = crop_intrinsics(REAL275_FOC_INT, REAL275_PP_INT,
                                        center, length, out_size)
    out["foc_crop"], out["pp_crop"] = to_ndc_intrinsics(foc_crop, pp_crop,
                                                        out_size)
    return out


class NOCSTrain:
    def __init__(self, cfg: Config, num_shards: int = 1, seed: int = 0):
        self.cfg = cfg
        self.num_shards = num_shards
        with open(cfg.train_list) as f:
            scenes = f.read().strip().split()
        self.tracks = _index_instances(cfg.dataset_path, scenes, cfg.category)
        self.rng = np.random.RandomState(seed)

    def sample_plan(self, step: int):
        cfg = self.cfg
        plan = []
        for _ in range(self.num_shards):
            vids = self.rng.randint(0, len(self.tracks), size=cfg.batch_size)
            for vid in vids:
                n = len(self.tracks[int(vid)]["masks"])
                gap = max(n // cfg.repeat, 1)
                for i in range(cfg.repeat):
                    fid = min(gap * i + self.rng.randint(0, gap), n - 1)
                    plan.append((int(vid), int(fid)))
        return plan

    def load_item(self, vid: int, fid: int):
        scale = self.rng.uniform(1.1, 1.3, size=(2,))
        out = _load_frame(self.tracks[vid], fid, self.cfg, scale)
        out["idx"] = np.int32(vid)
        out["frame_idx"] = np.int32(fid)
        return out


class NOCSTest:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        with open(cfg.test_list) as f:
            scenes = f.read().strip().split()
        self.tracks = _index_instances(cfg.test_dataset_path, scenes,
                                       cfg.category)
        self.extents = self._load_extents()
        self.samples = []
        for vid in range(len(self.tracks)):
            for fid in range(0, len(self.tracks[vid]["masks"]),
                             cfg.dframe_eval):
                self.samples.append((vid, fid))

    def _load_extents(self):
        path = os.path.join(os.path.dirname(
            self.cfg.test_dataset_path.rstrip("/")), "obj_models",
            "real_test.pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            models = pickle.load(f)
        return {k: np.asarray(v).max(0) - np.asarray(v).min(0)
                for k, v in models.items()}

    def __len__(self):
        return len(self.samples)

    def read_original(self, vid: int, fid: int):
        """Full-resolution frame + instance mask for visualization
        paste-back (reference tester.py:495-500: masklist pixel == id)."""
        track = self.tracks[vid]
        img = cv2.imread(track["imgs"][fid])[:, :, ::-1].astype(
            np.float32) / 255.0
        mask_raw = cv2.imread(track["masks"][fid], cv2.IMREAD_GRAYSCALE)
        mask = (mask_raw == track["metas"][fid]["inst_id"]).astype(np.float32)
        depth = None
        if self.cfg.use_depth:
            depth = cv2.imread(track["depths"][fid], -1).astype(np.float32)
        return dict(img=img, mask=mask, depth=depth)

    def load_item(self, index: int):
        vid, fid = self.samples[index]
        out = _load_frame(self.tracks[vid], fid, self.cfg,
                          np.array([1.2, 1.2]))
        out["idx"] = np.int32(vid)
        out["frame_idx"] = np.int32(fid)
        meta = self.tracks[vid]["metas"][fid]
        if self.cfg.eval:
            rot = meta["rotation"] @ np.diag([1.0, -1.0, -1.0])
            if self.extents is not None and meta["model"] in self.extents:
                size = self.extents[meta["model"]] * meta["scale"]
            else:  # extents pkl unavailable: isotropic fallback
                size = np.ones(3) * np.asarray(meta["scale"]).reshape(-1)[0]
            out["rot_gt"] = rot.astype(np.float32)
            out["trans_gt"] = np.asarray(
                meta["translation"], np.float32).reshape(-1)
            out["scale_gt"] = np.asarray(size, np.float32).reshape(-1)
        return out
