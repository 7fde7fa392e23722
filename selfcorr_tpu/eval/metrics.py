"""NOCS-style pose metrics + CUB keypoint transfer.

Parity with reference model/util/eval_utils.py:134-197 (exact 3D IoU with an
18-fold y-rotation sweep for rotationally symmetric categories; degree/cm
errors) and :39-60 (keypoint transfer through dense match fields).
"""
from __future__ import annotations

import numpy as np

from selfcorr_tpu.eval.box3d import Box3D, box_iou


def _axis_angle_matrix(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def best_iou(symmetry_idx: int, box_pred: Box3D, rot_gt, trans_gt, scale_gt,
             division: int = 18) -> float:
    """Exact IoU; y-symmetric categories take the best over `division`
    rotations of the GT about its own y axis (eval_utils.py:134-178).
    Uses the native C++ clipper (eval/box3d_native.py) when available."""
    from selfcorr_tpu.eval import box3d_native as native

    if symmetry_idx == 0:
        y_axis = rot_gt[:, 1].copy()
        cands = np.stack([
            Box3D.from_transformation(
                _axis_angle_matrix(y_axis, i * 2 * np.pi / division) @ rot_gt,
                trans_gt, scale_gt).vertices
            for i in range(division)])
        if native.available():
            return native.iou_max(box_pred.vertices, cands)
        return max(box_iou(box_pred, Box3D(c)) for c in cands)
    box_gt = Box3D.from_transformation(rot_gt, trans_gt, scale_gt)
    if native.available():
        return native.iou(box_pred.vertices, box_gt.vertices)
    return box_iou(box_pred, box_gt)


def deg_cm_error(symmetry_idx: int, box_pred: Box3D, rot_gt, trans_gt,
                 scale_gt):
    """(angle deg, translation cm). Translation error uses the box center;
    symmetric categories compare only the y axes (eval_utils.py:181-197)."""
    trans_error = 100.0 * np.linalg.norm(box_pred.vertices[0] - trans_gt)
    if symmetry_idx == 0:
        box_gt = Box3D.from_transformation(rot_gt, trans_gt, scale_gt)
        y_gt = box_gt.vertices[3] - box_gt.vertices[1]
        y_pred = box_pred.vertices[3] - box_pred.vertices[1]
        cosang = y_pred @ y_gt / (np.linalg.norm(y_pred) * np.linalg.norm(y_gt))
        angle = np.arccos(np.clip(cosang, -1.0, 1.0))
    else:
        R = box_pred.rotation @ rot_gt.T
        angle = np.arccos(np.clip((np.trace(R) - 1) / 2, -1.0, 1.0))
    return float(np.degrees(angle)), float(trans_error)


class NocsAccumulator:
    """IoU@{0.25,0.5} and {5,10}deg x {2,5}cm bucket accuracy
    (tester.py:152-155,187-196)."""
    IOU_THRESH = (0.25, 0.5)
    DEG_CM = ((5, 2), (5, 5), (10, 2), (10, 5))

    def __init__(self, symmetry_idx: int):
        self.symmetry_idx = symmetry_idx
        self.iou_hits = []
        self.degcm_hits = []
        self.raw = []  # (iou, deg, cm) per sample — diagnostics

    def add(self, bbox9_pred: np.ndarray, rot_gt, trans_gt, scale_gt):
        box_pred = Box3D(bbox9_pred)
        iou = best_iou(self.symmetry_idx, box_pred, rot_gt, trans_gt, scale_gt)
        ang, cm = deg_cm_error(self.symmetry_idx, box_pred, rot_gt, trans_gt,
                               scale_gt)
        self.iou_hits.append([iou >= t for t in self.IOU_THRESH])
        self.degcm_hits.append([(ang < d and cm < c) for d, c in self.DEG_CM])
        self.raw.append([float(iou), float(ang), float(cm)])

    def summary(self):
        iou = np.asarray(self.iou_hits, np.float64)
        dc = np.asarray(self.degcm_hits, np.float64)
        raw = np.asarray(self.raw, np.float64)
        return {
            "iou@25": iou[:, 0].mean() if len(iou) else 0.0,
            "iou@50": iou[:, 1].mean() if len(iou) else 0.0,
            "5deg2cm": dc[:, 0].mean() if len(dc) else 0.0,
            "5deg5cm": dc[:, 1].mean() if len(dc) else 0.0,
            "10deg2cm": dc[:, 2].mean() if len(dc) else 0.0,
            "10deg5cm": dc[:, 3].mean() if len(dc) else 0.0,
            # diagnostic medians (not reference channels, aid debugging)
            "median_iou": float(np.median(raw[:, 0])) if len(raw) else 0.0,
            "median_deg": float(np.median(raw[:, 1])) if len(raw) else 0.0,
            "median_cm": float(np.median(raw[:, 2])) if len(raw) else 0.0,
            "count": len(iou),
        }


def mask_iou(mask_gt: np.ndarray, mask_pred: np.ndarray) -> np.ndarray:
    """(B, H, W) -> (B,) intersection over union (tester.py:232-241)."""
    inter = (mask_gt * mask_pred).sum(axis=(1, 2))
    union = (mask_gt + mask_pred - mask_gt * mask_pred).sum(axis=(1, 2))
    return inter / np.maximum(union, 1e-9)


def map_kp(kps_vis1, kps_vis2, kps1, kps2, match1, match2, mask1, mask2):
    """Keypoint transfer via dense 3D match fields (eval_utils.py:39-60).

    kps*: (B, K, 3) with xy in [-1,1] + visibility; match*: (B, H, W, 3)
    NHWC canonical-coordinate maps; masks (B, H, W).
    Returns (transfer_kps (B,K,2), error (B,K), min_dist, kp_mask).
    """
    b, k = kps1.shape[:2]
    h, w = match2.shape[1:3]
    kp_mask = kps_vis1 * kps_vis2

    # sample match1 at kps1 (bilinear, align_corners=False convention)
    import jax.numpy as jnp
    from selfcorr_tpu.ops.image_ops import grid_sample
    kps1_3d = np.asarray(grid_sample(jnp.asarray(match1),
                                     jnp.asarray(kps1[..., :2])))  # (B,K,3)

    m2 = match2.reshape(b, h * w, 3)
    d = np.linalg.norm(kps1_3d[:, :, None, :] - m2[:, None, :, :], axis=-1)
    d = d + (1.0 - mask2.reshape(b, 1, h * w)) * 1000.0
    min_idx = d.argmin(axis=2)
    min_dist = np.take_along_axis(d, min_idx[..., None], 2)[..., 0]
    min_dist = min_dist + (1.0 - kps_vis1) * 1000.0
    tx = (min_idx % w).astype(np.float64) * 2 / w - 1
    ty = (min_idx // w).astype(np.float64) * 2 / h - 1
    transfer = np.stack([tx, ty], axis=-1)
    err = np.linalg.norm(transfer - kps2[..., :2], axis=-1)
    return transfer, err, min_dist, kp_mask
