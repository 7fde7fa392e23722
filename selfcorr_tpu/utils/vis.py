"""Prediction visualizations (host-side cv2), mirroring the reference's
visualize modes (tester.py:461-688): projected 3D bounding boxes, match /
imatch overlays, confidence, depth, texture and mask panels.

All functions take numpy arrays (images NHWC float [0,1], single-sample
slices) and return uint8 BGR images ready for cv2.imwrite.
"""
from __future__ import annotations

import numpy as np
import cv2

# 3D box corner connectivity (center + 8 corners, z-fastest order — see
# eval/box3d.UNIT_CORNERS): 12 edges of the cuboid
BOX_EDGES = [
    (1, 2), (1, 3), (2, 4), (3, 4),   # x = min face
    (5, 6), (5, 7), (6, 8), (7, 8),   # x = max face
    (1, 5), (2, 6), (3, 7), (4, 8),   # connecting edges
]


def to_u8(img01: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)


def _to_bgr(img01: np.ndarray) -> np.ndarray:
    return to_u8(img01)[:, :, ::-1].copy()


def project_points(pts_cam: np.ndarray, pp: np.ndarray, foc: np.ndarray,
                   img_size: int) -> np.ndarray:
    """(N,3) camera-space -> (N,2) pixel coords (NDC intrinsics)."""
    z = np.maximum(pts_cam[:, 2], 1e-6)
    x = pp[0] + pts_cam[:, 0] * foc[0] / z
    y = pp[1] + pts_cam[:, 1] * foc[1] / z
    return (np.stack([x, y], -1) + 1.0) * (img_size / 2.0)


def draw_bbox3d(img01: np.ndarray, bbox9_cam: np.ndarray, pp, foc,
                color=(0, 255, 0)) -> np.ndarray:
    """Overlay the projected oriented 3D box (bbox9 in camera space, meters).
    Depth is in meters while intrinsics expect the depth unit used at fit
    time; the projection is unit-agnostic (x/z)."""
    s = img01.shape[0]
    out = _to_bgr(img01)
    pts = project_points(np.asarray(bbox9_cam), np.asarray(pp),
                         np.asarray(foc), s).astype(int)
    for a, b in BOX_EDGES:
        cv2.line(out, tuple(pts[a]), tuple(pts[b]), color, 2)
    cv2.circle(out, tuple(pts[0]), 3, (0, 0, 255), -1)
    return out


def colorize_canonical(coords: np.ndarray, ranges=None) -> np.ndarray:
    """Canonical xyz -> rgb in [0,1] by min-max normalization per axis
    (model.py:165-186 convention). `ranges` = (lo, hi) normalizes with an
    external box (the reference uses pred_v's extents for match/match_gt)."""
    c = np.asarray(coords, np.float64)
    if ranges is None:
        flat = c.reshape(-1, 3)
        lo = flat.min(0)
        hi = flat.max(0)
    else:
        lo, hi = np.asarray(ranges[0]), np.asarray(ranges[1])
    out = (c - lo) / np.maximum(hi - lo, 1e-9)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def draw_match(img01: np.ndarray, match: np.ndarray, mask: np.ndarray,
               ranges=None) -> np.ndarray:
    """Per-pixel canonical-coordinate visualization masked to the object."""
    rgb = colorize_canonical(match, ranges)
    over = np.where(mask[..., None] > 0, rgb, img01 * 0.3)
    return _to_bgr(over)


def draw_imatch(img01: np.ndarray, imatch: np.ndarray, pred_v: np.ndarray,
                weight: np.ndarray | None = None) -> np.ndarray:
    """Vertex match points colored by canonical position (model.py:190-205)."""
    s = img01.shape[0]
    out = _to_bgr(img01)
    colors = to_u8(colorize_canonical(pred_v))
    pts = ((np.asarray(imatch) + 1.0) * (s / 2.0)).astype(int)
    for i, (x, y) in enumerate(pts):
        if weight is not None and weight[i] < 0.5:
            continue
        c = colors[i]
        cv2.circle(out, (int(x), int(y)), 2,
                   (int(c[2]), int(c[1]), int(c[0])), -1)
    return out


def draw_conf(conf: np.ndarray) -> np.ndarray:
    return cv2.applyColorMap(to_u8(conf), cv2.COLORMAP_JET)


def draw_depth(depth: np.ndarray, mask: np.ndarray | None = None
               ) -> np.ndarray:
    d = np.asarray(depth, np.float64).copy()
    if mask is not None and (mask > 0).any():
        d[mask <= 0] = d[mask > 0].max()
    lo, hi = d.min(), d.max()
    d01 = (d - lo) / max(hi - lo, 1e-9)
    return cv2.applyColorMap(to_u8(d01), cv2.COLORMAP_VIRIDIS)


def draw_mask(mask: np.ndarray) -> np.ndarray:
    return to_u8(np.repeat(np.asarray(mask)[..., None], 3, -1))


def draw_point_set(points: np.ndarray, colors_u8: np.ndarray,
                   weights: np.ndarray | None = None, size: int = 256,
                   base: np.ndarray | None = None, blend: float = 0.0
                   ) -> np.ndarray:
    """Circles at NDC points on a white canvas (or `base` image blended in
    with `blend`), RGB colors per point, skipping weight < 0.5 entries —
    the reference's point-panel style (model.py:186-205, 241-260, 267-290).
    """
    canvas = np.full((size, size, 3), 255.0)
    if base is not None:
        canvas = (1.0 - blend) * canvas + blend * to_u8(base).astype(float)
    canvas = canvas.astype(np.uint8)[:, :, ::-1].copy()  # BGR
    pts = ((np.asarray(points) + 1.0) * (size / 2.0)).astype(int)
    for i, (x, y) in enumerate(pts):
        if weights is not None and weights[i] < 0.5:
            continue
        c = colors_u8[i]
        cv2.circle(canvas, (int(x), int(y)), 3,
                   (int(c[2]), int(c[1]), int(c[0])), -1)
    return canvas


def grid_point_colors(points_ndc: np.ndarray) -> np.ndarray:
    """Reference coloring of cycle/DINO point panels: (x, y) -> (g, r)
    channels at 127*v+128 (model.py:252-255, 278-280)."""
    p = np.asarray(points_ndc)
    r = np.clip(p[:, 0] * 127 + 128, 0, 255)
    g = np.clip(p[:, 1] * 127 + 128, 0, 255)
    return np.stack([r, g, np.zeros_like(r)], -1).astype(np.uint8)


def draw_depth_diff(depth_diff: np.ndarray) -> np.ndarray:
    """Signed depth error: red where the estimate is too near
    (diff < 0), green where too far (model.py:208-214)."""
    d = np.asarray(depth_diff, np.float64)
    scale = max(np.abs(d).max(), 1e-9)
    red = np.clip(-d / scale, 0, 1)
    green = np.clip(d / scale, 0, 1)
    rgb = np.stack([red, green, np.zeros_like(d)], -1)
    return _to_bgr(rgb)


def save_visualizations(out_dir: str, tag: str, batch, pred, fit, index: int,
                        cfg) -> None:
    """Write the enabled panels for one sample (tester.py vis flags)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    i = index
    img = np.asarray(batch["img"][i])
    mask = np.asarray(batch["mask"][i])
    pp = np.asarray(batch["pp_crop"][i])
    foc = np.asarray(batch["foc_crop"][i])

    def put(name, im):
        cv2.imwrite(os.path.join(out_dir, f"{tag}_{name}.png"), im)

    # individual --visualize_* flags select panels; plain --vis_pred renders
    # everything (tester.py:39-49)
    any_specific = any(getattr(cfg, f, False) for f in (
        "visualize_bbox", "visualize_match", "visualize_imatch",
        "visualize_conf", "visualize_depth", "visualize_mask",
        "visualize_tex", "visualize_mesh", "visualize_gt"))

    def on(flag):
        return (not any_specific) or getattr(cfg, flag, False)

    put("img", _to_bgr(img))
    if fit is not None and on("visualize_bbox"):
        bbox9 = np.asarray(fit["bbox9"][i])
        put("bbox", draw_bbox3d(img, bbox9, pp, foc))
    if on("visualize_match"):
        put("match", draw_match(img, np.asarray(pred["match"][i]), mask))
    if on("visualize_imatch"):
        put("imatch", draw_imatch(img, np.asarray(pred["imatch"][i]),
                                  np.asarray(pred["pred_v"][i])))
    if pred.get("match_conf") is not None and on("visualize_conf"):
        put("conf", draw_conf(np.asarray(pred["match_conf"][i])))
    if "depth" in batch and on("visualize_depth"):
        put("depth", draw_depth(np.asarray(batch["depth"][i]), mask))
    if on("visualize_mask"):
        put("mask", draw_mask(mask))
    if on("visualize_gt") and "rot_gt" in batch:
        # GT oriented box (NOCS convention: column-acting R, metric units)
        from selfcorr_tpu.eval.box3d import Box3D
        box_gt = Box3D.from_transformation(
            np.asarray(batch["rot_gt"][i]), np.asarray(batch["trans_gt"][i]),
            np.asarray(batch["scale_gt"][i]))
        put("bbox_gt", draw_bbox3d(img, box_gt.vertices, pp, foc,
                                   color=(255, 0, 0)))
    if on("visualize_mesh"):
        from selfcorr_tpu.ops.mesh_ops import save_obj
        import os as _os
        save_obj(_os.path.join(out_dir, f"{tag}_mesh.obj"),
                 np.asarray(pred["pred_v"][i]), np.asarray(pred["faces"]))
