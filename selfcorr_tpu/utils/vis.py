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


def kp_colormap(n: int) -> np.ndarray:
    """(n, 3) uint8 distinct BGR colors, one per keypoint index.

    Role of the reference's fixed ADE20K table (model/util/colormap.py,
    used by draw_kp at eval_utils.py:65); generated from an HSV wheel
    instead of copying the table — only distinctness matters for the
    keypoint panels."""
    hsv = np.zeros((1, n, 3), np.uint8)
    hsv[0, :, 0] = (np.arange(n) * 180 // max(n, 1)).astype(np.uint8)
    # alternate saturation/value so neighbouring hues stay separable
    hsv[0, :, 1] = np.where(np.arange(n) % 2 == 0, 255, 160)
    hsv[0, :, 2] = np.where(np.arange(n) % 3 == 0, 255, 200)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0]


def draw_kp(img1_01: np.ndarray, img2_01: np.ndarray, kps1: np.ndarray,
            kps2: np.ndarray, trans_kps2: np.ndarray, kp_mask: np.ndarray):
    """CUB keypoint-transfer panels (eval_utils.py:64-84, tester.py:270-279):
    returns BGR u8 (source image + source kps, target image + TRANSFERRED
    kps, target image + GT kps) — the reference's `_1/_2/_2_gt.png` triple.
    Keypoint xy are in [-1, 1]; one filled dot per visible-in-both keypoint,
    colored by keypoint index."""
    h, w = img1_01.shape[:2]
    colors = kp_colormap(kps1.shape[0])

    def to_pix(kps):
        return np.stack([(kps[:, 0] * 0.5 + 0.5) * w,
                         (kps[:, 1] * 0.5 + 0.5) * h], -1).astype(int)

    p1, p2, pt = to_pix(kps1), to_pix(kps2), to_pix(trans_kps2)
    out1, out2, outt = _to_bgr(img1_01), _to_bgr(img2_01), _to_bgr(img2_01)
    for i in range(kps1.shape[0]):
        if kp_mask[i] <= 0:
            continue
        c = tuple(int(x) for x in colors[i])
        cv2.circle(out1, tuple(p1[i]), 3, c, -1)
        cv2.circle(out2, tuple(p2[i]), 3, c, -1)
        cv2.circle(outt, tuple(pt[i]), 3, c, -1)
    return out1, outt, out2


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


def grid_point_colors(points_ndc: np.ndarray,
                      order: str = "cycle") -> np.ndarray:
    """Reference coloring of cycle/DINO point panels at 127*v+128 (RGB out;
    draw_point_set flips to BGR). order='cycle': the rotation-cycle panels
    use BGR=(0, y, x) i.e. RGB=(x, y, 0) (model.py:252-255); order='pt':
    the DINO pt_src/pt_tgt/pt_pred panels use BGR=(x, y, 0) i.e.
    RGB=(0, y, x) (model.py:279-280)."""
    p = np.asarray(points_ndc)
    x = np.clip(p[:, 0] * 127 + 128, 0, 255)
    y = np.clip(p[:, 1] * 127 + 128, 0, 255)
    zero = np.zeros_like(x)
    chans = [x, y, zero] if order == "cycle" else [zero, y, x]
    return np.stack(chans, -1).astype(np.uint8)


def project_pix(pts_cam: np.ndarray, pp: np.ndarray, foc: np.ndarray
                ) -> np.ndarray:
    """(N,3) camera-space -> (N,2) FULL-IMAGE pixel coords with pixel-unit
    intrinsics (the reference's in-place projection, tester.py:570-575)."""
    p = np.asarray(pts_cam, np.float64)
    z = np.where(np.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
    return np.stack([pp[0] + p[:, 0] * foc[0] / z,
                     pp[1] + p[:, 1] * foc[1] / z], -1)


def bbox_dir_points(bbox9: np.ndarray) -> np.ndarray:
    """(4,2->3) [center, x, y, z] axis-indicator points: face centers pulled
    to min-half-extent length (tester.py:504-517)."""
    b = np.asarray(bbox9, np.float64)
    cc = b[0]
    xx = b[[2, 4, 6, 8]].mean(0) - cc
    yy = b[[1, 2, 5, 6]].mean(0) - cc
    zz = b[[5, 6, 7, 8]].mean(0) - cc
    lens = [np.linalg.norm(v) for v in (xx, yy, zz)]
    d = min(lens)
    pts = [cc]
    for v, ln in zip((xx, yy, zz), lens):
        pts.append(v / max(ln, 1e-9) * d + cc)
    return np.stack(pts, 0)


def draw_bboxes_pix(img_bgr: np.ndarray, bbox9: np.ndarray, pp, foc,
                    color=(0, 0, 255), width: int = 3,
                    with_dirs: bool = True) -> np.ndarray:
    """Reference draw_bboxes on the ORIGINAL frame (eval_utils.py:301-328):
    ground layer at 0.3x color, pillars at 0.6x, top at full color, plus
    x/y/z axis lines in BGR red/green/blue. Mutates and returns img_bgr."""
    pts = np.int32(project_pix(bbox9, np.asarray(pp), np.asarray(foc)))
    cg = tuple(int(c * 0.3) for c in color)
    cp = tuple(int(c * 0.6) for c in color)
    for i, j in zip([3, 4, 8, 7], [4, 8, 7, 3]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), cg, width)
    for i, j in zip([1, 2, 5, 6], [3, 4, 7, 8]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), cp, width)
    for i, j in zip([1, 2, 6, 5], [2, 6, 5, 1]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), color, width)
    if with_dirs:
        dp = np.int32(project_pix(bbox_dir_points(bbox9), np.asarray(pp),
                                  np.asarray(foc)))
        for k, c in zip((1, 2, 3), ((0, 0, 255), (0, 255, 0), (255, 0, 0))):
            cv2.line(img_bgr, tuple(dp[0]), tuple(dp[k]), c, width)
    return img_bgr


def crop_box_pix(center, length, w: int, h: int):
    """Crop box [x1,x2,y1,y2] clipped to the frame plus the amount clipped
    on each side (the reference's edge handling, tester.py:546-560)."""
    cx, cy = int(round(float(center[0]))), int(round(float(center[1])))
    lx, ly = int(round(float(length[0]))), int(round(float(length[1])))
    x1, x2, y1, y2 = cx - lx, cx + lx, cy - ly, cy + ly
    clip_l = max(0, -x1)
    clip_r = max(0, x2 - (w - 1))
    clip_t = max(0, -y1)
    clip_b = max(0, y2 - (h - 1))
    return (max(x1, 0), min(x2, w - 1), max(y1, 0), min(y2, h - 1),
            clip_l, clip_r, clip_t, clip_b)


def paste_crop_panel(frame_bgr: np.ndarray, panel_bgr: np.ndarray,
                     center, length, mask_orig: np.ndarray | None = None,
                     mix: float = 0.7, dim: float = 1.0) -> np.ndarray:
    """Paste a crop-space panel back into the original frame: resize to the
    (2*lx, 2*ly) crop box, clip at frame edges, alpha-blend with `mix`, then
    (when mask_orig is given) keep the blend only on the object and dim the
    rest (tester.py:541-563)."""
    h, w = frame_bgr.shape[:2]
    out = frame_bgr.astype(np.float64).copy()
    lx = max(int(round(float(length[0]))), 1)
    ly = max(int(round(float(length[1]))), 1)
    pan = cv2.resize(panel_bgr, (2 * lx, 2 * ly),
                     interpolation=cv2.INTER_LINEAR).astype(np.float64)
    x1, x2, y1, y2, cl, cr, ct, cb = crop_box_pix(center, length, w, h)
    if x2 <= x1 or y2 <= y1:
        return frame_bgr
    pan = pan[ct: 2 * ly - cb, cl: 2 * lx - cr]
    pan = pan[: y2 - y1, : x2 - x1]
    out[y1: y1 + pan.shape[0], x1: x1 + pan.shape[1]] = \
        out[y1: y1 + pan.shape[0], x1: x1 + pan.shape[1]] * (1 - mix) \
        + pan * mix
    if mask_orig is not None:
        m = np.asarray(mask_orig, np.float64)
        if m.ndim == 2:
            m = m[..., None]
        out = out * m + frame_bgr.astype(np.float64) * (1 - m) * dim
    return np.clip(out, 0, 255).astype(np.uint8)


def draw_depth_diff(depth_diff: np.ndarray) -> np.ndarray:
    """Signed depth error: red where the estimate is too near
    (diff < 0), green where too far (model.py:208-214)."""
    d = np.asarray(depth_diff, np.float64)
    scale = max(np.abs(d).max(), 1e-9)
    red = np.clip(-d / scale, 0, 1)
    green = np.clip(d / scale, 0, 1)
    rgb = np.stack([red, green, np.zeros_like(d)], -1)
    return _to_bgr(rgb)


def _pred_v_ranges(pred_v: np.ndarray):
    """Per-axis (min, max) of the canonical mesh — the normalization box the
    reference uses for the match/imatch colorings (tester.py:518-523)."""
    return pred_v.min(0), pred_v.max(0)


def save_visualizations(out_dir: str, tag: str, batch, pred, fit, index: int,
                        cfg, orig=None, renders=None) -> None:
    """Write the enabled panels for one sample (tester.py vis flags).

    orig: optional dict(img=(H,W,3) float01 RGB, mask=(H,W) float,
    depth=(H,W)|None) — the ORIGINAL full-resolution frame. When present,
    panels are pasted back into it via the crop box (center/length carried
    in the batch), matching the reference's qualitative figures
    (tester.py:493-560). When absent, panels draw on the 256^2 crop.

    renders: optional dict of precomputed full-frame BGR u8 render panels
    ('depth'/'tex'/'mask', tester.py:629-688) — produced by the Tester's
    jitted debug render since vis.py is numpy/cv2-only.
    """
    import os
    os.makedirs(out_dir, exist_ok=True)
    i = index
    img = np.asarray(batch["img"][i])
    mask = np.asarray(batch["mask"][i])
    pp_c = np.asarray(batch["pp_crop"][i])
    foc_c = np.asarray(batch["foc_crop"][i])

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

    pred_v = np.asarray(pred["pred_v"][i])
    ranges = _pred_v_ranges(pred_v)
    bbox9 = np.asarray(fit["bbox9"][i]) if fit is not None else None

    if orig is not None:
        img_orig = np.asarray(orig["img"])
        mask_orig = orig.get("mask")
        h, w = img_orig.shape[:2]
        pp_f = np.asarray(batch["pp"][i])      # full-image pixel intrinsics
        foc_f = np.asarray(batch["foc"][i])
        center = np.asarray(batch["center"][i])
        length = np.asarray(batch["length"][i])
        frame_bgr = _to_bgr(img_orig)

        put("img", frame_bgr.copy())
        if bbox9 is not None and on("visualize_bbox"):
            put("bbox", draw_bboxes_pix(frame_bgr.copy(), bbox9, pp_f, foc_f))
        if on("visualize_match"):
            # crop-space canonical colors pasted into the frame, blended at
            # 0.7 and masked to the object (tester.py:539-563)
            panel = _to_bgr(colorize_canonical(
                np.asarray(pred["match"][i]), ranges))
            out = paste_crop_panel(frame_bgr, panel, center, length,
                                   mask_orig=mask_orig, mix=0.7, dim=1.0)
            if bbox9 is not None and getattr(cfg, "match_with_bbox", False):
                out = draw_bboxes_pix(out, bbox9, pp_f, foc_f)
            put("match", out)
        if on("visualize_imatch"):
            # vertex match points in FRAME coords via the crop box
            # (tester.py:584-597); RGB = canonical position over pred_v box
            out = frame_bgr.copy()
            x1 = center[0] - length[0]
            y1 = center[1] - length[1]
            pts = np.asarray(pred["imatch"][i], np.float64)
            px = (pts[:, 0] + 1) * length[0] + x1
            py = (pts[:, 1] + 1) * length[1] + y1
            cols = to_u8(colorize_canonical(pred_v, ranges))
            for vi in range(pts.shape[0]):
                c = cols[vi]
                cv2.circle(out, (int(px[vi]), int(py[vi])), 4,
                           (int(c[2]), int(c[1]), int(c[0])), -1)
            put("imatch", out)
        if on("visualize_gt") and "rot_gt" in batch:
            from selfcorr_tpu.eval.box3d import Box3D
            box_gt = Box3D.from_transformation(
                np.asarray(batch["rot_gt"][i]),
                np.asarray(batch["trans_gt"][i]),
                np.asarray(batch["scale_gt"][i]))
            put("gt", draw_bboxes_pix(frame_bgr.copy(), box_gt.vertices,
                                      pp_f, foc_f, color=(0, 255, 0)))
            if bbox9 is not None:
                save_bboxes_3d(os.path.join(out_dir, f"{tag}_3d.png"),
                               [bbox9, box_gt.vertices])
            if orig.get("depth") is not None:
                put("depth_gt", draw_depth(np.asarray(orig["depth"])))
        for name in ("depth", "tex", "mask"):
            if renders is not None and name in renders \
                    and on(f"visualize_{name}"):
                put(name, renders[name])
        if pred.get("match_conf") is not None and on("visualize_conf"):
            put("conf", draw_conf(np.asarray(pred["match_conf"][i])))
        if on("visualize_mesh"):
            from selfcorr_tpu.ops.mesh_ops import save_obj
            save_obj(os.path.join(out_dir, f"{tag}_mesh.obj"),
                     pred_v, np.asarray(pred["faces"]))
        return

    # ---- crop-space fallback (no original frame available) ----
    put("img", _to_bgr(img))
    if bbox9 is not None and on("visualize_bbox"):
        put("bbox", draw_bbox3d(img, bbox9, pp_c, foc_c))
    if on("visualize_match"):
        out_m = draw_match(img, np.asarray(pred["match"][i]), mask)
        if bbox9 is not None and getattr(cfg, "match_with_bbox", False):
            s = img.shape[0]
            pts = project_points(bbox9, pp_c, foc_c, s)
            # NDC-intrinsic projection, then the same layered box drawing
            out_m = _draw_box_edges_at(out_m, pts, bbox9)
        put("match", out_m)
    if on("visualize_imatch"):
        put("imatch", draw_imatch(img, np.asarray(pred["imatch"][i]),
                                  pred_v))
    if pred.get("match_conf") is not None and on("visualize_conf"):
        put("conf", draw_conf(np.asarray(pred["match_conf"][i])))
    if "depth" in batch and on("visualize_depth"):
        put("depth", draw_depth(np.asarray(batch["depth"][i]), mask))
    if on("visualize_mask"):
        put("mask", draw_mask(mask))
    if renders is not None and "tex" in renders and on("visualize_tex"):
        put("tex", renders["tex"])
    if on("visualize_gt") and "rot_gt" in batch:
        # GT oriented box (NOCS convention: column-acting R, metric units)
        from selfcorr_tpu.eval.box3d import Box3D
        box_gt = Box3D.from_transformation(
            np.asarray(batch["rot_gt"][i]), np.asarray(batch["trans_gt"][i]),
            np.asarray(batch["scale_gt"][i]))
        put("bbox_gt", draw_bbox3d(img, box_gt.vertices, pp_c, foc_c,
                                   color=(255, 0, 0)))
    if on("visualize_mesh"):
        from selfcorr_tpu.ops.mesh_ops import save_obj
        save_obj(os.path.join(out_dir, f"{tag}_mesh.obj"),
                 pred_v, np.asarray(pred["faces"]))


def _draw_box_edges_at(img_bgr: np.ndarray, pts2d: np.ndarray,
                       bbox9: np.ndarray, color=(0, 0, 255), width: int = 2
                       ) -> np.ndarray:
    """Layered box drawing at precomputed 2D points (crop-space
    match_with_bbox variant)."""
    pts = np.int32(pts2d)
    cg = tuple(int(c * 0.3) for c in color)
    cp = tuple(int(c * 0.6) for c in color)
    for i, j in zip([3, 4, 8, 7], [4, 8, 7, 3]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), cg, width)
    for i, j in zip([1, 2, 5, 6], [3, 4, 7, 8]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), cp, width)
    for i, j in zip([1, 2, 6, 5], [2, 6, 5, 1]):
        cv2.line(img_bgr, tuple(pts[i]), tuple(pts[j]), color, width)
    return img_bgr


def save_bboxes_3d(path: str, boxes, alpha: float = 30, beta: float = 12
                   ) -> None:
    """Matplotlib 3D box figure (eval_utils.py:331-358 draw_bboxes_3d):
    predicted + GT 9-corner boxes with the 12 cuboid edges."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection="3d")
    colors = ["r", "b", "g", "k"]
    for i, b in enumerate(boxes):
        b = np.asarray(b)
        ax.scatter(b[:, 0], b[:, 1], b[:, 2], c="r")
        for e0, e1 in BOX_EDGES:
            ax.plot(b[[e0, e1], 0], b[[e0, e1], 1], b[[e0, e1], 2],
                    linewidth=2, c=colors[i % len(colors)])
    ax.view_init(alpha, beta)
    plt.savefig(path)
    plt.close(fig)
