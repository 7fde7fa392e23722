"""Mask-driven square/stretch crops + intrinsics adjustment (host numpy/cv2).

Parity with the reference crop pipeline (data/dataset_wild6d.py:122-166):
bbox from mask, random (train) or fixed (test) scale, bilinear image /
nearest mask+depth resize, and crop-space intrinsics
  foc_crop = foc * (S/2) / length,
  pp_crop  = (pp - (center - length)) * (S/2) / length.
"""
from __future__ import annotations

import numpy as np
import cv2


def mask_bbox(mask: np.ndarray):
    """(H, W) bool -> center (2,), half-length (2,) in (x, y) order."""
    ys, xs = np.where(mask > 0)
    cx = (xs.max() + xs.min()) // 2
    cy = (ys.max() + ys.min()) // 2
    lx = (xs.max() - xs.min()) // 2
    ly = (ys.max() - ys.min()) // 2
    return np.array([cx, cy], np.int64), np.array([lx, ly], np.int64)


def scaled_lengths(length, scale, no_stretch: bool):
    if no_stretch:
        m = int(scale[0] * max(length[0], length[1]))
        return np.array([m, m], np.int64)
    return np.array([int(scale[0] * length[0]), int(scale[1] * length[1])],
                    np.int64)


def crop_resize(img: np.ndarray, center, length, out_size: int,
                interp: str) -> np.ndarray:
    """Crop [center - length, center + length) (zero-padded at borders) and
    resize to (out_size, out_size). img: (H, W[, C])."""
    h, w = img.shape[:2]
    x0, y0 = int(center[0] - length[0]), int(center[1] - length[1])
    x1, y1 = int(center[0] + length[0]), int(center[1] + length[1])
    cw, ch = x1 - x0, y1 - y0
    if cw <= 0 or ch <= 0:
        shape = (out_size, out_size) + img.shape[2:]
        return np.zeros(shape, img.dtype)
    pad_shape = (ch, cw) + img.shape[2:]
    patch = np.zeros(pad_shape, img.dtype)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x1, w), min(y1, h)
    patch[sy0 - y0: sy1 - y0, sx0 - x0: sx1 - x0] = img[sy0:sy1, sx0:sx1]
    flag = cv2.INTER_LINEAR if interp == "bilinear" else cv2.INTER_NEAREST
    return cv2.resize(patch, (out_size, out_size), interpolation=flag)


def crop_intrinsics(foc, pp, center, length, out_size: int):
    cf = np.array([out_size / 2.0 / length[0], out_size / 2.0 / length[1]])
    foc_crop = np.asarray(foc, np.float64) * cf
    pp_crop = (np.asarray(pp, np.float64)
               - (np.asarray(center) - np.asarray(length))) * cf
    return foc_crop.astype(np.float32), pp_crop.astype(np.float32)


def to_ndc_intrinsics(foc_crop, pp_crop, out_size: int):
    """Pixel-unit crop intrinsics -> NDC units (trainer.py:98-101)."""
    pp_ndc = pp_crop / (out_size / 2.0) - 1.0
    foc_ndc = foc_crop / (out_size / 2.0)
    return foc_ndc.astype(np.float32), pp_ndc.astype(np.float32)


def crop_frame(img, mask, depth, foc, pp, out_size: int, scale,
               no_stretch: bool = False):
    """Full per-frame crop pipeline; returns a dict of numpy arrays.

    img (H,W,3) float [0,1]; mask (H,W) bool; depth (H,W) or None.
    scale: (2,) crop scale factors (train: U(1.2,1.5); test: 1.35).
    """
    center, length0 = mask_bbox(mask)
    length = scaled_lengths(length0, scale, no_stretch)
    length = np.maximum(length, 1)
    img_c = crop_resize(img.astype(np.float32), center, length, out_size,
                        "bilinear")
    mask_c = crop_resize(mask.astype(np.float32), center, length, out_size,
                         "nearest")
    depth_c = (crop_resize(depth.astype(np.float32), center, length, out_size,
                           "nearest") if depth is not None
               else np.zeros((out_size, out_size), np.float32))
    foc_crop, pp_crop = crop_intrinsics(foc, pp, center, length, out_size)
    foc_ndc, pp_ndc = to_ndc_intrinsics(foc_crop, pp_crop, out_size)
    return dict(img=img_c, mask=mask_c, depth=depth_c,
                center=center.astype(np.float32),
                length=length.astype(np.float32),
                foc=np.asarray(foc, np.float32),
                pp=np.asarray(pp, np.float32),
                foc_crop=foc_ndc, pp_crop=pp_ndc)
