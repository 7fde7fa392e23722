"""Face-SORT sweep for the fused rasterizer's chunk culling (companion to
analyze_tile_waste.py, PERF.md round 4).

A chunk's bbox is the UNION of its FF consecutive faces' bboxes, so the
face sort order directly controls the live-(tile, chunk)-pair work that the
calibrated cost model says is ~81% of kernel time — and the sort happens
ONCE per step outside the kernel (pack_constants), so a better order is a
zero-kernel-change win. This script scores candidate orders with the same
bbox-overlap cost model, at the shipped lane-split geometry (16x64, FF=16).

CPU-only. Run: python scripts/analyze_face_sort.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import math
import numpy as np

from scripts.bench_raster import scattered_scene, ico_scene
from scripts.analyze_tile_waste import pair_cost
from selfcorr_tpu.ops.rasterizer import common as C


def _centers(fv):
    ymin, ymax = fv[..., 1].min(-1), fv[..., 1].max(-1)
    xmin, xmax = fv[..., 0].min(-1), fv[..., 0].max(-1)
    return (xmin + xmax) * 0.5, (ymin + ymax) * 0.5


def _apply(fv, order):
    return np.take_along_axis(fv, order[..., None, None], axis=1)


def sort_band_x(fv, n_bands):
    """pack_constants' band-major / x-minor order."""
    xc, yc = _centers(fv)
    band = np.floor((yc + 1.0) / (2.0 / n_bands))
    xn = np.clip((xc + 1.0) * 0.5, 0.0, 1.0)
    return _apply(fv, np.argsort(band + 0.25 * xn, axis=-1, kind="stable"))


def sort_morton(fv, bits=8):
    """Morton (Z-order) on quantized centers: recursive 2x2 locality."""
    xc, yc = _centers(fv)
    n = 1 << bits
    xi = np.clip(((xc + 1.0) * 0.5 * n).astype(np.int64), 0, n - 1)
    yi = np.clip(((yc + 1.0) * 0.5 * n).astype(np.int64), 0, n - 1)
    key = np.zeros_like(xi)
    for i in range(bits):
        key |= ((xi >> i) & 1) << (2 * i)
        key |= ((yi >> i) & 1) << (2 * i + 1)
    return _apply(fv, np.argsort(key, axis=-1, kind="stable"))


def sort_hilbert(fv, bits=8):
    """Hilbert curve on quantized centers: no Z-order jump seams."""
    xc, yc = _centers(fv)
    n = 1 << bits
    xi = np.clip(((xc + 1.0) * 0.5 * n).astype(np.int64), 0, n - 1)
    yi = np.clip(((yc + 1.0) * 0.5 * n).astype(np.int64), 0, n - 1)
    rx_ry_swap = xi.copy(), yi.copy()
    x, y = rx_ry_swap
    d = np.zeros_like(x)
    s = n // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s //= 2
    return _apply(fv, np.argsort(d, axis=-1, kind="stable"))


def sort_tilegrid_x(fv, tr_px, tc_px, s_img):
    """Tile-aligned: major = the (tile-row, tile-col) cell of the face
    center in the ACTUAL kernel tile grid, minor = x. Chunks then pack
    faces that share a destination tile."""
    xc, yc = _centers(fv)
    row = np.clip(((1.0 - yc) * 0.5 * s_img / tr_px).astype(np.int64),
                  0, s_img // tr_px - 1)
    col = np.clip(((xc + 1.0) * 0.5 * s_img / tc_px).astype(np.int64),
                  0, s_img // tc_px - 1)
    xn = np.clip((xc + 1.0) * 0.5, 0.0, 1.0)
    key = (row * (s_img // tc_px) + col) + 0.25 * xn
    return _apply(fv, np.argsort(key, axis=-1, kind="stable"))


def main():
    s = 256
    pad = math.sqrt(1e-3 * C.DIST_CUT)
    tr, tc, ff = 16, 64, 16   # shipped lane-split geometry
    sorts = [
        ("band64+x (current)", lambda fv: sort_band_x(fv, 64)),
        ("band16+x", lambda fv: sort_band_x(fv, 16)),
        ("band32+x", lambda fv: sort_band_x(fv, 32)),
        ("band128+x", lambda fv: sort_band_x(fv, 128)),
        ("morton8", lambda fv: sort_morton(fv, 8)),
        ("hilbert8", lambda fv: sort_hilbert(fv, 8)),
        ("tilegrid16x64+x", lambda fv: sort_tilegrid_x(fv, tr, tc, s)),
    ]
    for name, fv_fn in [("scattered", scattered_scene), ("ico", ico_scene)]:
        fv, _ = fv_fn()
        fv = np.asarray(fv)
        print(f"-- scene {name}: B={fv.shape[0]} F={fv.shape[1]} @ {s}^2")
        base = None
        for sname, fn in sorts:
            pairs, cost = pair_cost(fn(fv), s, pad, tr, tc, ff)
            if base is None:
                base = cost
            print(f"  {sname:>20} live pairs {pairs:>8} work {cost:>9.0f} "
                  f"rel {cost / base:>5.2f}")
        print()


if __name__ == "__main__":
    main()
