"""Structural-waste analysis for the fused rasterizer (PERF.md round-4
'what WOULD move it' follow-up): BEFORE rewriting the kernel around a new
tile/chunk geometry, predict the live (tile, chunk) pair cost of each
candidate from the chunk bboxes alone.

Cost model: the kernel's per-pair work is FF face-vregs of (TR*TC<=1024 px)
chain arithmetic, so total VPU work ∝ sum over live pairs of FF * (TR*TC/1024)
(a half-size tile halves per-pair work; a half-size chunk halves it too).
Live = chunk bbox (padded by the sigma2 cutoff radius) overlaps the tile box.
This is exactly compute_chunk_info's bbox test, evaluated for candidate
(TR, TC, FF) geometries on the two bench_raster scenes.

CPU-only, numpy. Run: python scripts/analyze_tile_waste.py
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
from selfcorr_tpu.ops.rasterizer import common as C


def face_bboxes(fv):
    """(B,F,3,3) verts -> per-face xmin,xmax,ymin,ymax (matches
    pack_face_constants' bbox slots)."""
    x = fv[..., 0]
    y = fv[..., 1]
    return (x.min(-1), x.max(-1), y.min(-1), y.max(-1))


def sort_faces(fv, n_bands=64):
    """pack_constants' band-major / x-minor order (pallas_raster.py)."""
    ymin, ymax = fv[..., 1].min(-1), fv[..., 1].max(-1)
    xmin, xmax = fv[..., 0].min(-1), fv[..., 0].max(-1)
    ycen = (ymin + ymax) * 0.5
    xcen = (xmin + xmax) * 0.5
    band = np.floor((ycen + 1.0) / (2.0 / n_bands))
    xn = np.clip((xcen + 1.0) * 0.5, 0.0, 1.0)
    key = band + 0.25 * xn
    order = np.argsort(key, axis=-1, kind="stable")
    return np.take_along_axis(fv, order[..., None, None], axis=1)


def pair_cost(fv, image_size, pad, tr, tc, ff):
    """Sum over live (tile, chunk) pairs of the per-pair work, in units of
    one face-(8x128)-vreg chain eval (the current kernel's per-pair cost is
    FF=16 of these)."""
    b, f = fv.shape[:2]
    f_pad = -(-f // ff) * ff
    xmin, xmax, ymin, ymax = face_bboxes(fv)
    if f_pad != f:
        padv = np.full((b, f_pad - f), 1e9, np.float32)
        xmin = np.concatenate([xmin, padv], 1)
        xmax = np.concatenate([xmax, -padv], 1)
        ymin = np.concatenate([ymin, padv], 1)
        ymax = np.concatenate([ymax, -padv], 1)
    nc = f_pad // ff
    cxmin = xmin.reshape(b, nc, ff).min(-1)
    cxmax = xmax.reshape(b, nc, ff).max(-1)
    cymin = ymin.reshape(b, nc, ff).min(-1)
    cymax = ymax.reshape(b, nc, ff).max(-1)

    s = image_size
    n_rows = s // tr
    n_cols = s // tc
    k = np.arange(n_rows, dtype=np.float64)
    y_hi = (s - 1.0 - 2.0 * (k * tr)) / s + pad
    y_lo = (s - 1.0 - 2.0 * (k * tr + tr - 1)) / s - pad
    c = np.arange(n_cols, dtype=np.float64)
    x_lo = (2.0 * (c * tc) + 1.0 - s) / s - pad
    x_hi = (2.0 * ((c + 1.0) * tc - 1.0) + 1.0 - s) / s + pad

    ov_y = ((cymin[:, None, :] <= y_hi[None, :, None])
            & (cymax[:, None, :] >= y_lo[None, :, None]))
    ov_x = ((cxmin[:, None, :] <= x_hi[None, :, None])
            & (cxmax[:, None, :] >= x_lo[None, :, None]))
    ov = ov_y[:, :, None, :] & ov_x[:, None, :, :]
    pairs = int(ov.sum())
    # work per pair: ff faces, each over tr*tc pixels; one face-vreg unit
    # is 8*128 px
    cost = pairs * ff * (tr * tc) / (8 * 128)
    return pairs, cost


def main():
    s = 256
    pad = math.sqrt(1e-3 * C.DIST_CUT)   # sigma2 cutoff radius (NDC)
    geoms = [
        ("8x128 (current)", 8, 128),
        ("16x64 (lane-split)", 16, 64),
        ("32x32 (4-way split)", 32, 32),
        ("64x16 (8-way split)", 64, 16),
        ("16x128 (taller)", 16, 128),
    ]
    for name, fv_fn in [("scattered", scattered_scene), ("ico", ico_scene)]:
        fv, _ = fv_fn()
        fv = sort_faces(np.asarray(fv))
        print(f"-- scene {name}: B={fv.shape[0]} F={fv.shape[1]} @ {s}^2, "
              f"pad={pad:.4f}")
        _, base = pair_cost(fv, s, pad, 8, 128, 16)   # current kernel
        for gname, tr, tc in geoms:
            for ff in (8, 16, 32):
                pairs, cost = pair_cost(fv, s, pad, tr, tc, ff)
                print(f"  {gname:>20} FF={ff:<3} live pairs {pairs:>8} "
                      f"work {cost:>10.0f} vreg-units  "
                      f"rel {cost / base:>5.2f}")
        print()


if __name__ == "__main__":
    main()
