"""The per-strip face range must be conservative: every face that can
contribute coverage to a strip lies inside [start, end)."""
import numpy as np
import jax.numpy as jnp

from selfcorr_tpu.ops.rasterizer import pallas_raster as PR
from selfcorr_tpu.ops.rasterizer import common as C


def test_ranges_cover_all_contributing_faces():
    rng = np.random.RandomState(0)
    B, F, S = 3, 50, 32
    pad = float(np.sqrt(1e-3 * C.DIST_CUT))
    for trial in range(3):
        xy = rng.uniform(-1, 1, (B, F, 3, 2)) * rng.uniform(0.05, 1.0)
        z = 5.0 + rng.uniform(-1, 1, (B, F, 3, 1))
        fv = jnp.asarray(np.concatenate([xy, z], -1), np.float32)
        tex = jnp.ones((B, F, 3, 3), jnp.float32)
        consts = PR.pack_constants(fv, tex, tex)
        ranges = np.asarray(PR.compute_row_ranges(consts, S, pad))
        cn = np.asarray(consts)
        ymin = cn[..., PR.S_BBOX + 2]
        ymax = cn[..., PR.S_BBOX + 3]
        n_rows = S // PR.TR
        for b in range(B):
            for k in range(n_rows):
                y_hi = (S - 1.0 - 2.0 * (k * PR.TR)) / S
                y_lo = (S - 1.0 - 2.0 * (k * PR.TR + PR.TR - 1)) / S
                overlaps = (ymin[b] <= y_hi + pad) & (ymax[b] >= y_lo - pad)
                idx = np.where(overlaps)[0]
                if len(idx) == 0:
                    continue
                s, e = ranges[b, k]
                assert idx.min() >= s and idx.max() < e, \
                    (trial, b, k, s, e, idx.min(), idx.max())


def test_ranges_empty_far_strips():
    # a tiny face near y=0: strips at the top/bottom must get empty ranges
    fv = jnp.asarray([[[[0.0, 0.0, 5.0], [0.05, 0.0, 5.0],
                        [0.0, 0.05, 5.0]]]], jnp.float32)
    tex = jnp.ones((1, 1, 3, 3), jnp.float32)
    consts = PR.pack_constants(fv, tex, tex)
    ranges = np.asarray(PR.compute_row_ranges(consts, 256, 0.1))
    n_empty = int((ranges[0, :, 0] >= ranges[0, :, 1]).sum())
    assert n_empty > 20  # most of the 32 strips see no face
