"""The precomputed per-(strip, column-tile) chunk culling must be
conservative: every face that can contribute coverage to a tile lies in a
chunk whose mask bit is set and whose id lies inside the loop span."""
import numpy as np
import jax.numpy as jnp

from selfcorr_tpu.ops.rasterizer import pallas_raster as PR
from selfcorr_tpu.ops.rasterizer import common as C


def _unflatten(spans, masks, s, tc, nc):
    """compute_chunk_info returns 2-D (B, R*C*{2,W}) arrays (SMEM last-dim
    padding, see its docstring); give the tests a (B, R, C, .) view."""
    n_rows, n_cols = s // PR.TR, s // tc
    w = -(-nc // 32)
    return (np.asarray(spans).reshape(-1, n_rows, n_cols, 2),
            np.asarray(masks).reshape(-1, n_rows, n_cols, w))


def _decode(spans, masks, b, r, c, nc):
    """Set of chunk ids the kernel would actually process."""
    out = set()
    s0, s1 = int(spans[b, r, c, 0]), int(spans[b, r, c, 1])
    for ci in range(s0, s1):
        word = int(np.uint32(masks[b, r, c, ci // 32]))
        if (word >> (ci % 32)) & 1:
            out.add(ci)
    return out


def test_chunk_info_covers_all_contributing_faces():
    rng = np.random.RandomState(0)
    B, F, S = 3, 50, 32
    pad = float(np.sqrt(1e-3 * C.DIST_CUT))
    tc = min(PR.TC, S)
    for trial in range(3):
        xy = rng.uniform(-1, 1, (B, F, 3, 2)) * rng.uniform(0.05, 1.0)
        z = 5.0 + rng.uniform(-1, 1, (B, F, 3, 1))
        fv = jnp.asarray(np.concatenate([xy, z], -1), np.float32)
        tex = jnp.ones((B, F, 3, 3), jnp.float32)
        consts = PR.pack_constants(fv, tex, tex)
        spans, masks = PR.compute_chunk_info(consts, S, pad)
        cn = np.asarray(consts)
        nc = cn.shape[1] // PR.FF
        spans, masks = _unflatten(spans, masks, S, tc, nc)
        xmin = cn[..., PR.S_BBOX + 0]
        xmax = cn[..., PR.S_BBOX + 1]
        ymin = cn[..., PR.S_BBOX + 2]
        ymax = cn[..., PR.S_BBOX + 3]
        n_rows, n_cols = S // PR.TR, S // tc
        for b in range(B):
            for k in range(n_rows):
                y_hi = (S - 1.0 - 2.0 * (k * PR.TR)) / S
                y_lo = (S - 1.0 - 2.0 * (k * PR.TR + PR.TR - 1)) / S
                for cidx in range(n_cols):
                    x_lo = (2.0 * (cidx * tc) + 1.0 - S) / S
                    x_hi = (2.0 * ((cidx + 1) * tc - 1.0) + 1.0 - S) / S
                    keep = _decode(spans, masks, b, k, cidx, nc)
                    ov = ((ymin[b] <= y_hi + pad) & (ymax[b] >= y_lo - pad)
                          & (xmin[b] <= x_hi + pad) & (xmax[b] >= x_lo - pad))
                    need = {fi // PR.FF for fi in np.where(ov)[0]}
                    assert need <= keep, (trial, b, k, cidx,
                                          sorted(need - keep))


def test_chunk_info_culls_far_tiles():
    # a tiny face near y=0: most (strip, tile) pairs must process nothing
    fv = jnp.asarray([[[[0.0, 0.0, 5.0], [0.05, 0.0, 5.0],
                        [0.0, 0.05, 5.0]]]], jnp.float32)
    tex = jnp.ones((1, 1, 3, 3), jnp.float32)
    consts = PR.pack_constants(fv, tex, tex)
    spans, masks = PR.compute_chunk_info(consts, 256, 0.1)
    nc = consts.shape[1] // PR.FF
    spans, masks = _unflatten(spans, masks, 256, min(PR.TC, 256), nc)
    n_live = sum(
        1
        for r in range(spans.shape[1])
        for c in range(spans.shape[2])
        if _decode(spans, masks, 0, r, c, nc))
    total = spans.shape[1] * spans.shape[2]
    assert n_live < total - 40, (n_live, total)  # most of 64 tiles empty


def test_chunk_info_x_cull():
    """A face hugging the left edge must be culled from right-column tiles
    (the x-miss cull the row-range scheme could not express)."""
    fv = jnp.asarray([[[[-0.95, 0.0, 5.0], [-0.9, 0.0, 5.0],
                        [-0.95, 0.05, 5.0]]]], jnp.float32)
    tex = jnp.ones((1, 1, 3, 3), jnp.float32)
    S = 256  # two 128-wide column tiles
    consts = PR.pack_constants(fv, tex, tex)
    spans, masks = PR.compute_chunk_info(consts, S, 0.05)
    nc = consts.shape[1] // PR.FF
    spans, masks = _unflatten(spans, masks, S, min(PR.TC, S), nc)
    left = sum(bool(_decode(spans, masks, 0, r, 0, nc))
               for r in range(spans.shape[1]))
    right = sum(bool(_decode(spans, masks, 0, r, 1, nc))
                for r in range(spans.shape[1]))
    assert left >= 1
    assert right == 0
