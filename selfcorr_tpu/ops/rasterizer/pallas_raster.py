"""Fused soft-rasterizer Pallas TPU kernels.

One streaming pass over (pixel-tile x face-chunk) pairs computes ALL FOUR
render passes the training step needs (the reference launches four separate
CUDA rasterizations, model/module/renderer.py:13-26,38-73):

  alpha1  sigma=1e-4 'prod' coverage  -> mask_render == depth_mask == match_mask
  depth   softmax(gamma=1e-4) camera-z, white bg
  alpha2  sigma=1e-3 coverage         -> tex_mask
  tex     softmax(gamma=1e-2) rgb, white bg
  match   hard nearest-face rgb (forward-only; reference renders detached)

They share the signed euclidean distance / barycentric geometry, so the fused
kernel costs ~1.3x ONE pass instead of 4x. Both coverage sigmas reuse one
distance; only the sigmoids/softmaxes differ.

Streaming design (per grid step = one (batch, 8x128-pixel tile)):
  * per-face constants for the whole mesh live in VMEM (F x 128 f32);
  * a fori_loop walks 16-face chunks carrying running softmax (max, sum,
    accumulator) + coverage products + hard-z winner — the same running-max
    trick as the CUDA kernel (kernel.cu:437-451) so state is O(pixels);
  * chunk culling is EXACT and precomputed (compute_chunk_info): per
    (batch, row-strip, column-tile) a scalar-prefetched bitmask + loop span
    reject every chunk whose bbox (padded by the coverage cutoff radius)
    misses the tile in EITHER axis — the soft support is only ~12px wide at
    sigma=1e-3, so most (tile, chunk) pairs never enter the loop body, and
    the in-loop test is one SMEM bit probe instead of a VMEM bbox reduce.

The backward kernel recomputes per-pair geometry and accumulates per-face
gradient sums deterministically (fixed reduction order — no CUDA atomicAdd
nondeterminism), emitting d/d(packed constants); autodiff through the jnp
packing code (common.pack_face_constants) turns those into vertex/texture
gradients. Gradient semantics match the CUDA backward
(kernel.cu:486-668): interpolation weights are constants, vertex xy grads
flow only through coverage, z grads through the softmax weights.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from selfcorr_tpu.ops.rasterizer import common as C

# ---------------------------------------------------------------------------
# Constant packing (differentiable jnp; slot layout shared fwd/bwd)
# ---------------------------------------------------------------------------

K = 64           # lanes per face in the packed constant array
FF = 16          # faces per streamed chunk
TR, TC = 8, 128  # pixel tile: 8 rows x 128 cols

# slot offsets. Only the SEGMENT distance is ever computed:
#   d_seg^2 = |p-v0|^2 - t(2s-t) e2   (t = clamp(s, 0, 1), s = foot param)
# The reference's separate inside-pixel LINE distance (kernel.cu:95-112)
# equals it identically — see the convexity note in _chunk_geometry.
S_WA = 0      # 9: barycentric affine coeffs (3 bary x [ax, ay, ac])
S_SEG = 9     # 9: per-edge segment-parameter affine coeffs
S_E2 = 18     # 3: squared edge lengths
S_PC = 21     # 9: per-edge |p-v0|^2 affine coeffs
S_IZ = 30     # 3: 1/z per corner
S_Z = 33      # 3: z per corner
S_FRONT = 36  # 1
S_BBOX = 37   # 4: xmin, xmax, ymin, ymax
S_STEX = 41   # 9: soft texture (3 corners x rgb)
S_HTEX = 50   # 9: hard texture
N_SLOTS = 59
S_SURF = N_SLOTS  # optional surface-texture texels (R^2 x rgb), appended

_BIG = 1e9
# Backward-kernel pixel reductions: False = VPU (sublane-first two-step
# reduces), True = one batched MXU matmul streams every per-pair gradient
# field against the [1, x] pixel basis. MEASURED AND REJECTED on the v5e
# (scripts/ab_bwd_reduce.py, A-B-A): bwd 107.1 -> 167.5 ms scattered /
# 78.8 -> 121.2 ms ico — the (24*128, 128) row-streaming matmul + field
# concat costs far more than Mosaic's native reduces. The VPU arm's
# sublane-first ordering also measured NEUTRAL (122.9 -> 123.7 ms ico
# fwd+bwd vs round 3; kept: strictly fewer full-rank ops). Together the
# two arms pin the conclusion: the backward is bound by ELEMENTWISE
# per-pair chain arithmetic, not by its reductions — at ~80 ms ico it
# runs ~3e11 VPU ops, near the elementwise roofline for its live
# (tile, chunk) pair count. The remaining waste is structural (the
# 128-lane pixel tile vs the ~24-40 px face support: most lanes of most
# pairs are outside any face's reach), and recovering it needs a sparse
# pair-list kernel, not micro-optimization of this one. Flag + test stay
# as the documented rejection (tests/test_raster_pallas.py pins both).
MXU_REDUCE = False
# y-band quantization for the face sort: band-major, x-minor ordering keeps
# each streamed chunk tight in BOTH axes, so the per-chunk bbox test can cull
# against the column tile as well as the row strip. 64 bands over [-1, 1]
# for the classic 8x128 row strips; the lane-split 16x64 tiles want COARSER
# bands (16) — with narrow tiles the cull is x-limited, and wider bands let
# the x-minor term group each chunk x-tight instead of splitting it across
# 4-px micro-bands (cost-model sweep in scripts/analyze_face_sort.py:
# 16 bands = 0.79x ico / 0.71x scattered pair work at 256^2, measured
# on-chip in PERF.md round 4).
N_BANDS = 64
N_BANDS_LANE_SPLIT = 16


def bands_for(image_size: int) -> int:
    return N_BANDS_LANE_SPLIT if lane_split_for(image_size) else N_BANDS


def _face_bands(ycen: jnp.ndarray, n_bands: int = N_BANDS) -> jnp.ndarray:
    return jnp.floor((ycen + 1.0) * (n_bands / 2.0))


def pack_constants(face_verts: jnp.ndarray, soft_tex: jnp.ndarray,
                   hard_tex: jnp.ndarray, sort_faces: bool = True,
                   surf_tex: jnp.ndarray | None = None,
                   n_bands: int = N_BANDS) -> jnp.ndarray:
    """(B,F,3,3) verts + textures -> (B, F_padded, K) f32, differentiable.

    surf_tex (B,F,R^2,3), when given, appends per-face texel grids for the
    'surface' texture mode (soft_rasterize_cuda_kernel.cu:178-217); the
    lane count grows to the next multiple of 64.

    Faces are sorted by bbox y-centre per batch element so each streamed
    16-face chunk is y-coherent and the kernel's chunk-level bbox cull
    becomes near-perfect (a random face order gives every chunk the full
    mesh's y-extent). All aggregations are face-order invariant, and the
    gather's autodiff transpose unsorts the gradients automatically.

    Padded faces are inert: |p-v0|^2 offset 1e9 kills coverage; bbox far away
    enables chunk skipping; z=1 avoids inf.
    """
    b, f = face_verts.shape[:2]
    f_pad = -(-f // FF) * FF
    if sort_faces:
        ycen = (jnp.min(face_verts[..., 1], axis=-1)
                + jnp.max(face_verts[..., 1], axis=-1)) * 0.5
        xcen = (jnp.min(face_verts[..., 0], axis=-1)
                + jnp.max(face_verts[..., 0], axis=-1)) * 0.5
        # lexicographic (y-band, x) key: bands are integers, the x term stays
        # within [0, 0.25] so it never crosses a band boundary
        xn = jnp.clip((xcen + 1.0) * 0.5, 0.0, 1.0)
        key = _face_bands(ycen, n_bands) + 0.25 * xn
        order = jnp.argsort(jax.lax.stop_gradient(key), axis=-1)  # (B, F)
        face_verts = jnp.take_along_axis(face_verts, order[..., None, None],
                                         axis=1)
        soft_tex = jnp.take_along_axis(soft_tex, order[..., None, None],
                                       axis=1)
        hard_tex = jnp.take_along_axis(hard_tex, order[..., None, None],
                                       axis=1)
        if surf_tex is not None:
            surf_tex = jnp.take_along_axis(surf_tex, order[..., None, None],
                                           axis=1)
    c = C.pack_face_constants(face_verts)
    cols = [
        c.w_a.reshape(b, f, 9),
        c.seg.reshape(b, f, 9),
        c.e2,
        c.pc.reshape(b, f, 9),
        c.inv_z,
        c.z,
        c.front[..., None],
        c.bbox,
        soft_tex.reshape(b, f, 9),
        jax.lax.stop_gradient(hard_tex).reshape(b, f, 9),
    ]
    n_slots = N_SLOTS
    if surf_tex is not None:
        cols.append(surf_tex.reshape(b, f, -1))
        n_slots += surf_tex.shape[2] * 3
    k_tot = max(K, -(-n_slots // 64) * 64)
    packed = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, k_tot - n_slots)))
    if f_pad != f:
        filler = jnp.zeros((b, f_pad - f, k_tot), jnp.float32)
        filler = filler.at[..., S_PC + 2].set(_BIG)   # pv0 offset (edge 0)
        filler = filler.at[..., S_PC + 5].set(_BIG)
        filler = filler.at[..., S_PC + 8].set(_BIG)
        # zero-extent bbox far away: culled by overlap tests AND contributes
        # no height to the row-range margin
        filler = filler.at[..., S_BBOX + 0].set(_BIG)
        filler = filler.at[..., S_BBOX + 1].set(_BIG)
        filler = filler.at[..., S_BBOX + 2].set(_BIG)
        filler = filler.at[..., S_BBOX + 3].set(_BIG)
        filler = filler.at[..., S_IZ:S_IZ + 3].set(1.0)
        filler = filler.at[..., S_Z:S_Z + 3].set(1.0)
        packed = jnp.concatenate([packed, filler], axis=1)
    return packed


# Lane-split tile geometry (16x64-pixel regions packed one per vreg, lane =
# row_half*64 + col%64) vs the classic 8 x min(128, S) row strip. Chunk
# bboxes are narrow in x for mesh-coherent scenes (band-major/x-minor face
# sort), so halving the tile width halves the dead lanes per live
# (tile, chunk) pair; predicted 0.81x pair-work on the ico scene
# (scripts/analyze_tile_waste.py), measured on-chip in PERF.md round 4.
# Module flag is only the DEFAULT: the jitted _fwd_call/_bwd_call wrappers
# take lane_split as a static argument (resolved by the un-jitted custom-vjp
# layer via lane_split_for), so in-process flips retrace automatically
# (ADVICE r4). Flipping it under an OUTER jit still needs that outer
# function retraced, as with any global.
LANE_SPLIT = True

# Per-tile face COMPACTION: instead of streaming fixed chunks of 16
# consecutive (y-sorted) faces gated by a chunk-bbox cull, gather for each
# tile ONLY its live faces (face bbox overlaps the pad-expanded tile box)
# into dense groups of FF. The dense-chunk kernel pays for every face of a
# chunk whose bbox merely touches the tile; compaction makes per-tile work
# proportional to the tile's true live-face count. Predicted pair work on
# the mesh-coherent ico scene: 0.65x the lane-split chunk kernel
# (scripts/analyze_tile_waste.py + the compact extension; PERF.md round 5).
# Same module-flag-is-only-a-default convention as LANE_SPLIT: the jitted
# wrappers take `compact` as a static argument. Default ON: the on-chip
# parity gate is green on all three scenes and the full-step A-B-A measured
# 147.6 / 143.8 / 147.6 imgs/s (on/off/on, +2.6% end-to-end); at kernel
# level it also repairs the lane-split scattered-soup regression
# (fwd+bwd 139.4 -> 94.6 ms; PERF.md round 5).
COMPACT = True


def lane_split_for(image_size: int) -> bool:
    """The lane-split tile geometry applies whenever the image tiles evenly
    into 16x64-pixel blocks (64 <= all training/eval sizes here). Smaller /
    odd sizes keep the classic 8 x min(128, S) tiles."""
    return (LANE_SPLIT and image_size % (2 * TR) == 0
            and image_size % (TC // 2) == 0)


def compact_for(image_size: int) -> bool:
    """Face compaction is geometry-agnostic (the tile boxes come from the
    same lane_split policy); gate only on the module default."""
    del image_size
    return COMPACT


def _scramble(img: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S) image -> (B, S/2, 2S) lane-split layout: the kernel block
    (1, 8, 128) then covers a 16-row x 64-col pixel region with lane
    l = (row_half * 64 + col%64) — one full vreg per narrow tile instead of
    a half-wasted 8x128 strip (see _tile_pixel_coords). Pure XLA transpose,
    ~8 MB per flagship array; measured in the lane-split A/B (PERF.md)."""
    b, s, _ = img.shape
    t = img.reshape(b, s // (2 * TR), 2, TR, s // (TC // 2), TC // 2)
    t = t.transpose(0, 1, 3, 4, 2, 5)
    return t.reshape(b, s // 2, 2 * s)


def _unscramble(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _scramble: (B, S/2, 2S) -> (B, S, S)."""
    b, h, w = z.shape
    s = h * 2
    t = z.reshape(b, s // (2 * TR), TR, s // (TC // 2), 2, TC // 2)
    t = t.transpose(0, 1, 4, 2, 3, 5)
    return t.reshape(b, s, s)


def compute_chunk_info(consts: jnp.ndarray, image_size: int, pad: float,
                       lane_split: bool = False):
    """EXACT per-(batch, row-strip, column-tile) chunk culling, computed
    outside the kernel from the packed bboxes.

    Returns (spans, masks), both 2-D and flattened over (row-strip, column
    tile) — Mosaic pads the LAST dim of every scalar-prefetched SMEM operand
    to 128 lanes, so a (B, R, C, 2) layout would allocate B*R*C*128 words
    (1 MB at flagship shapes, the whole SMEM budget); keeping the flattened
    tile axis last stays at the true size:
      spans (B, R*C*2) int32 — [first, last+1) qualifying 16-face chunk ids
        for tile (r, c) at [(r*C + c)*2 : +2]
      masks (B, R*C*W) int32 — bit ci%32 of word (r*C + c)*W + ci//32 set iff
        chunk ci's bbox overlaps tile (r, c)'s pad-expanded box
        (W = ceil(n_chunks/32)).

    lane_split switches the tile geometry from 8 x min(128, S) row strips
    to the 16x64-pixel vreg tiles of the lane-split layout (R = S/16,
    C = S/64 — see _scramble/_tile_pixel_coords).

    Replaces the kernel's in-loop per-chunk bbox test (a VMEM load + vector
    reduce per SKIPPED chunk) with a scalar SMEM bit test, and — unlike the
    row-range-only cull — also rejects chunks that miss the COLUMN tile
    (the x-miss cost the round-2 VERDICT called out). Strictly tighter than
    the replaced per-strip face-range scheme: chunk bboxes are exact maxima
    over their faces, so no global max-half-height margin is needed. Padded faces carry bbox
    [BIG, BIG, BIG, BIG] (pack_constants) so fully-padded chunks never set
    a bit. The per-pixel contrib cutoffs inside the kernel are unchanged —
    outputs are bit-identical (pinned by tests/test_raster_pallas.py).
    """
    s = image_size
    if lane_split:
        tr_px, tc_px = 2 * TR, TC // 2    # 16 x 64 pixel tiles (one vreg)
    else:
        tr_px, tc_px = TR, min(TC, s)
    b, f_pad, _ = consts.shape
    nc = f_pad // FF
    bb = consts[..., S_BBOX:S_BBOX + 4].reshape(b, nc, FF, 4)
    cxmin = jnp.min(bb[..., 0], axis=-1)   # (B, NC)
    cxmax = jnp.max(jnp.where(bb[..., 0] >= _BIG, -_BIG, bb[..., 1]), axis=-1)
    cymin = jnp.min(bb[..., 2], axis=-1)
    cymax = jnp.max(jnp.where(bb[..., 2] >= _BIG, -_BIG, bb[..., 3]), axis=-1)

    n_rows = s // tr_px
    n_cols = s // tc_px
    k = jnp.arange(n_rows, dtype=jnp.float32)
    y_hi = (s - 1.0 - 2.0 * (k * tr_px)) / s + pad        # (R,)
    y_lo = (s - 1.0 - 2.0 * (k * tr_px + tr_px - 1)) / s - pad
    c = jnp.arange(n_cols, dtype=jnp.float32)
    x_lo = (2.0 * (c * tc_px) + 1.0 - s) / s - pad        # (C,)
    x_hi = (2.0 * ((c + 1.0) * tc_px - 1.0) + 1.0 - s) / s + pad

    # (B, R, C, NC) overlap of chunk bbox with the pad-expanded tile box
    ov_y = ((cymin[:, None, :] <= y_hi[None, :, None])
            & (cymax[:, None, :] >= y_lo[None, :, None]))      # (B, R, NC)
    ov_x = ((cxmin[:, None, :] <= x_hi[None, :, None])
            & (cxmax[:, None, :] >= x_lo[None, :, None]))      # (B, C, NC)
    ov = ov_y[:, :, None, :] & ov_x[:, None, :, :]

    ids = jnp.arange(nc, dtype=jnp.int32)
    start = jnp.min(jnp.where(ov, ids, nc), axis=-1)
    end = jnp.max(jnp.where(ov, ids + 1, 0), axis=-1)
    spans = jnp.stack([start, jnp.maximum(end, start)], -1).astype(jnp.int32)

    w = -(-nc // 32)
    ov_pad = jnp.pad(ov, ((0, 0), (0, 0), (0, 0), (0, w * 32 - nc)))
    bits = ov_pad.reshape(*ov_pad.shape[:-1], w, 32).astype(jnp.uint32)
    weights = jnp.asarray([np.uint32(1) << np.uint32(i) for i in range(32)],
                          dtype=jnp.uint32)
    words = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    masks = jax.lax.bitcast_convert_type(words, jnp.int32)
    return (spans.reshape(b, n_rows * n_cols * 2),
            masks.reshape(b, n_rows * n_cols * w))


def compute_tile_lists(consts: jnp.ndarray, image_size: int, pad: float,
                       lane_split: bool = False):
    """Per-(batch, tile) compacted live-face lists for the COMPACT kernels.

    A face is live for a tile iff its packed bbox overlaps the tile's
    pad-expanded box (the same exact test compute_chunk_info applies at
    chunk granularity). Returns:
      counts (B, T) int32 — live-face count per flattened tile (SMEM
        scalar-prefetch operand; T = R*C tiles)
      ids (B, T*NG, FF) int32 — per tile, the live face ids in ASCENDING
        sorted-face order (preserves the dense kernel's z-tie-break), then
        the dead ids as padding (NG = f_pad/FF group rows per tile, rounded
        up to a multiple of 8: Mosaic requires the (1, NG, FF) VMEM block's
        sublane dim divisible by 8 — caught by the round-5 on-chip parity
        gate at gate shapes where f_pad/FF = 4. Slots past `counts` are
        masked inert in-kernel, and their gradient rows are exact zeros, so
        the padding ids — zeros for the rounding rows, which the group loop
        never even visits (ceil(count/FF) <= f_pad/FF) — are harmless
        scatter targets).

    Construction is one argsort of the key (live ? id : f_pad + id): live
    faces come first in ascending id order. Padded faces carry bbox
    [BIG, BIG, BIG, BIG] (pack_constants) and are never live.
    """
    s = image_size
    if lane_split:
        tr_px, tc_px = 2 * TR, TC // 2
    else:
        tr_px, tc_px = TR, min(TC, s)
    b, f_pad, _ = consts.shape
    bb = consts[..., S_BBOX:S_BBOX + 4]                     # (B, F, 4)
    n_rows = s // tr_px
    n_cols = s // tc_px
    k = jnp.arange(n_rows, dtype=jnp.float32)
    y_hi = (s - 1.0 - 2.0 * (k * tr_px)) / s + pad
    y_lo = (s - 1.0 - 2.0 * (k * tr_px + tr_px - 1)) / s - pad
    c = jnp.arange(n_cols, dtype=jnp.float32)
    x_lo = (2.0 * (c * tc_px) + 1.0 - s) / s - pad
    x_hi = (2.0 * ((c + 1.0) * tc_px - 1.0) + 1.0 - s) / s + pad

    ov_y = ((bb[:, None, :, 2] <= y_hi[None, :, None])
            & (bb[:, None, :, 3] >= y_lo[None, :, None]))   # (B, R, F)
    ov_x = ((bb[:, None, :, 0] <= x_hi[None, :, None])
            & (bb[:, None, :, 1] >= x_lo[None, :, None]))   # (B, C, F)
    ov = ov_y[:, :, None, :] & ov_x[:, None, :, :]          # (B, R, C, F)

    counts = jnp.sum(ov, axis=-1, dtype=jnp.int32).reshape(b, -1)
    iota = jnp.arange(f_pad, dtype=jnp.int32)
    key = jnp.where(ov, iota, f_pad + iota)
    order = jnp.argsort(key, axis=-1).astype(jnp.int32)     # (B, R, C, F)
    ng, ngp = f_pad // FF, _ng_pad(f_pad)
    order = order.reshape(b, n_rows * n_cols, ng, FF)
    if ngp != ng:
        order = jnp.pad(order, ((0, 0), (0, 0), (0, ngp - ng), (0, 0)))
    ids = order.reshape(b, n_rows * n_cols * ngp, FF)
    return counts, ids


# ---------------------------------------------------------------------------
# Shared per-chunk geometry (traced inside kernels)
# ---------------------------------------------------------------------------

def _cols(cv, j, n=1):
    """cv: (FF, K) chunk constants -> (FF, 1, 1) broadcastable column(s).

    Never materializes rank-1 arrays (Mosaic layout inference requires
    rank >= 2 on TPU vectors)."""
    if n == 1:
        return cv[:, j:j + 1][:, :, None]
    return [cv[:, j + i:j + i + 1][:, :, None] for i in range(n)]


def _affine(cv, j, xs, ys, lane_extra=None, sub_extra=None, yh=None):
    """a*xs + b*ys + c evaluated as (lane part) + (sublane part).

    xs varies only along lanes ((1,1,TC)) and ys only along sublanes
    ((1,TR,1)), so grouping the terms as (a*xs + c [+ lane_extra]) +
    (b*ys [+ sub_extra]) costs ONE full-rank (FF,TR,TC) add — the naive
    left-to-right association pays two (three with a full-rank extra like
    p2). Measured effect is modest (~2 ms of the 125 ms ico fwd+bwd,
    PERF.md round 3 — Mosaic evidently already folds most of the naive
    form); kept because it is strictly fewer full-rank ops and exact up
    to the last ulp.

    yh (lane-split geometry): the lane-varying component of the pixel y
    coordinate (y = ys + yh, see _tile_pixel_coords); b*yh folds into the
    LANE part, keeping the full-rank op count identical to the classic
    layout."""
    a, b, c = _cols(cv, j, 3)
    lane = a * xs + c                       # (FF, 1, TC)
    if yh is not None:
        lane = lane + b * yh
    if lane_extra is not None:
        lane = lane + lane_extra
    sub = b * ys                            # (FF, TR, 1)
    if sub_extra is not None:
        sub = sub + sub_extra
    return lane + sub


def _chunk_geometry(cv, xs, ys, x2, y2, sigma1, sigma2, near, far,
                    yh=None, cross=None):
    """All per-(face-in-chunk, pixel) quantities. Shapes (FF, TR, TC).

    x2 = xs*xs and y2 = ys*ys are passed separately (not as the full-rank
    sum p2) so the |p-v0|^2 affines can fold them into their lane/sublane
    parts — see _affine.

    Lane-split geometry: y = ys (sublane part) + yh (lane part), so y^2
    picks up the face-independent full-rank cross term 2*ys*yh — the
    caller computes it ONCE per tile and passes it as `cross` (and folds
    yh^2 into x2); the only extra full-rank work is one add per edge."""
    w0 = _affine(cv, S_WA + 0, xs, ys, yh=yh)
    w1 = _affine(cv, S_WA + 3, xs, ys, yh=yh)
    w2 = _affine(cv, S_WA + 6, xs, ys, yh=yh)
    inside = ((w0 > 0) & (w0 < 1) & (w1 > 0) & (w1 < 1)
              & (w2 > 0) & (w2 < 1))

    # Segment distances only: the reference semantics are min LINE distance
    # for inside pixels / min SEGMENT distance for outside ones
    # (kernel.cu:95-112), but for a point INSIDE a triangle the closest
    # boundary point is always a perpendicular foot ON the minimizing edge
    # (convexity: the perpendicular from an interior point to any edge line
    # crosses the boundary first, so min_e dline_e = min_e dseg_e, and on
    # the argmin edge t == clip(s) == s makes the two formulas bitwise
    # equal: 2s-s and s*(2s-s) are exact). So dis2 = min_e dseg2_e for ALL
    # pixels — the per-edge line distances and the inside/outside distance
    # select are dead weight and are not computed.
    dseg2 = None
    seg_cache = []
    for e in range(3):
        s = _affine(cv, S_SEG + 3 * e, xs, ys, yh=yh)
        t = jnp.clip(s, 0.0, 1.0)
        pv0 = _affine(cv, S_PC + 3 * e, xs, ys, lane_extra=x2, sub_extra=y2,
                      yh=yh)
        if cross is not None:
            pv0 = pv0 + cross
        e2 = _cols(cv, S_E2 + e)
        d2 = jnp.maximum(pv0 - t * (2.0 * s - t) * e2, 0.0)  # segment dist^2
        seg_cache.append((s, t, e2, d2))
        dseg2 = d2 if dseg2 is None else jnp.minimum(dseg2, d2)

    dis2 = dseg2
    sign = jnp.where(inside, 1.0, -1.0)

    contrib1 = inside | (dis2 < sigma1 * C.DIST_CUT)
    contrib2 = inside | (dis2 < sigma2 * C.DIST_CUT)
    # Both coverage sigmoids from ONE exp: sigmoid(z) = 1/(1 + exp(-z)) and
    # when sigma1 = sigma2/r with small integer r, exp(-z1) = exp(-z2)^r
    # (binary exponentiation). jax.nn.sigmoid evaluates BOTH of its
    # stability branches' exps on the VPU, so this replaces 4 transcendental
    # passes with 1. Overflow is benign: exp(+92) = inf -> 1/(1+inf) = 0,
    # exp(-92) flushes to 0 -> sigmoid 1 (exactly the saturated values).
    e2x = jnp.exp(-sign * dis2 / sigma2)
    r = sigma2 / sigma1
    ri = int(round(r))
    if abs(r - ri) < 1e-6 and 2 <= ri <= 32:
        p, acc, base = ri, None, e2x
        while p:
            if p & 1:
                acc = base if acc is None else acc * base
            p >>= 1
            if p:
                base = base * base
        e1x = acc
    else:
        e1x = jnp.exp(-sign * dis2 / sigma1)
    d1 = (1.0 / (1.0 + e1x)) * contrib1
    d2_ = (1.0 / (1.0 + e2x)) * contrib2

    c0 = jnp.clip(w0, 0.0, 1.0)
    c1 = jnp.clip(w1, 0.0, 1.0)
    c2 = jnp.clip(w2, 0.0, 1.0)
    wsum = jnp.maximum(c0 + c1 + c2, 1e-5)
    c0, c1, c2 = c0 / wsum, c1 / wsum, c2 / wsum

    iz0, iz1, iz2 = _cols(cv, S_IZ, 3)
    zp = 1.0 / (c0 * iz0 + c1 * iz1 + c2 * iz2)
    z_ok = (zp >= near) & (zp <= far)
    zn = (far - zp) / (far - near)

    return dict(w=(w0, w1, w2), inside=inside, dis2=dis2, sign=sign,
                contrib1=contrib1, contrib2=contrib2, D1=d1, D2=d2_,
                wc=(c0, c1, c2), zp=zp, z_ok=z_ok, zn=zn,
                seg_cache=seg_cache, dseg2=dseg2)


def _surface_texel_sel(c0, c1, res):
    """Per-texel selection masks for the 'surface' texture lookup
    (kernel.cu:178-195 cell + diagonal fold, matching
    models/surface_texture.sample_surface_texture). Returns a list of R^2
    float masks (FF, TR, TC); exactly one is 1 per (face, pixel)."""
    wx = jnp.clip(jnp.floor(c0 * res), 0.0, res - 1.0)
    wy = jnp.clip(jnp.floor(c1 * res), 0.0, res - 1.0)
    upper = ((c0 + c1) * res - wx - wy) <= 1.0
    idx = jnp.where(upper, wy * res + wx,
                    (res - 1.0 - wy) * res + (res - 1.0 - wx))
    return [(idx == float(t)).astype(jnp.float32)
            for t in range(res * res)]


def _surface_color(cv, sels, res):
    """Texel-grid color at each (face, pixel): sum of one-hot-selected
    per-face texel constants (gather-free — Mosaic-friendly)."""
    col_r = col_g = col_b = 0.0
    for t, sel in enumerate(sels):
        tr_, tg_, tb_ = _cols(cv, S_SURF + 3 * t, 3)
        col_r = col_r + sel * tr_
        col_g = col_g + sel * tg_
        col_b = col_b + sel * tb_
    return col_r, col_g, col_b


def _prod_faces(x):
    """prod over the leading (face) axis via pairwise tree reduction —
    Mosaic has no reduce_prod lowering. x: (FF, TR, TC) -> (1, TR, TC)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        x = x[:half] * x[half:half * 2] if n % 2 == 0 else \
            jnp.concatenate([x[:half] * x[half:half * 2], x[-1:]], axis=0)
        n = x.shape[0]
    return x


def _softmax_update(m, s, accs, zn_masked, d_cov, values, gamma):
    """Streaming-softmax accumulator update over one face chunk.

    m, s: (1,TR,TC) running max / sum; accs: list of (1,TR,TC) channel sums;
    zn_masked: (FF,TR,TC) (-inf where excluded); d_cov: coverage weights;
    values: list of (FF,TR,TC) channel values.
    """
    m_new = jnp.maximum(m, jnp.max(zn_masked, axis=0, keepdims=True))
    scale = jnp.exp((m - m_new) / gamma)
    wgt = d_cov * jnp.exp((zn_masked - m_new) / gamma)
    s_new = s * scale + jnp.sum(wgt, axis=0, keepdims=True)
    accs_new = [a * scale + jnp.sum(wgt * v, axis=0, keepdims=True)
                for a, v in zip(accs, values)]
    return m_new, s_new, accs_new


def _tile_pixel_coords(image_size, lane_split=False):
    """Static per-tile NDC coordinate builders from grid ids (pr, pc).

    Classic layout: the (8, min(128, S)) block is a row strip; ys varies
    along sublanes only, xs along lanes only. Returns (xs, ys, None).

    Lane-split layout (lane_split_for(S)): the (8, 128) block covers a
    16-row x 64-col pixel region, lane l = row_half * 64 + (col % 64)
    (array layout from _scramble). The pixel y coordinate then splits as
    y = ys + yh with ys the sublane part (rows pr*16 + sub) and yh the
    lane part (-16 * half / S); xs repeats its 64 columns across both lane
    halves. Returns (xs, ys, yh)."""
    s = image_size
    pr = pl.program_id(1)
    pc = pl.program_id(2)
    if not lane_split:
        rows = pr * TR + jax.lax.broadcasted_iota(jnp.int32, (1, TR, 1), 1)
        tc = min(TC, s)
        colsn = pc * tc + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tc), 2)
        ys = (s - 1.0 - 2.0 * rows.astype(jnp.float32)) / s
        xs = (2.0 * colsn.astype(jnp.float32) + 1.0 - s) / s
        return xs, ys, None
    half_w = TC // 2
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, TR, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TC), 2)
    half = lane // half_w
    xl = lane - half * half_w
    rows = pr * (2 * TR) + sub                      # row base (no half term)
    colsn = pc * half_w + xl
    ys = (s - 1.0 - 2.0 * rows.astype(jnp.float32)) / s        # (1, TR, 1)
    yh = (-2.0 * TR) * half.astype(jnp.float32) / s            # (1, 1, TC)
    xs = (2.0 * colsn.astype(jnp.float32) + 1.0 - s) / s       # (1, 1, TC)
    return xs, ys, yh


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_chunk_update(g, cv, carry, *, gamma_d, gamma_t, z_offset, tex_res):
    """One face-chunk's contribution to the per-tile streaming carry.
    Shared by the dense-chunk and compacted-group forward kernels (the
    carry layout and aggregation math are identical; only how `cv` was
    obtained differs)."""
    (p1, p2_prod, m_d, s_d, acc_d, m_t, s_t, acc_tr, acc_tg, acc_tb,
     zmin, hr, hg, hb) = carry
    d1, d2 = g["D1"], g["D2"]
    c0, c1, c2 = g["wc"]

    p2_prod = p2_prod * _prod_faces(1.0 - d2)

    contrib_t = g["contrib2"] & g["z_ok"]
    zn_t = jnp.where(contrib_t, g["zn"], -jnp.inf)
    if tex_res:
        sels = _surface_texel_sel(c0, c1, tex_res)
        col_r, col_g, col_b = _surface_color(cv, sels, tex_res)
    else:
        tex = _cols(cv, S_STEX, 9)
        col_r = c0 * tex[0] + c1 * tex[3] + c2 * tex[6]
        col_g = c0 * tex[1] + c1 * tex[4] + c2 * tex[7]
        col_b = c0 * tex[2] + c1 * tex[5] + c2 * tex[8]
    m_t, s_t, (acc_tr, acc_tg, acc_tb) = _softmax_update(
        m_t, s_t, [acc_tr, acc_tg, acc_tb], zn_t, d2,
        [col_r, col_g, col_b], gamma_t)

    def depth_hard(sub):
        # EXACT skip when no face reaches the sigma1 support in this
        # tile (sigma1's cutoff radius is ~3.2x tighter than sigma2's):
        # d1 == 0 there, so the coverage product, the depth softmax and
        # the hard pass are all no-ops
        (p1, m_d, s_d, acc_d, zmin, hr, hg, hb) = sub
        p1 = p1 * _prod_faces(1.0 - d1)

        contrib_d = g["contrib1"] & g["z_ok"]
        zn_d = jnp.where(contrib_d, g["zn"], -jnp.inf)
        z0, z1, z2 = _cols(cv, S_Z, 3)
        val_d = (c0 * (z0 - z_offset) + c1 * (z1 - z_offset)
                 + c2 * (z2 - z_offset))
        m_d, s_d, (acc_d,) = _softmax_update(
            m_d, s_d, [acc_d], zn_d, d1, [val_d], gamma_d)

        # hard pass: nearest containing face
        w0, w1, w2 = g["w"]
        inside_ns = ((w0 >= 0) & (w0 <= 1) & (w1 >= 0) & (w1 <= 1)
                     & (w2 >= 0) & (w2 <= 1))
        hard_ok = inside_ns & g["contrib1"] & g["z_ok"]
        zp_h = jnp.where(hard_ok, g["zp"], jnp.inf)
        chunk_min = jnp.min(zp_h, axis=0, keepdims=True)
        eq = (zp_h == chunk_min) & hard_ok
        # first-true along the face axis (CUDA keeps the earliest
        # face on z ties); unrolled — FF is small and static
        seen = jnp.zeros_like(eq[0:1])
        firsts = []
        for i in range(FF):
            e_i = eq[i:i + 1]
            firsts.append(e_i & (~seen))
            seen = seen | e_i
        fm = jnp.concatenate(firsts, axis=0).astype(jnp.float32)
        htex = _cols(cv, S_HTEX, 9)
        hc_r = jnp.sum(
            fm * (c0 * htex[0] + c1 * htex[3] + c2 * htex[6]),
            axis=0, keepdims=True)
        hc_g = jnp.sum(
            fm * (c0 * htex[1] + c1 * htex[4] + c2 * htex[7]),
            axis=0, keepdims=True)
        hc_b = jnp.sum(
            fm * (c0 * htex[2] + c1 * htex[5] + c2 * htex[8]),
            axis=0, keepdims=True)
        is_new = chunk_min < zmin
        hr = jnp.where(is_new, hc_r, hr)
        hg = jnp.where(is_new, hc_g, hg)
        hb = jnp.where(is_new, hc_b, hb)
        zmin = jnp.minimum(zmin, chunk_min)
        return (p1, m_d, s_d, acc_d, zmin, hr, hg, hb)

    sub = (p1, m_d, s_d, acc_d, zmin, hr, hg, hb)
    (p1, m_d, s_d, acc_d, zmin, hr, hg, hb) = jax.lax.cond(
        jnp.any(g["contrib1"]), depth_hard, lambda s: s, sub)

    return (p1, p2_prod, m_d, s_d, acc_d, m_t, s_t,
            acc_tr, acc_tg, acc_tb, zmin, hr, hg, hb)


def _mask_invalid(g, valid):
    """Force list-padding slots inert: a slot with valid=False contributes
    exactly nothing to any aggregation (d1 = d2 = 0 kills the coverage
    products and both softmax weights; the &-folds kill the mask selects
    and the hard pass), and — because every gradient term in
    _bwd_chunk_grads is proportional to d1, d2, or a weight built from
    them — its backward slot rows are exact zeros too."""
    vf = valid.astype(jnp.float32)
    g = dict(g)
    g["D1"] = g["D1"] * vf
    g["D2"] = g["D2"] * vf
    g["contrib1"] = g["contrib1"] & valid
    g["contrib2"] = g["contrib2"] & valid
    g["z_ok"] = g["z_ok"] & valid
    return g


def _gather_cv(ids_ref, consts_ref, grp):
    """Gather one compacted group's 16 face-constant rows.

    ids_ref: (1, NG, FF) int32 per-tile list block; grp: traced group index.
    Loads the group's id row as a vector, extracts each lane to a scalar,
    and issues FF dynamic single-row slices of the resident consts block.
    (Scalar extraction from a VMEM-loaded vector and dynamic-start sublane
    slices are both Mosaic-supported; verified on-chip before this landed.)
    """
    row = ids_ref[0, pl.ds(grp, 1), :]                     # (1, FF) int32
    rows = []
    for j in range(FF):
        fid = row[0, j]
        rows.append(consts_ref[0, pl.ds(fid, 1), :])
    return jnp.concatenate(rows, axis=0), row              # (FF, K)


def _fwd_kernel(spans_ref, masks_ref, consts_ref, *out_refs, image_size,
                n_chunks, sigma1, sigma2, gamma_d, gamma_t, near, far, bg_eps,
                z_offset, tex_res=0, lane_split=False):
    (a1_ref, a2_ref, depth_ref, texr_ref, texg_ref, texb_ref,
     matr_ref, matg_ref, matb_ref, md_ref, sd_ref, mt_ref, st_ref) = out_refs

    s_img = image_size
    tc = TC if lane_split else min(TC, s_img)
    xs, ys, yh = _tile_pixel_coords(s_img, lane_split)
    x2, y2 = xs * xs, ys * ys
    cross = None
    if yh is not None:
        x2 = x2 + yh * yh              # fold yh^2 into the lane part
        cross = 2.0 * ys * yh          # per-tile full-rank y^2 cross term

    shp = (1, TR, tc)
    zeros = jnp.zeros(shp, jnp.float32)
    ones = jnp.ones(shp, jnp.float32)

    bi = pl.program_id(0)
    # flattened (row-strip, column-tile) index into the 2-D spans/masks
    # (see compute_chunk_info: last-dim SMEM padding forces this layout)
    n_tile_cols = s_img // (TC // 2) if lane_split else s_img // tc
    tile = pl.program_id(1) * n_tile_cols + pl.program_id(2)
    n_words = -(-n_chunks // 32)

    def body(ci, carry):
        # exact per-chunk cull precomputed by compute_chunk_info: one scalar
        # SMEM bit test replaces the old per-chunk VMEM bbox load + vector
        # reduce, and also rejects chunks that miss the COLUMN tile
        word = masks_ref[bi, tile * n_words + ci // 32]
        bit = jax.lax.shift_right_logical(word, jnp.remainder(ci, 32)) & 1

        def compute(carry):
            cv = consts_ref[0, pl.ds(ci * FF, FF), :]  # (FF, K)
            g = _chunk_geometry(cv, xs, ys, x2, y2, sigma1, sigma2, near, far,
                                yh=yh, cross=cross)
            # second-level cull: the bbox test is conservative (the tile is
            # 128 px wide); skip aggregation when no face actually reaches
            # its coverage support in this tile
            return jax.lax.cond(
                jnp.any(g["contrib2"]),
                lambda c: _fwd_chunk_update(g, cv, c, gamma_d=gamma_d,
                                            gamma_t=gamma_t,
                                            z_offset=z_offset,
                                            tex_res=tex_res),
                lambda c: c, carry)

        return jax.lax.cond(bit == 1, compute, lambda c: c, carry)

    init = (ones, ones,                      # coverage products
            jnp.full(shp, bg_eps), ones, ones,      # depth softmax (white bg)
            jnp.full(shp, bg_eps), ones, ones, ones, ones,  # tex softmax
            jnp.full(shp, jnp.inf), zeros, zeros, zeros)     # hard winner
    # loop only over this tile's qualifying chunk span (faces are y-sorted,
    # band-major/x-minor; holes inside the span are skipped by the bit test)
    c_start = spans_ref[bi, tile * 2]
    c_end = spans_ref[bi, tile * 2 + 1]
    (p1, p2_prod, m_d, s_d, acc_d, m_t, s_t, acc_tr, acc_tg, acc_tb,
     zmin, hr, hg, hb) = jax.lax.fori_loop(c_start, c_end, body, init)

    a1_ref[0] = (1.0 - p1)[0]
    a2_ref[0] = (1.0 - p2_prod)[0]
    depth_ref[0] = (acc_d / s_d)[0]
    texr_ref[0] = (acc_tr / s_t)[0]
    texg_ref[0] = (acc_tg / s_t)[0]
    texb_ref[0] = (acc_tb / s_t)[0]
    matr_ref[0] = hr[0]
    matg_ref[0] = hg[0]
    matb_ref[0] = hb[0]
    md_ref[0] = m_d[0]
    sd_ref[0] = s_d[0]
    mt_ref[0] = m_t[0]
    st_ref[0] = s_t[0]


def _fwd_kernel_compact(counts_ref, consts_ref, ids_ref, *out_refs,
                        image_size, sigma1, sigma2, gamma_d, gamma_t, near,
                        far, bg_eps, z_offset, tex_res=0, lane_split=False):
    """Compacted-group forward: loop over ceil(live/FF) gathered face groups
    from this tile's compute_tile_lists row instead of the dense chunk span.
    Aggregation math is _fwd_chunk_update, shared with the dense kernel;
    group padding slots are made inert by _mask_invalid."""
    s_img = image_size
    tc = TC if lane_split else min(TC, s_img)
    xs, ys, yh = _tile_pixel_coords(s_img, lane_split)
    x2, y2 = xs * xs, ys * ys
    cross = None
    if yh is not None:
        x2 = x2 + yh * yh
        cross = 2.0 * ys * yh

    shp = (1, TR, tc)
    zeros = jnp.zeros(shp, jnp.float32)
    ones = jnp.ones(shp, jnp.float32)

    bi = pl.program_id(0)
    n_tile_cols = s_img // (TC // 2) if lane_split else s_img // tc
    tile = pl.program_id(1) * n_tile_cols + pl.program_id(2)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (FF, 1, 1), 0)

    def body(grp, carry):
        cv, _ = _gather_cv(ids_ref, consts_ref, grp)
        g = _chunk_geometry(cv, xs, ys, x2, y2, sigma1, sigma2, near, far,
                            yh=yh, cross=cross)
        valid = (grp * FF + sub_iota) < lt
        g = _mask_invalid(g, valid)
        # every gathered face overlaps the tile at bbox level, but the
        # exact-support test can still come up empty — keep the cheap skip
        return jax.lax.cond(
            jnp.any(g["contrib2"]),
            lambda c: _fwd_chunk_update(g, cv, c, gamma_d=gamma_d,
                                        gamma_t=gamma_t, z_offset=z_offset,
                                        tex_res=tex_res),
            lambda c: c, carry)

    init = (ones, ones,
            jnp.full(shp, bg_eps), ones, ones,
            jnp.full(shp, bg_eps), ones, ones, ones, ones,
            jnp.full(shp, jnp.inf), zeros, zeros, zeros)
    lt = counts_ref[bi, tile]
    n_groups = (lt + FF - 1) // FF
    (p1, p2_prod, m_d, s_d, acc_d, m_t, s_t, acc_tr, acc_tg, acc_tb,
     zmin, hr, hg, hb) = jax.lax.fori_loop(0, n_groups, body, init)

    (a1_ref, a2_ref, depth_ref, texr_ref, texg_ref, texb_ref,
     matr_ref, matg_ref, matb_ref, md_ref, sd_ref, mt_ref, st_ref) = out_refs
    a1_ref[0] = (1.0 - p1)[0]
    a2_ref[0] = (1.0 - p2_prod)[0]
    depth_ref[0] = (acc_d / s_d)[0]
    texr_ref[0] = (acc_tr / s_t)[0]
    texg_ref[0] = (acc_tg / s_t)[0]
    texb_ref[0] = (acc_tb / s_t)[0]
    matr_ref[0] = hr[0]
    matg_ref[0] = hg[0]
    matb_ref[0] = hb[0]
    md_ref[0] = m_d[0]
    sd_ref[0] = s_d[0]
    mt_ref[0] = m_t[0]
    st_ref[0] = s_t[0]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_chunk_grads(g, cv, pix, *, sigma1, sigma2, gamma_d, gamma_t,
                     near, far, z_offset, tex_res, mxu_reduce, basis2,
                     xs, ys, yh, k_tot, lane_split, tc):
    """One face-chunk's assembled (FF, k_tot) gradient block. Shared by the
    dense-chunk kernel (accumulates at the chunk's static row range) and the
    compacted-group kernel (scatters row-by-row through the gathered ids).
    `pix` carries the per-tile pixel residual/cotangent arrays."""
    d1, d2 = g["D1"], g["D2"]
    c0, c1, c2 = g["wc"]
    zp, zn = g["zp"], g["zn"]
    m_d, s_d, m_t, s_t = pix["m_d"], pix["s_d"], pix["m_t"], pix["s_t"]

    # --- coverage (alpha2) chain
    dL_dD2 = pix["g_a2"] * pix["p2_tot"] / jnp.maximum(1.0 - d2, 1e-6)

    # --- alpha1 + depth softmax chain, gated like the forward: with
    # no contrib1 in the tile d1 == 0, so every term below is zero
    # (the alpha1 coverage cotangent only reaches dis2 through
    # d1*(1-d1) — fold that product in here so the skip is exact)
    def depth_chain(_):
        contrib_d = g["contrib1"] & g["z_ok"]
        zn_d = jnp.where(contrib_d, zn, -jnp.inf)
        u_d = jnp.exp((zn_d - m_d) / gamma_d) / s_d
        z0, z1, z2 = _cols(cv, S_Z, 3)
        val_d = (c0 * (z0 - z_offset) + c1 * (z1 - z_offset)
                 + c2 * (z2 - z_offset))
        r_d = val_d - pix["out_d"]
        wgt_d = d1 * u_d
        dL_dD1 = (pix["g_a1"] * pix["p1_tot"] / jnp.maximum(1.0 - d1, 1e-6)
                  + pix["g_d"] * r_d * u_d)
        ddis2_1 = dL_dD1 * g["sign"] * d1 * (1.0 - d1) / sigma1
        dzn_1 = pix["g_d"] * r_d * wgt_d / gamma_d
        return ddis2_1, dzn_1, pix["g_d"] * wgt_d

    zf = jnp.zeros_like(d1)
    ddis2_1, dzn_1, dL_dval = jax.lax.cond(
        jnp.any(g["contrib1"]), depth_chain,
        lambda _: (zf, zf, zf), 0)

    # --- tex softmax chain
    contrib_t = g["contrib2"] & g["z_ok"]
    zn_t = jnp.where(contrib_t, zn, -jnp.inf)
    u_t = jnp.exp((zn_t - m_t) / gamma_t) / s_t
    if tex_res:
        sels = _surface_texel_sel(c0, c1, tex_res)
        col_r, col_g, col_b = _surface_color(cv, sels, tex_res)
    else:
        sels = None
        tex = _cols(cv, S_STEX, 9)
        col_r = c0 * tex[0] + c1 * tex[3] + c2 * tex[6]
        col_g = c0 * tex[1] + c1 * tex[4] + c2 * tex[7]
        col_b = c0 * tex[2] + c1 * tex[5] + c2 * tex[8]
    gr_dot = (pix["g_tr"] * (col_r - pix["out_tr"])
              + pix["g_tg"] * (col_g - pix["out_tg"])
              + pix["g_tb"] * (col_b - pix["out_tb"]))
    wgt_t = d2 * u_t
    dL_dD2 = dL_dD2 + gr_dot * u_t
    dL_dzn = dzn_1 + gr_dot * wgt_t / gamma_t
    # texture color grads (per channel, per corner)
    dL_dcol_r = pix["g_tr"] * wgt_t
    dL_dcol_g = pix["g_tg"] * wgt_t
    dL_dcol_b = pix["g_tb"] * wgt_t

    # --- D -> dis2 (the D1 part was folded into ddis2_1 above)
    dL_ddis2 = ddis2_1 + dL_dD2 * g["sign"] * d2 * (1.0 - d2) / sigma2

    # --- zn -> zp -> inv_z
    dL_dzp = -dL_dzn / (far - near)
    zp2 = zp * zp
    dL_diz0 = -dL_dzp * zp2 * c0
    dL_diz1 = -dL_dzp * zp2 * c1
    dL_diz2 = -dL_dzp * zp2 * c2

    # --- dis2 -> per-edge coefficient grads. dis2 = min_e dseg2_e
    # for ALL pixels (see _chunk_geometry: for inside pixels the
    # minimizing edge's foot is on the segment, so line == segment
    # there). On that edge t == s for inside pixels, so the clamped
    # forms below ARE the line-case gradients where they apply:
    # dd2/ds = -2 t e2, dd2/de2 = t^2 - 2ts (== -s^2 when t == s).
    seg_cache = g["seg_cache"]
    dseg2 = g["dseg2"]

    contribs = []  # list of (slot, (FF,TR,tc) value) to accumulate
    reduced = {}  # slot -> pre-reduced (FF, 1) column
    basis_jobs = []  # MXU path: deferred (v, sx, sy, s1) jobs

    if mxu_reduce:
        def basis_reduce(v, sx, sy, s1):
            basis_jobs.append((v, sx, sy, s1))
    else:
        def basis_reduce(v, sx, sy, s1):
            # The affine-coefficient cotangents are v*{x, y, 1}
            # summed over pixels; x is constant along sublanes and
            # y along lanes, so ONE row-sum + ONE weighted row-sum
            # of v serve all three:
            #   sum v*x = sum_c x_c * (sum_r v),
            #   sum v*y = sum_c (sum_r v*y).
            # Axis choice matters on TPU: a sublane reduce (axis=1,
            # TR=8 rows -> 3 shift-adds per vreg) is ~4x cheaper
            # than a lane reduce (axis=2, TC=128 -> 7 shuffle
            # steps), so BOTH full-rank reduces here run along
            # sublanes and the lane reduces only ever see the
            # (FF, 1, TC) row-sum tails.
            vr = jnp.sum(v, axis=1, keepdims=True)     # (FF, 1, TC)
            vyr = jnp.sum(v * ys, axis=1, keepdims=True)
            if yh is not None:
                # lane part of y: sum v*y = sum v*ys + sum v*yh,
                # and the yh term only needs the row-sum tail
                vyr = vyr + vr * yh
            reduced[sx] = jnp.sum(vr * xs, axis=2)     # (FF, 1)
            reduced[sy] = jnp.sum(vyr, axis=2)
            reduced[s1] = jnp.sum(vr, axis=2)

    chosen = None
    for e in range(3):
        s_e, t_e, e2_e, d2_e = seg_cache[e]
        is_min = d2_e == dseg2
        if chosen is None:
            sel = is_min
            chosen = is_min
        else:
            # logical blend: Mosaic lacks i1 select lowering
            sel = is_min & (~chosen)
            chosen = chosen | is_min
        f_e = dL_ddis2 * sel
        ds_raw = f_e * (-2.0 * t_e * e2_e)
        basis_reduce(ds_raw, S_SEG + 3 * e + 0, S_SEG + 3 * e + 1,
                     S_SEG + 3 * e + 2)
        de2 = t_e * t_e - 2.0 * t_e * s_e
        contribs.append((S_E2 + e, f_e * de2))
        basis_reduce(f_e, S_PC + 3 * e + 0, S_PC + 3 * e + 1,
                     S_PC + 3 * e + 2)

    contribs.append((S_IZ + 0, dL_diz0))
    contribs.append((S_IZ + 1, dL_diz1))
    contribs.append((S_IZ + 2, dL_diz2))
    contribs.append((S_Z + 0, dL_dval * c0))
    contribs.append((S_Z + 1, dL_dval * c1))
    contribs.append((S_Z + 2, dL_dval * c2))
    if tex_res:
        for t, sel in enumerate(sels):
            contribs.append((S_SURF + 3 * t + 0, dL_dcol_r * sel))
            contribs.append((S_SURF + 3 * t + 1, dL_dcol_g * sel))
            contribs.append((S_SURF + 3 * t + 2, dL_dcol_b * sel))
    else:
        for ch, dc in [(0, dL_dcol_r), (1, dL_dcol_g),
                       (2, dL_dcol_b)]:
            contribs.append((S_STEX + 0 + ch, dc * c0))
            contribs.append((S_STEX + 3 + ch, dc * c1))
            contribs.append((S_STEX + 6 + ch, dc * c2))

    # reduce over pixels and assemble the (FF, K) slot matrix in one
    # shot (static layout -> a single concatenated write, no
    # per-slot lane scatters)
    slot_vals = dict(reduced)
    if mxu_reduce:
        # ONE matmul streams every gradient field's rows through
        # the MXU against the [1, x] basis: column 0 gives per-row
        # (lane) sums, column 1 the x-weighted sums. All remaining
        # work is tiny (FF, TR, 2) tails — the VPU never runs a
        # lane reduce. (FF,TR,tc) -> (FF*TR,tc) merges leading dims
        # into sublanes (layout-free); row slices stay 128-aligned.
        fields = [v for v, *_ in basis_jobs] + [v for _, v in contribs]
        vmat = jnp.concatenate(
            [f.reshape(FF * TR, tc) for f in fields], axis=0)
        nb_cols = basis2.shape[-1]
        ysum = jax.lax.dot_general(
            vmat, basis2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (n*FF*TR, nb)
        n_b = len(basis_jobs)
        for i, (_, sx, sy, s1) in enumerate(basis_jobs):
            yi = ysum[i * FF * TR:(i + 1) * FF * TR].reshape(
                FF, TR, nb_cols)
            rs = yi[:, :, 0:1]                     # per-row sums
            slot_vals[s1] = jnp.sum(rs, axis=1)
            sy_rows = rs * ys
            if lane_split:
                sy_rows = sy_rows + yi[:, :, 2:3]  # yh-weighted part
            slot_vals[sy] = jnp.sum(sy_rows, axis=1)
            slot_vals[sx] = jnp.sum(yi[:, :, 1:2], axis=1)
        for j, (slot, _) in enumerate(contribs):
            yj = ysum[(n_b + j) * FF * TR:
                      (n_b + j + 1) * FF * TR].reshape(FF, TR, nb_cols)
            red = jnp.sum(yj[:, :, 0:1], axis=1)
            slot_vals[slot] = slot_vals.get(slot, 0.0) + red
    else:
        for slot, vals in contribs:
            # two-step reduce -> (FF, 1); a fused axis=(1,2)
            # keepdims reduce trips Mosaic layout inference.
            # SUBLANES FIRST: the full-rank step is then the cheap
            # 8-row reduce and the expensive 128-lane reduce only
            # sees the (FF, 1, TC) tail.
            red = jnp.sum(jnp.sum(vals, axis=1, keepdims=True),
                          axis=2)
            slot_vals[slot] = slot_vals.get(slot, 0.0) + red
    zero_col = jnp.zeros((FF, 1), jnp.float32)
    return jnp.concatenate(
        [slot_vals.get(j, zero_col) for j in range(k_tot)], axis=1)


def _bwd_pix(tc, refs):
    """Unpack the 13 residual + 6 cotangent pixel refs into the dict
    _bwd_chunk_grads consumes, reshaped to (1, TR, tc)."""
    (a1_ref, a2_ref, depth_ref, texr_ref, texg_ref, texb_ref,
     md_ref, sd_ref, mt_ref, st_ref,
     ga1_ref, ga2_ref, gd_ref, gtr_ref, gtg_ref, gtb_ref) = refs
    ld = lambda ref: ref[0].reshape(1, TR, tc)
    return dict(
        p1_tot=1.0 - ld(a1_ref), p2_tot=1.0 - ld(a2_ref),
        out_d=ld(depth_ref), out_tr=ld(texr_ref), out_tg=ld(texg_ref),
        out_tb=ld(texb_ref), m_d=ld(md_ref), s_d=ld(sd_ref),
        m_t=ld(mt_ref), s_t=ld(st_ref), g_a1=ld(ga1_ref), g_a2=ld(ga2_ref),
        g_d=ld(gd_ref), g_tr=ld(gtr_ref), g_tg=ld(gtg_ref),
        g_tb=ld(gtb_ref))


def _mxu_basis(tc, lane_split, s_img):
    """[1, x(, yh)] pixel-basis matrix for the batched-matmul reduction
    path, built ONCE outside the chunk loop (loop-invariant); column 1
    reproduces _tile_pixel_coords' xs exactly. Under lane-split a
    third column carries the lane part of y, since the matmul folds
    the lanes away before the ys weighting."""
    n_basis = 3 if lane_split else 2
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (tc, n_basis), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (tc, n_basis), 1)
    if lane_split:
        half_w = TC // 2
        half_i = lane_i // half_w
        xb = (2.0 * (pl.program_id(2) * half_w
                     + (lane_i - half_i * half_w)).astype(jnp.float32)
              + 1.0 - s_img) / s_img
        yhb = (-2.0 * TR) * half_i.astype(jnp.float32) / s_img
        return jnp.where(col_i == 0, 1.0,
                         jnp.where(col_i == 1, xb, yhb))  # (tc, 3)
    xb = (2.0 * (pl.program_id(2) * tc + lane_i).astype(jnp.float32)
          + 1.0 - s_img) / s_img
    return jnp.where(col_i == 0, 1.0, xb)      # (tc, 2)


def _bwd_kernel(spans_ref, masks_ref, consts_ref, a1_ref, a2_ref, depth_ref,
                texr_ref, texg_ref, texb_ref, md_ref, sd_ref, mt_ref, st_ref,
                ga1_ref, ga2_ref, gd_ref, gtr_ref, gtg_ref, gtb_ref,
                grad_ref, *, image_size, n_chunks,
                sigma1, sigma2, gamma_d, gamma_t, near, far, bg_eps, z_offset,
                tex_res=0, mxu_reduce=False, lane_split=False):
    s_img = image_size
    tc = TC if lane_split else min(TC, s_img)
    xs, ys, yh = _tile_pixel_coords(s_img, lane_split)
    x2, y2 = xs * xs, ys * ys
    cross = None
    if yh is not None:
        x2 = x2 + yh * yh
        cross = 2.0 * ys * yh

    first_tile = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first_tile)
    def _():
        grad_ref[...] = jnp.zeros(grad_ref.shape, jnp.float32)

    pix = _bwd_pix(tc, (a1_ref, a2_ref, depth_ref, texr_ref, texg_ref,
                        texb_ref, md_ref, sd_ref, mt_ref, st_ref,
                        ga1_ref, ga2_ref, gd_ref, gtr_ref, gtg_ref, gtb_ref))

    bi = pl.program_id(0)
    n_tile_cols = s_img // (TC // 2) if lane_split else s_img // tc
    tile = pl.program_id(1) * n_tile_cols + pl.program_id(2)
    n_words = -(-n_chunks // 32)
    basis2 = _mxu_basis(tc, lane_split, s_img) if mxu_reduce else None
    k_tot = grad_ref.shape[-1]

    def body(ci, _):
        word = masks_ref[bi, tile * n_words + ci // 32]
        bit = jax.lax.shift_right_logical(word, jnp.remainder(ci, 32)) & 1

        def compute(_):
            cv = consts_ref[0, pl.ds(ci * FF, FF), :]
            g = _chunk_geometry(cv, xs, ys, x2, y2, sigma1, sigma2, near, far,
                                yh=yh, cross=cross)
            return jax.lax.cond(jnp.any(g["contrib2"]),
                                lambda _: backprop(g, cv), lambda _: 0, 0)

        def backprop(g, cv):
            assembled = _bwd_chunk_grads(
                g, cv, pix, sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d,
                gamma_t=gamma_t, near=near, far=far, z_offset=z_offset,
                tex_res=tex_res, mxu_reduce=mxu_reduce, basis2=basis2,
                xs=xs, ys=ys, yh=yh, k_tot=k_tot, lane_split=lane_split,
                tc=tc)
            grad_ref[0, pl.ds(ci * FF, FF), :] += assembled
            return 0

        return jax.lax.cond(bit == 1, compute, lambda _: 0, 0)

    c_start = spans_ref[bi, tile * 2]
    c_end = spans_ref[bi, tile * 2 + 1]
    jax.lax.fori_loop(c_start, c_end, body, 0)


def _bwd_kernel_compact(counts_ref, consts_ref, ids_ref, a1_ref, a2_ref,
                        depth_ref, texr_ref, texg_ref, texb_ref, md_ref,
                        sd_ref, mt_ref, st_ref, ga1_ref, ga2_ref, gd_ref,
                        gtr_ref, gtg_ref, gtb_ref, grad_ref, *, image_size,
                        sigma1, sigma2, gamma_d, gamma_t, near, far, bg_eps,
                        z_offset, tex_res=0, mxu_reduce=False,
                        lane_split=False):
    """Compacted-group backward: the per-group gradient block from
    _bwd_chunk_grads is scattered row-by-row through the gathered face ids
    (read-modify-write of dynamically indexed single rows — deterministic:
    the grid walks tiles in a fixed order and list-padding rows are exact
    zeros, see _mask_invalid)."""
    s_img = image_size
    tc = TC if lane_split else min(TC, s_img)
    xs, ys, yh = _tile_pixel_coords(s_img, lane_split)
    x2, y2 = xs * xs, ys * ys
    cross = None
    if yh is not None:
        x2 = x2 + yh * yh
        cross = 2.0 * ys * yh

    first_tile = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first_tile)
    def _():
        grad_ref[...] = jnp.zeros(grad_ref.shape, jnp.float32)

    pix = _bwd_pix(tc, (a1_ref, a2_ref, depth_ref, texr_ref, texg_ref,
                        texb_ref, md_ref, sd_ref, mt_ref, st_ref,
                        ga1_ref, ga2_ref, gd_ref, gtr_ref, gtg_ref, gtb_ref))

    bi = pl.program_id(0)
    n_tile_cols = s_img // (TC // 2) if lane_split else s_img // tc
    tile = pl.program_id(1) * n_tile_cols + pl.program_id(2)
    basis2 = _mxu_basis(tc, lane_split, s_img) if mxu_reduce else None
    k_tot = grad_ref.shape[-1]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (FF, 1, 1), 0)
    lt = counts_ref[bi, tile]
    n_groups = (lt + FF - 1) // FF

    def body(grp, _):
        cv, id_row = _gather_cv(ids_ref, consts_ref, grp)
        g = _chunk_geometry(cv, xs, ys, x2, y2, sigma1, sigma2, near, far,
                            yh=yh, cross=cross)
        valid = (grp * FF + sub_iota) < lt
        g = _mask_invalid(g, valid)

        def backprop(_):
            assembled = _bwd_chunk_grads(
                g, cv, pix, sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d,
                gamma_t=gamma_t, near=near, far=far, z_offset=z_offset,
                tex_res=tex_res, mxu_reduce=mxu_reduce, basis2=basis2,
                xs=xs, ys=ys, yh=yh, k_tot=k_tot, lane_split=lane_split,
                tc=tc)
            # belt-and-braces: padding rows are analytically zero already
            assembled = assembled * valid[:, :, 0].astype(jnp.float32)
            for j in range(FF):
                fid = id_row[0, j]
                grad_ref[0, pl.ds(fid, 1), :] += assembled[j:j + 1, :]
            return 0

        return jax.lax.cond(jnp.any(g["contrib2"]), backprop,
                            lambda _: 0, 0)

    jax.lax.fori_loop(0, n_groups, body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _grid_and_specs(b, f_pad, image_size, k_tot=K, lane_split=False):
    s = image_size
    if lane_split:
        # pixel arrays are pre-scrambled to (B, S/2, 2S); each (1, 8, 128)
        # block is one full vreg covering a 16x64-pixel region
        tc = TC
        grid = (b, s // (2 * TR), s // (TC // 2))
    else:
        tc = min(TC, s)
        grid = (b, s // TR, s // tc)
    consts_spec = pl.BlockSpec((1, f_pad, k_tot),
                               lambda bi, pr, pc, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
    pix_spec = pl.BlockSpec((1, TR, tc), lambda bi, pr, pc, *_: (bi, pr, pc),
                            memory_space=pltpu.VMEM)
    return grid, consts_spec, pix_spec, tc


def _ng_pad(f_pad: int) -> int:
    """Group rows per tile in the compacted id lists: f_pad/FF rounded up to
    a multiple of 8, the Mosaic sublane quantum for the (1, NG, FF) VMEM
    block (see compute_tile_lists)."""
    return -(-(f_pad // FF) // 8) * 8


def _ids_spec(grid, f_pad):
    """BlockSpec for the compact kernels' per-tile id lists: one (1, NG, FF)
    block per (batch, tile) out of the (B, T*NG, FF) array."""
    n_cols = grid[2]
    return pl.BlockSpec((1, _ng_pad(f_pad), FF),
                        lambda bi, pr, pc, *_: (bi, pr * n_cols + pc, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=(
    "image_size", "sigma1", "sigma2", "gamma_d", "gamma_t", "near", "far",
    "bg_eps", "z_offset", "interpret", "tex_res", "lane_split", "compact"))
def _fwd_call(consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
              near, far, bg_eps, z_offset, interpret=False, tex_res=0,
              lane_split=False, compact=False):
    b, f_pad, k_tot = consts.shape
    s = image_size
    grid, consts_spec, pix_spec, tc = _grid_and_specs(b, f_pad, image_size,
                                                      k_tot, lane_split)
    n_out = 13
    pad = math.sqrt(sigma2 * C.DIST_CUT)
    if compact:
        counts, ids = compute_tile_lists(consts, s, pad, lane_split)
        kernel = functools.partial(
            _fwd_kernel_compact, image_size=s,
            sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d, gamma_t=gamma_t,
            near=near, far=far, bg_eps=bg_eps, z_offset=z_offset,
            tex_res=tex_res, lane_split=lane_split)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[consts_spec, _ids_spec(grid, f_pad)],
            out_specs=[pix_spec] * n_out,
        )
        args = (counts, consts, ids)
    else:
        spans, masks = compute_chunk_info(consts, s, pad, lane_split)
        kernel = functools.partial(
            _fwd_kernel, image_size=s, n_chunks=f_pad // FF,
            sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d, gamma_t=gamma_t,
            near=near, far=far, bg_eps=bg_eps, z_offset=z_offset,
            tex_res=tex_res, lane_split=lane_split)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[consts_spec],
            out_specs=[pix_spec] * n_out,
        )
        args = (spans, masks, consts)
    out_sh = (b, s // 2, 2 * s) if lane_split else (b, s, s)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(out_sh, jnp.float32)] * n_out,
        interpret=interpret,
    )(*args)
    if lane_split:
        outs = [_unscramble(o) for o in outs]
    names = ["alpha1", "alpha2", "depth", "texr", "texg", "texb",
             "matr", "matg", "matb", "m_d", "s_d", "m_t", "s_t"]
    return dict(zip(names, outs))


@functools.partial(jax.jit, static_argnames=(
    "image_size", "sigma1", "sigma2", "gamma_d", "gamma_t", "near", "far",
    "bg_eps", "z_offset", "interpret", "tex_res", "mxu_reduce",
    "lane_split", "compact"))
def _bwd_call(consts, fwd_out, grads, image_size, sigma1, sigma2,
              gamma_d, gamma_t, near, far, bg_eps, z_offset, interpret=False,
              tex_res=0, mxu_reduce=False, lane_split=False, compact=False):
    b, f_pad, k_tot = consts.shape
    grid, consts_spec, pix_spec, tc = _grid_and_specs(b, f_pad, image_size,
                                                      k_tot, lane_split)
    pad = math.sqrt(sigma2 * C.DIST_CUT)
    grad_spec = pl.BlockSpec((1, f_pad, k_tot),
                             lambda bi, pr, pc, *_: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    residual_names = ["alpha1", "alpha2", "depth", "texr", "texg", "texb",
                      "m_d", "s_d", "m_t", "s_t"]
    grad_names = ["alpha1", "alpha2", "depth", "texr", "texg", "texb"]
    pix_in = [fwd_out[n] for n in residual_names] + \
        [grads[n] for n in grad_names]
    if lane_split:
        pix_in = [_scramble(p) for p in pix_in]
    if compact:
        counts, ids = compute_tile_lists(consts, image_size, pad, lane_split)
        kernel = functools.partial(
            _bwd_kernel_compact, image_size=image_size,
            sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d, gamma_t=gamma_t,
            near=near, far=far, bg_eps=bg_eps, z_offset=z_offset,
            tex_res=tex_res, mxu_reduce=mxu_reduce, lane_split=lane_split)
        inputs = [counts, consts, ids] + pix_in
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[consts_spec, _ids_spec(grid, f_pad)] + [pix_spec] * 16,
            out_specs=grad_spec,
        )
    else:
        spans, masks = compute_chunk_info(consts, image_size, pad, lane_split)
        kernel = functools.partial(
            _bwd_kernel, image_size=image_size, n_chunks=f_pad // FF,
            sigma1=sigma1, sigma2=sigma2, gamma_d=gamma_d, gamma_t=gamma_t,
            near=near, far=far, bg_eps=bg_eps, z_offset=z_offset,
            tex_res=tex_res, mxu_reduce=mxu_reduce, lane_split=lane_split)
        inputs = [spans, masks, consts] + pix_in
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[consts_spec] + [pix_spec] * 16,
            out_specs=grad_spec,
        )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f_pad, k_tot), jnp.float32),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8,
                                                    9, 10, 11))
def raster_fused_core(consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
                      near, far, bg_eps, z_offset, interpret, tex_res=0):
    out = _fwd_call(consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
                    near, far, bg_eps, z_offset, interpret, tex_res,
                    lane_split=lane_split_for(image_size),
                    compact=compact_for(image_size))
    return {k: out[k] for k in ("alpha1", "alpha2", "depth",
                                "texr", "texg", "texb",
                                "matr", "matg", "matb")}


def _core_fwd(consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
              near, far, bg_eps, z_offset, interpret, tex_res=0):
    out = _fwd_call(consts, image_size, sigma1, sigma2, gamma_d, gamma_t,
                    near, far, bg_eps, z_offset, interpret, tex_res,
                    lane_split=lane_split_for(image_size),
                    compact=compact_for(image_size))
    public = {k: out[k] for k in ("alpha1", "alpha2", "depth",
                                  "texr", "texg", "texb",
                                  "matr", "matg", "matb")}
    return public, (consts, out)


def _core_bwd(image_size, sigma1, sigma2, gamma_d, gamma_t, near, far,
              bg_eps, z_offset, interpret, tex_res, res, g):
    consts, fwd_out = res
    grads = {"alpha1": g["alpha1"], "alpha2": g["alpha2"], "depth": g["depth"],
             "texr": g["texr"], "texg": g["texg"], "texb": g["texb"]}
    grads = {k: jnp.asarray(v, jnp.float32) for k, v in grads.items()}
    dconsts = _bwd_call(consts, fwd_out, grads, image_size, sigma1, sigma2,
                        gamma_d, gamma_t, near, far, bg_eps, z_offset,
                        interpret, tex_res, mxu_reduce=MXU_REDUCE,
                        lane_split=lane_split_for(image_size),
                        compact=compact_for(image_size))
    return (dconsts,)


raster_fused_core.defvjp(_core_fwd, _core_bwd)
