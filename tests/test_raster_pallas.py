"""Pallas fused rasterizer vs dense reference: forward and gradients.

Runs the kernels in interpreter mode on CPU; the same code path compiles on
TPU (exercised by bench.py / the driver's compile check).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.ops.rasterizer import render_fused
from selfcorr_tpu.ops.rasterizer import common as C


def make_scene(seed=0, b=2, n_faces=5, size=0.7, z0=5.0):
    """Random small triangles in NDC at varying depths."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.5, 0.5, (b, n_faces, 1, 2))
    tri = rng.uniform(-size / 2, size / 2, (b, n_faces, 3, 2))
    xy = np.clip(centers + tri, -0.95, 0.95)
    z = z0 + rng.uniform(-1.0, 1.0, (b, n_faces, 3, 1))
    fv = np.concatenate([xy, z], axis=-1).astype(np.float32)
    soft_tex = rng.rand(b, n_faces, 3, 3).astype(np.float32)
    hard_tex = rng.rand(b, n_faces, 3, 3).astype(np.float32)
    return jnp.asarray(fv), jnp.asarray(soft_tex), jnp.asarray(hard_tex)


S = 16  # tiny image so the dense reference is cheap


def test_forward_matches_dense():
    fv, st, ht = make_scene()
    dense = render_fused(fv, st, ht, S, backend="dense")
    pallas = render_fused(fv, st, ht, S, backend="pallas", interpret=True)
    # sigma=1e-4 quantities: fma/order differences amplified ~1e4 at edges
    np.testing.assert_allclose(np.asarray(pallas["alpha1"]),
                               np.asarray(dense["alpha1"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pallas["alpha2"]),
                               np.asarray(dense["alpha2"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pallas["depth"]),
                               np.asarray(dense["depth"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(pallas["tex"]),
                               np.asarray(dense["tex"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pallas["match"]),
                               np.asarray(dense["match"]), atol=2e-3)


def test_forward_single_batch_many_faces_padding():
    # face count not a multiple of the chunk size exercises padding
    fv, st, ht = make_scene(seed=3, b=1, n_faces=21)
    dense = render_fused(fv, st, ht, S, backend="dense")
    pallas = render_fused(fv, st, ht, S, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(pallas["alpha1"]),
                               np.asarray(dense["alpha1"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pallas["tex"]),
                               np.asarray(dense["tex"]), atol=2e-3)


def _loss(outputs, keys=("alpha1", "alpha2", "depth", "tex")):
    # arbitrary smooth functional mixing all differentiable outputs
    total = 0.0
    for i, k in enumerate(keys):
        total = total + jnp.sum(jnp.sin(outputs[k] * (0.7 + 0.1 * i)))
    return total


def test_gradients_match_dense():
    fv, st, ht = make_scene(seed=1, b=1, n_faces=4, size=0.9)

    def loss_fn(backend):
        def f(fv_, st_):
            out = render_fused(fv_, st_, ht, S, backend=backend,
                               interpret=True)
            return _loss(out)
        return f

    g_dense = jax.grad(loss_fn("dense"), argnums=(0, 1))(fv, st)
    g_pallas = jax.grad(loss_fn("pallas"), argnums=(0, 1))(fv, st)

    for gd, gp, name in [(g_dense[0], g_pallas[0], "verts"),
                         (g_dense[1], g_pallas[1], "soft_tex")]:
        gd = np.asarray(gd)
        gp = np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gd / scale, atol=5e-3,
                                   err_msg=name)


def test_gradients_finite_difference_z_and_tex():
    """FD check of the custom VJP along paths where the SoftRas gradient is
    exact: vertex z (softmax depth weighting) and texture colors. (xy
    gradients are deliberately approximate in SoftRas — interpolation
    weights are stop-gradient'ed — so raw FD cannot validate them; they are
    instead validated against the dense reference's autodiff above.)"""
    fv, st, ht = make_scene(seed=2, b=1, n_faces=2, size=0.8)
    kw = dict(sigma1=3e-3, sigma2=6e-3, gamma_d=2e-2, gamma_t=3e-2)

    def f(fv_, st_):
        out = render_fused(fv_, st_, ht, S, backend="pallas", interpret=True,
                           **kw)
        return _loss(out)

    gv, gt = jax.grad(f, argnums=(0, 1))(fv, st)
    gv, gt = np.asarray(gv), np.asarray(gt)
    rng = np.random.RandomState(0)
    eps = 1e-3
    for _ in range(4):  # vertex z perturbations
        i, j = rng.randint(2), rng.randint(3)
        fp = fv.at[0, i, j, 2].add(eps)
        fm = fv.at[0, i, j, 2].add(-eps)
        fd = (float(f(fp, st)) - float(f(fm, st))) / (2 * eps)
        an = gv[0, i, j, 2]
        assert abs(fd - an) <= 2e-2 * max(1.0, abs(fd)), ("z", i, j, fd, an)
    for _ in range(4):  # texture perturbations
        i, j, k = rng.randint(2), rng.randint(3), rng.randint(3)
        sp = st.at[0, i, j, k].add(eps)
        sm = st.at[0, i, j, k].add(-eps)
        fd = (float(f(fv, sp)) - float(f(fv, sm))) / (2 * eps)
        an = gt[0, i, j, k]
        assert abs(fd - an) <= 2e-2 * max(1.0, abs(fd)), ("tex", i, j, k, fd, an)


def test_hard_match_has_no_gradient():
    fv, st, ht = make_scene(seed=4, b=1, n_faces=3)

    def f(ht_):
        out = render_fused(fv, st, ht_, S, backend="pallas", interpret=True)
        return jnp.sum(out["match"])

    g = np.asarray(jax.grad(f)(ht))
    np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_empty_scene_background():
    fv = jnp.asarray(np.array([[[[5.0, 5.0, 5.0]] * 3]], np.float32))  # off-screen
    st = jnp.ones((1, 1, 3, 3))
    ht = jnp.ones((1, 1, 3, 3))
    out = render_fused(fv, st, ht, S, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out["alpha1"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               1.0 - 0.0, atol=1e-5)  # white bg depth channel
    np.testing.assert_allclose(np.asarray(out["match"]), 0.0, atol=1e-6)


def test_face_order_invariance():
    """Sorting faces at packing (band-major/x-minor) must not change any
    output: all aggregations are order-invariant."""
    from selfcorr_tpu.ops.rasterizer import pallas_raster as PR
    from selfcorr_tpu.ops.rasterizer import common as C

    fv, st, ht = make_scene(seed=7, b=1, n_faces=9)
    outs = {}
    for sort in (True, False):
        consts = PR.pack_constants(fv, st, ht, sort_faces=sort)
        outs[sort] = PR.raster_fused_core(
            consts, S, 1e-4, 1e-3, 1e-4, 1e-2, C.NEAR, C.FAR, C.BG_EPS,
            C.EYE_OFFSET, True)
    for k in outs[True]:
        np.testing.assert_allclose(np.asarray(outs[True][k]),
                                   np.asarray(outs[False][k]), atol=2e-3,
                                   err_msg=k)


def test_gradients_match_dense_with_sorting():
    """Gradient unsorting through the packing gather must be exact."""
    fv, st, ht = make_scene(seed=8, b=1, n_faces=6, size=0.8)

    def loss_fn(backend):
        def f(fv_, st_):
            out = render_fused(fv_, st_, ht, S, backend=backend,
                               interpret=True)
            return _loss(out)
        return f

    g_dense = jax.grad(loss_fn("dense"), argnums=(0, 1))(fv, st)
    g_pallas = jax.grad(loss_fn("pallas"), argnums=(0, 1))(fv, st)
    for gd, gp, name in [(g_dense[0], g_pallas[0], "verts"),
                         (g_dense[1], g_pallas[1], "soft_tex")]:
        gd, gp = np.asarray(gd), np.asarray(gp)
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gd / scale, atol=5e-3,
                                   err_msg=name)


def test_lane_split_scramble_roundtrip():
    """_scramble/_unscramble are exact inverses (the lane-split pixel
    layout: (B,S,S) <-> (B,S/2,2S), lane = row_half*64 + col%64)."""
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64)
                    .astype(np.float32))
    rt = P._unscramble(P._scramble(x))
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))
    # spot-check the documented mapping at one scrambled position
    z = np.asarray(P._scramble(x))
    assert z[1, 3 * 8 + 5, 0 * 128 + 1 * 64 + 17] == \
        np.asarray(x)[1, 3 * 16 + 1 * 8 + 5, 0 * 64 + 17]


def test_lane_split_matches_dense_fwd_and_grads():
    """At S=64 the lane-split geometry is active (lane_split_for); forward
    and gradients must match the dense reference exactly like the classic
    path does at S=16."""
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    assert P.lane_split_for(64) and P.lane_split_for(256)
    assert not P.lane_split_for(S)    # tests above exercise classic tiles

    fv, st, ht = make_scene(seed=11, b=1, n_faces=6, size=0.9)
    s64 = 64
    dense = render_fused(fv, st, ht, s64, backend="dense")
    pallas = render_fused(fv, st, ht, s64, backend="pallas", interpret=True)
    for k, tol in [("alpha1", 2e-3), ("alpha2", 2e-3), ("depth", 2e-2),
                   ("tex", 2e-3), ("match", 2e-3)]:
        np.testing.assert_allclose(np.asarray(pallas[k]),
                                   np.asarray(dense[k]), atol=tol,
                                   err_msg=k)

    def loss_fn(backend):
        def f(fv_, st_):
            out = render_fused(fv_, st_, ht, s64, backend=backend,
                               interpret=True)
            return _loss(out)
        return f

    g_dense = jax.grad(loss_fn("dense"), argnums=(0, 1))(fv, st)
    g_pallas = jax.grad(loss_fn("pallas"), argnums=(0, 1))(fv, st)
    for gd, gp, name in [(g_dense[0], g_pallas[0], "verts"),
                         (g_dense[1], g_pallas[1], "soft_tex")]:
        gd, gp = np.asarray(gd), np.asarray(gp)
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gd / scale, atol=5e-3,
                                   err_msg=name)


@pytest.mark.parametrize("s_img", [S, 64])
def test_compact_matches_chunked(monkeypatch, s_img):
    """The compacted per-tile face-list kernels (pallas_raster.COMPACT,
    compute_tile_lists + gathered groups) must reproduce the dense-chunk
    kernels' outputs and gradients on both tile geometries (classic at
    S=16, lane-split at S=64) — this pins BOTH arms explicitly regardless
    of the module default; n_faces=21 also exercises list construction
    with padded faces and partially-valid groups."""
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    fv, st, ht = make_scene(seed=7, b=2, n_faces=21, size=0.9)

    def run(compact):
        monkeypatch.setattr(P, "COMPACT", compact)

        def f(fv_, st_):
            out = render_fused(fv_, st_, ht, s_img, backend="pallas",
                               interpret=True)
            return _loss(out)

        out = render_fused(fv, st, ht, s_img, backend="pallas",
                           interpret=True)
        g = jax.grad(f, argnums=(0, 1))(fv, st)
        return out, g

    out_c, g_c = run(True)
    out_d, g_d = run(False)
    for k in ("alpha1", "alpha2", "depth", "tex", "match"):
        np.testing.assert_allclose(np.asarray(out_c[k]), np.asarray(out_d[k]),
                                   atol=1e-5, err_msg=k)
    for gc, gd, name in [(g_c[0], g_d[0], "verts"),
                         (g_c[1], g_d[1], "soft_tex")]:
        gc, gd = np.asarray(gc), np.asarray(gd)
        scale = np.abs(gd).max() + 1e-8
        # same ascending face order; only the group boundaries (and thus
        # float accumulation grouping) differ
        np.testing.assert_allclose(gc / scale, gd / scale, atol=1e-5,
                                   err_msg=name)


def test_compact_tile_lists_exact():
    """compute_tile_lists vs a brute-force bbox overlap: counts match, the
    first `count` ids are exactly the live faces in ascending order."""
    import math as _math
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    fv, st, ht = make_scene(seed=5, b=2, n_faces=21, size=0.9)
    consts = P.pack_constants(fv, st, ht)
    pad = _math.sqrt(1e-3 * C.DIST_CUT)
    counts, ids = P.compute_tile_lists(consts, S, pad, lane_split=False)
    counts, ids = np.asarray(counts), np.asarray(ids)
    b, f_pad, _ = consts.shape
    bb = np.asarray(consts[..., P.S_BBOX:P.S_BBOX + 4])
    tr_px, tc_px = P.TR, min(P.TC, S)
    n_rows, n_cols = S // tr_px, S // tc_px
    ids = ids.reshape(b, n_rows * n_cols, -1)   # per-tile row is
    # _ng_pad(f_pad)*FF >= f_pad ids (sublane-rounded group rows)
    for bi in range(b):
        for r in range(n_rows):
            for c in range(n_cols):
                y_hi = (S - 1.0 - 2.0 * (r * tr_px)) / S + pad
                y_lo = (S - 1.0 - 2.0 * (r * tr_px + tr_px - 1)) / S - pad
                x_lo = (2.0 * (c * tc_px) + 1.0 - S) / S - pad
                x_hi = (2.0 * ((c + 1.0) * tc_px - 1.0) + 1.0 - S) / S + pad
                live = [f for f in range(f_pad)
                        if bb[bi, f, 2] <= y_hi and bb[bi, f, 3] >= y_lo
                        and bb[bi, f, 0] <= x_hi and bb[bi, f, 1] >= x_lo]
                t = r * n_cols + c
                assert counts[bi, t] == len(live), (bi, r, c)
                assert list(ids[bi, t, :len(live)]) == live, (bi, r, c)


def test_gradients_match_dense_mxu_reduce(monkeypatch):
    """The MXU_REDUCE backward arm (batched-matmul pixel reductions,
    pallas_raster.MXU_REDUCE) must produce the same gradients as the
    default VPU arm; mxu_reduce is a static arg of _bwd_call so flipping
    the module flag retraces correctly in-process."""
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    fv, st, ht = make_scene(seed=3, b=1, n_faces=6, size=0.9)

    def f(fv_, st_):
        out = render_fused(fv_, st_, ht, S, backend="pallas",
                           interpret=True)
        return _loss(out)

    g_vpu = jax.grad(f, argnums=(0, 1))(fv, st)
    monkeypatch.setattr(P, "MXU_REDUCE", True)
    g_mxu = jax.grad(f, argnums=(0, 1))(fv, st)
    for gv, gm, name in [(g_vpu[0], g_mxu[0], "verts"),
                         (g_vpu[1], g_mxu[1], "soft_tex")]:
        gv, gm = np.asarray(gv), np.asarray(gm)
        scale = np.abs(gv).max() + 1e-8
        # matmul vs tree-reduce summation order: ~1e-5-level f32 noise
        np.testing.assert_allclose(gm / scale, gv / scale, atol=2e-4,
                                   err_msg=name)
