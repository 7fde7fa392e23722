import numpy as np
import jax
import jax.numpy as jnp

from selfcorr_tpu.ops import knn
from selfcorr_tpu.ops import umeyama as U
from selfcorr_tpu.ops import geometry as G


def brute_min_sq(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(-1)


def test_min_sq_dist_matches_bruteforce():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 37, 3).astype(np.float32)
    y = rng.randn(2, 53, 3).astype(np.float32)
    out = np.asarray(knn.min_sq_dist(jnp.asarray(x), jnp.asarray(y), chunk=16))
    ref = brute_min_sq(x, y)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_min_sq_dist_with_mask():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 3).astype(np.float32)
    y = rng.randn(1, 20, 3).astype(np.float32)
    valid = np.zeros((1, 20)); valid[0, :7] = 1
    out = np.asarray(knn.min_sq_dist(jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(valid), chunk=8))
    ref = brute_min_sq(x, y[:, :7])
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_chamfer_reductions():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 16, 3).astype(np.float32)
    y = rng.randn(3, 25, 3).astype(np.float32)
    per_point = np.asarray(knn.chamfer_single_way(
        jnp.asarray(x), jnp.asarray(y), point_reduction=None))
    np.testing.assert_allclose(per_point, brute_min_sq(x, y), atol=1e-4)
    scalar = float(knn.chamfer_single_way(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(scalar, brute_min_sq(x, y).mean(), atol=1e-5)


def test_nearest_idx():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 11, 3).astype(np.float32)
    y = rng.randn(2, 40, 3).astype(np.float32)
    idx = np.asarray(knn.nearest_idx(jnp.asarray(x), jnp.asarray(y), chunk=16))
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(-1))


def _make_sim(seed, n=400, noise=0.0):
    rng = np.random.RandomState(seed)
    q = rng.randn(4); q /= np.linalg.norm(q)
    R = np.asarray(G.quat_to_matrix(jnp.asarray(q))).astype(np.float32)
    s = float(rng.uniform(0.5, 3.0))
    t = rng.randn(3).astype(np.float32)
    src = rng.randn(n, 3).astype(np.float32)
    tgt = s * src @ R + t + noise * rng.randn(n, 3).astype(np.float32)
    return src, tgt, s, R, t


def test_umeyama_exact_recovery():
    src, tgt, s, R, t = _make_sim(0)
    sc, Re, tr, ok = U.umeyama_similarity(jnp.asarray(src), jnp.asarray(tgt),
                                          jnp.ones((src.shape[0],)))
    assert bool(ok)
    # the reference's mixed /n vs /(n-1) normalization biases scale by (n-1)/n
    n = src.shape[0]
    s_biased = s * (n - 1) / n
    np.testing.assert_allclose(float(sc), s_biased, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
    t_expected = tgt.mean(0) - s_biased * (src.mean(0) @ R)
    np.testing.assert_allclose(np.asarray(tr), t_expected, atol=1e-4)


def test_umeyama_matches_reference_torch():
    """Cross-check against the reference torch implementation when available."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from model.util.umeyama import estimateSimilarityUmeyama
    except Exception:
        import pytest
        pytest.skip("reference torch umeyama unavailable")
    src, tgt, *_ = _make_sim(4, n=100, noise=0.05)
    SH = torch.cat([torch.tensor(src), torch.ones(100, 1)], 1).T
    TH = torch.cat([torch.tensor(tgt), torch.ones(100, 1)], 1).T
    sc_r, R_r, t_r, _ = estimateSimilarityUmeyama(SH, TH)
    sc, Re, tr, ok = U.umeyama_similarity(jnp.asarray(src), jnp.asarray(tgt),
                                          jnp.ones((100,)))
    np.testing.assert_allclose(float(sc), float(sc_r[0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Re), R_r.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr), t_r.numpy().reshape(-1), atol=1e-3)


def test_ransac_with_outliers_and_padding():
    src, tgt, s, R, t = _make_sim(5, n=300, noise=0.01)
    # corrupt 20% with gross outliers
    rng = np.random.RandomState(9)
    out_idx = rng.choice(300, 60, replace=False)
    tgt = tgt.copy()
    tgt[out_idx] += rng.randn(60, 3) * 50.0
    # pad to 512 with garbage
    pad = 512 - 300
    src_p = np.concatenate([src, np.zeros((pad, 3), np.float32)])
    tgt_p = np.concatenate([tgt, np.full((pad, 3), 1e3, np.float32)])
    valid = np.concatenate([np.ones(300, bool), np.zeros(pad, bool)])
    res = U.ransac_umeyama(jax.random.PRNGKey(0), jnp.asarray(src_p),
                           jnp.asarray(tgt_p), jnp.asarray(valid))
    assert bool(res["ok"])
    np.testing.assert_allclose(float(res["scale"]), s, rtol=0.05)
    np.testing.assert_allclose(np.asarray(res["R"]), R, atol=0.05)
    np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.2)


def test_ransac_batch_shapes():
    src, tgt, *_ = _make_sim(6, n=64)
    srcb = jnp.asarray(np.stack([src, src]))
    tgtb = jnp.asarray(np.stack([tgt, tgt]))
    valid = jnp.ones((2, 64), bool)
    res = U.ransac_umeyama_batch(jax.random.PRNGKey(1), srcb, tgtb, valid, n_iters=20)
    assert res["R"].shape == (2, 3, 3)
    assert res["t"].shape == (2, 3)
    assert res["scale"].shape == (2,)
