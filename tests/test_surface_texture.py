import numpy as np
import jax.numpy as jnp

from selfcorr_tpu.models.surface_texture import (barycentric_pattern,
                                                 surface_texture,
                                                 sample_surface_texture)
from selfcorr_tpu.ops.rasterizer.reference import rasterize_dense


def test_barycentric_pattern_reference_semantics():
    """Mirror of the reference construction (surface_texture.py:8-18)."""
    import torch
    n = 4
    xx = torch.zeros(n ** 2)
    yy = torch.arange((2 * n - 1) / (2.0 * n), 0,
                      step=-1.0 / n)[None].repeat(n, 1).reshape(-1)
    for i in range(n):
        xx[i * n:(i + 1) * n] = (2 * i + 1) / (2.0 * n)
        yy[i * n:(i + 1) * n] -= i / (1.0 * n)
    xx[yy < 0] = 1 - xx[yy < 0]
    yy[yy < 0] *= -1
    pat = barycentric_pattern(n)
    np.testing.assert_allclose(pat[:, 0], xx.numpy(), atol=1e-6)
    np.testing.assert_allclose(pat[:, 1], yy.numpy(), atol=1e-6)


def test_surface_texture_shapes_and_constant_image():
    b, v, f, n = 2, 4, 2, 3
    img = jnp.ones((b, 16, 16, 3)) * 0.5
    imatch = jnp.zeros((b, v, 2))
    faces = jnp.asarray([[0, 1, 2], [1, 2, 3]])
    tex = surface_texture(img, imatch, faces, n)
    assert tex.shape == (b, f, n * n, 3)
    np.testing.assert_allclose(np.asarray(tex), 0.5, atol=1e-6)


def test_sample_surface_texture_cells():
    res = 2
    tex = jnp.arange(res * res * 3, dtype=jnp.float32).reshape(
        1, 1, res * res, 3)
    # w = (0.9, 0.05, 0.05) -> cell (wx=1, wy=0) -> texel index 1
    out = sample_surface_texture(tex, jnp.asarray([[0.9]]),
                                 jnp.asarray([[0.05]]),
                                 jnp.asarray([[0.05]]), res)
    assert out.shape == (1, 1, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(tex[0, 0, 1]))


def _surface_scene(seed=0, b=2, n_faces=5, res=3):
    from tests.test_raster_pallas import make_scene
    fv, st, ht = make_scene(seed=seed, b=b, n_faces=n_faces)
    rng = np.random.RandomState(seed + 100)
    surf = jnp.asarray(rng.rand(b, n_faces, res * res, 3).astype(np.float32))
    return fv, st, ht, surf


def test_fused_surface_matches_dense():
    """Pallas surface-texture mode vs the dense 'surface' reference."""
    from selfcorr_tpu.ops.rasterizer import render_fused
    fv, st, ht, surf = _surface_scene()
    dense = render_fused(fv, st, ht, 16, backend="dense", surf_tex=surf)
    pallas = render_fused(fv, st, ht, 16, backend="pallas", interpret=True,
                          surf_tex=surf)
    for k in ("alpha1", "alpha2", "depth", "tex", "match"):
        np.testing.assert_allclose(np.asarray(pallas[k]),
                                   np.asarray(dense[k]),
                                   atol=2e-2 if k == "depth" else 2e-3,
                                   err_msg=k)


def test_fused_surface_matches_dense_lane_split():
    """Surface mode through the lane-split tile geometry (active at S=64,
    pallas_raster.lane_split_for) — the texel fold select must survive the
    scrambled pixel layout."""
    from selfcorr_tpu.ops.rasterizer import render_fused
    fv, st, ht, surf = _surface_scene(seed=5, b=1, n_faces=4)
    dense = render_fused(fv, st, ht, 64, backend="dense", surf_tex=surf)
    pallas = render_fused(fv, st, ht, 64, backend="pallas", interpret=True,
                          surf_tex=surf)
    for k in ("alpha1", "alpha2", "depth", "match"):
        np.testing.assert_allclose(np.asarray(pallas[k]),
                                   np.asarray(dense[k]),
                                   atol=2e-2 if k == "depth" else 2e-3,
                                   err_msg=k)
    # the surface texel lookup is DISCONTINUOUS (cell + diagonal fold);
    # the lane-split affine regrouping shifts fp rounding at pixels whose
    # barycentrics land EXACTLY on a fold boundary, legitimately flipping
    # texels (verified: every outlier here is at boundary distance 0 —
    # same class the on-chip parity gate tolerates at <2%)
    d = np.abs(np.asarray(pallas["tex"]) - np.asarray(dense["tex"]))
    outliers = (d > 2e-3).mean()
    assert outliers < 0.01, f"tex outlier rate {outliers:.4f}"


def test_fused_surface_gradients_match_dense():
    import jax
    from selfcorr_tpu.ops.rasterizer import render_fused
    from tests.test_raster_pallas import _loss
    fv, st, ht, surf = _surface_scene(seed=2, b=1, n_faces=4, res=2)

    def loss_fn(backend):
        def f(fv_, surf_):
            out = render_fused(fv_, st, ht, 16, backend=backend,
                               interpret=True, surf_tex=surf_)
            return _loss(out)
        return f

    g_dense = jax.grad(loss_fn("dense"), argnums=(0, 1))(fv, surf)
    g_pallas = jax.grad(loss_fn("pallas"), argnums=(0, 1))(fv, surf)
    for gd, gp, name in [(g_dense[0], g_pallas[0], "verts"),
                         (g_dense[1], g_pallas[1], "surf_tex")]:
        gd, gp = np.asarray(gd), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gd / scale, atol=5e-3,
                                   err_msg=name)
    # texels actually receive gradient
    assert np.abs(np.asarray(g_pallas[1])).max() > 0


def test_train_step_with_surface_texture():
    """surface_texture=True trains end-to-end on both backends."""
    import jax
    from selfcorr_tpu.models.meshnet import build_mesh_constants
    from selfcorr_tpu.train.optim import make_optimizer
    from selfcorr_tpu.train.step import init_state, make_train_step
    from tests.test_train_step import tiny_cfg, synthetic_batch

    for use_pallas in (False, True):
        cfg = tiny_cfg(surface_texture=True, n_tex_sample=2,
                       use_pallas=use_pallas)
        constants = build_mesh_constants(cfg)
        state = init_state(cfg, constants, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, state.params)
        step_fn = make_train_step(cfg, constants, tx, donate=False)
        new_state, metrics = step_fn(state, synthetic_batch(cfg),
                                     jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total_loss"])), use_pallas
        assert float(metrics["bad_grad"]) == 0.0, use_pallas


def test_dense_raster_surface_mode():
    fv = jnp.asarray(np.array(
        [[[[-0.9, -0.9, 5.0], [0.9, -0.9, 5.0], [0.0, 0.9, 5.0]]]],
        np.float32))
    res = 2
    tex = jnp.ones((1, 1, res * res, 3)) * jnp.asarray([1.0, 0.0, 0.0])
    out = rasterize_dense(fv, tex, 16, 1e-4, 1e-2, rgb_mode="softmax",
                          texture_type="surface")
    rgb = np.asarray(out[0, 8, 8, :3])
    np.testing.assert_allclose(rgb, [1, 0, 0], atol=1e-4)
