"""Analytic unit tests for the dense soft-rasterizer reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.ops.rasterizer import common as C
from selfcorr_tpu.ops.rasterizer.reference import rasterize_dense, render_fused_dense


def tri(v0, v1, v2, z=5.0):
    """Single-face batch: (1,1,3,3) with constant z."""
    v = np.array([v0, v1, v2], np.float32)
    out = np.concatenate([v, np.full((3, 1), z, np.float32)], axis=1)
    return jnp.asarray(out[None, None])


BIG = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9])
TEX1 = jnp.asarray(np.array([[[[1, 0, 0], [0, 1, 0], [0, 0, 1]]]], np.float32))


def test_alpha_inside_outside():
    out = rasterize_dense(BIG, TEX1, 32, sigma=1e-4, gamma=1e-4, rgb_mode="none")
    a = np.asarray(out[0, :, :, 3])
    # deep interior pixel ~ fully covered; far corner ~ 0 (distance cut)
    assert a[16, 16] > 0.999
    assert a[0, 31] == 0.0
    assert a[31, 0] < 1e-3


def test_pixel_grid_orientation():
    # triangle in upper half (y > 0) must light up TOP image rows
    t = tri([-0.5, 0.1], [0.5, 0.1], [0.0, 0.9])
    out = rasterize_dense(t, TEX1, 16, sigma=1e-4, gamma=1e-4, rgb_mode="none")
    a = np.asarray(out[0, :, :, 3])
    assert a[: 8].sum() > 10 * a[8:].sum()


def test_alpha_prod_two_faces():
    # two identical faces: alpha = 1 - (1-D)^2
    fv = jnp.concatenate([BIG, BIG], axis=1)
    tex = jnp.concatenate([TEX1, TEX1], axis=1)
    one = rasterize_dense(BIG, TEX1, 16, 1e-2, 1e-2, rgb_mode="none")
    two = rasterize_dense(fv, tex, 16, 1e-2, 1e-2, rgb_mode="none")
    a1 = np.asarray(one[..., 3])
    a2 = np.asarray(two[..., 3])
    np.testing.assert_allclose(a2, 1 - (1 - a1) ** 2, atol=1e-6)


def test_hard_rgb_barycentric_interp():
    out = rasterize_dense(BIG, TEX1, 32, sigma=1e-4, gamma=1e-3, rgb_mode="hard")
    rgb = np.asarray(out[0, :, :, :3])
    # interior pixel: colors sum to 1 (barycentric convex combo of RGB corners)
    np.testing.assert_allclose(rgb[16, 16].sum(), 1.0, atol=1e-5)
    # background pixel = bg color (0)
    np.testing.assert_allclose(rgb[0, 31], 0.0, atol=1e-7)


def test_hard_rgb_depth_order():
    near_f = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9], z=3.0)
    far_f = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9], z=8.0)
    fv = jnp.concatenate([far_f, near_f], axis=1)
    tex = jnp.asarray(np.stack([
        np.ones((1, 3, 3), np.float32) * np.array([1, 0, 0], np.float32),
        np.ones((1, 3, 3), np.float32) * np.array([0, 1, 0], np.float32)], 1))
    out = rasterize_dense(fv, tex, 16, sigma=1e-4, gamma=1e-3, rgb_mode="hard")
    rgb = np.asarray(out[0, 8, 8, :3])
    np.testing.assert_allclose(rgb, [0, 1, 0], atol=1e-5)  # near face wins


def test_softmax_depth_aggregation():
    # constant-z face: softmax-aggregated 'depth texture' == that z
    z = 4.0
    zcam = jnp.full((1, 1, 3, 3), z)
    out = rasterize_dense(BIG, zcam, 16,
                          sigma=1e-4, gamma=1e-4, rgb_mode="softmax",
                          bg_color=(1.0, 1.0, 1.0))
    d = np.asarray(out[0, 8, 8, 2])
    np.testing.assert_allclose(d, z, rtol=1e-5)
    # empty pixel: white background
    np.testing.assert_allclose(np.asarray(out[0, 0, 15, 2]), 1.0, atol=1e-6)


def test_softmax_two_depths_sharp_gamma():
    near_f = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9], z=3.0)
    far_f = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9], z=8.0)
    fv = jnp.concatenate([far_f, near_f], axis=1)
    tex = jnp.concatenate([jnp.zeros((1, 1, 3, 3)), jnp.ones((1, 1, 3, 3))], 1)
    out = rasterize_dense(fv, tex, 16, sigma=1e-4, gamma=1e-4, rgb_mode="softmax")
    # gamma tiny -> winner-take-all by depth: near face color 1
    np.testing.assert_allclose(np.asarray(out[0, 8, 8, 0]), 1.0, atol=1e-4)


def test_z_range_clip_keeps_alpha():
    too_near = tri([-0.9, -0.9], [0.9, -0.9], [0.0, 0.9], z=0.5)  # < near=1
    out = rasterize_dense(too_near, TEX1, 16, 1e-4, 1e-2, rgb_mode="softmax",
                          bg_color=(1.0, 1.0, 1.0))
    a = np.asarray(out[0, 8, 8, 3])
    rgb = np.asarray(out[0, 8, 8, :3])
    assert a > 0.999                      # alpha survives
    np.testing.assert_allclose(rgb, 1.0, atol=1e-6)  # rgb falls to background


def test_mask_gradient_direction():
    # shrinking loss = (1 - alpha) at a pixel just outside the triangle should
    # pull the near edge toward the pixel
    t = tri([-0.5, -0.5], [0.5, -0.5], [0.0, 0.5])

    def loss(fv):
        out = rasterize_dense(fv, TEX1, 16, sigma=1e-2, gamma=1e-2, rgb_mode="none")
        return (1.0 - out[0, :, :, 3]).sum()

    g = jax.grad(loss)(t)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # z gradients are zero for pure alpha loss (coverage is xy-only)
    np.testing.assert_allclose(np.asarray(g[..., 2]), 0.0, atol=1e-8)


def test_softmax_z_gradient_nonzero():
    def loss(fv):
        zcam = jnp.broadcast_to(fv[..., 2:], fv.shape[:3] + (3,))
        out = rasterize_dense(fv, zcam, 16, sigma=1e-3, gamma=1e-2,
                              rgb_mode="softmax")
        return out[0, :, :, 2].sum()

    g = jax.grad(loss)(BIG)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g[..., 2]).sum()) > 0


def test_interp_weights_are_stop_grad():
    # texture gradient must equal sum of w_clip per corner (no grad through w)
    def loss(tex):
        out = rasterize_dense(BIG, tex, 8, 1e-4, 1e-2, rgb_mode="softmax")
        return out[0, :, :, 0].sum()

    g = np.asarray(jax.grad(loss)(TEX1))
    assert np.isfinite(g).all()
    assert g[0, 0, :, 0].sum() > 0   # red channel receives gradient
    np.testing.assert_allclose(g[0, 0, :, 1], 0, atol=1e-8)  # green does not


def test_fused_dense_shapes_and_consistency():
    fv = jnp.concatenate([BIG, tri([-0.3, -0.3], [0.4, -0.2], [0.1, 0.5], z=4.0)], 1)
    soft_tex = jnp.asarray(np.random.RandomState(0).rand(1, 2, 3, 3), jnp.float32)
    hard_tex = jnp.asarray(np.random.RandomState(1).rand(1, 2, 3, 3), jnp.float32)
    out = render_fused_dense(fv, soft_tex, hard_tex, 16)
    assert out["alpha1"].shape == (1, 16, 16)
    assert out["tex"].shape == (1, 16, 16, 3)
    # alpha1 equals a direct sigma=1e-4 rasterize
    direct = rasterize_dense(fv, soft_tex, 16, 1e-4, 1e-4, rgb_mode="none")
    # jit FMA contraction perturbs d^2 by ~1e-9 which sigma=1e-4 amplifies to
    # ~1e-4 in boundary coverage values; that is numerically immaterial
    np.testing.assert_allclose(np.asarray(out["alpha1"]),
                               np.asarray(direct[..., 3]), atol=2e-3)
    # depth at a covered pixel is the camera z (z - EYE_OFFSET)
    d = np.asarray(out["depth"][0, 8, 8])
    np.testing.assert_allclose(d, 4.0 - C.EYE_OFFSET, rtol=1e-3)
