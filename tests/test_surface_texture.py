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
