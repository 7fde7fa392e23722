"""Cross-module coordinate-convention audit: projection, texture sampling
and rasterization must agree on where a camera-space point lands in the
image (this is where y-flip bugs would hide)."""
import numpy as np
import jax.numpy as jnp

from selfcorr_tpu.ops import geometry as G
from selfcorr_tpu.ops.image_ops import grid_sample
from selfcorr_tpu.ops.rasterizer.reference import rasterize_dense
from selfcorr_tpu.ops.rasterizer.common import EYE_OFFSET

S = 64
PP = jnp.zeros((1, 2))
FOC = jnp.full((1, 2), 2.0)


def test_imatch_gt_texture_sampling_roundtrip():
    # camera point (0.5, 0.25, 4) -> unflipped NDC (0.25, 0.125)
    v_cam = jnp.asarray([[[0.5, 0.25, 4.0]]])
    im_gt = G.project_ndc(v_cam, PP, FOC, flip_y=False)[..., :2]
    np.testing.assert_allclose(np.asarray(im_gt)[0, 0], [0.25, 0.125],
                               atol=1e-6)
    # paint the image at the corresponding pixel (ix = (x+1)*S/2 - 0.5)
    img = np.zeros((1, S, S, 3), np.float32)
    img[0, 35:37, 39:41] = [0.2, 0.7, 0.9]
    col = np.asarray(grid_sample(jnp.asarray(img), im_gt))[0, 0]
    np.testing.assert_allclose(col, [0.2, 0.7, 0.9], atol=1e-5)


def test_rasterized_depth_lands_at_projected_pixel():
    tri_cam = jnp.asarray([[[0.3, 0.0, 4.0], [0.7, 0.0, 4.0],
                            [0.5, 0.5, 4.0]]])
    proj = G.project_ndc(tri_cam, PP, FOC, flip_y=True)
    rast = proj.at[..., 2].add(EYE_OFFSET).reshape(1, 1, 3, 3)
    zc = jnp.broadcast_to((rast[..., 2] - EYE_OFFSET)[..., None],
                          (1, 1, 3, 3))
    out = rasterize_dense(rast, zc, S, 1e-4, 1e-4, rgb_mode="softmax",
                          bg_color=(1, 1, 1))
    # footprint: x NDC [0.15, 0.35] -> cols 38-41; the apex at camera
    # y=+0.5 flips to rasterizer y=-0.25 which is image row ~39.5 — BELOW
    # the base edge at row 31.5, i.e. camera +y is image-down (CV
    # convention); the same pixel grid_sample would address unflipped.
    assert float(out[0, 33, 39, 3]) > 0.9       # interior pixel covered
    np.testing.assert_allclose(float(out[0, 33, 39, 2]), 4.0, rtol=1e-4)
    assert float(out[0, 28, 39, 3]) < 0.5       # above the base edge: empty
    # far corner is background
    np.testing.assert_allclose(float(out[0, 2, 2, 2]), 1.0, atol=1e-5)
