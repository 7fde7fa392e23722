"""Shear-matmul rotation vs the gather-based reference implementation."""
import numpy as np
import jax.numpy as jnp
import cv2

from selfcorr_tpu.ops.image_ops import rotate, rotate_fast


def smooth_image(seed=0, s=64):
    rng = np.random.RandomState(seed)
    base = rng.rand(8, 8, 3).astype(np.float32)
    return jnp.asarray(cv2.resize(base, (s, s),
                                  interpolation=cv2.INTER_CUBIC)[None])


def test_quarter_turns_exact():
    img = smooth_image()
    for ang in (0.0, 90.0, 180.0, 270.0):
        r1 = np.asarray(rotate(img, jnp.asarray(ang)))
        r2 = np.asarray(rotate_fast(img, jnp.asarray(ang)))
        np.testing.assert_allclose(r2, r1, atol=1e-4)


def test_arbitrary_angles_close():
    img = smooth_image(1)
    for ang in (17.0, 45.0, 133.0, 211.0, 322.0):
        r1 = np.asarray(rotate(img, jnp.asarray(ang)))
        r2 = np.asarray(rotate_fast(img, jnp.asarray(ang)))
        d = np.abs(r1 - r2)[0, 8:-8, 8:-8]
        assert d.mean() < 5e-3, (ang, d.mean())


def test_nearest_mask_iou():
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[0, 16:48, 20:44] = 1
    for ang in (33.0, 100.0, 275.0):
        m1 = np.asarray(rotate(jnp.asarray(mask), jnp.asarray(ang),
                               mode="nearest")) > 0.5
        m2 = np.asarray(rotate_fast(jnp.asarray(mask), jnp.asarray(ang),
                                    mode="nearest")) > 0.5
        iou = (m1 & m2).sum() / max((m1 | m2).sum(), 1)
        assert iou > 0.93, (ang, iou)
