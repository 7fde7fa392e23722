import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.ops import image_ops as I

torch = pytest.importorskip("torch")
import torch.nn.functional as F


def rand_img(b=2, h=16, w=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, h, w, c).astype(np.float32)


def to_torch(x_nhwc):
    return torch.tensor(x_nhwc).permute(0, 3, 1, 2)


def from_torch(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


def test_resize_nearest_matches_torch():
    x = rand_img()
    ours = np.asarray(I.resize_nearest(jnp.asarray(x), (4, 4)))
    ref = from_torch(F.interpolate(to_torch(x), (4, 4), mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resize_bilinear_matches_torch():
    x = rand_img(h=8, w=8)
    ours = np.asarray(I.resize_bilinear(jnp.asarray(x), (16, 16)))
    ref = from_torch(F.interpolate(to_torch(x), (16, 16), mode="bilinear",
                                   align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_downsample_area_matches_torch():
    x = rand_img(h=16, w=16)
    ours = np.asarray(I.downsample_area(jnp.asarray(x), 4))
    ref = from_torch(F.interpolate(to_torch(x), scale_factor=0.25, mode="area",
                                   recompute_scale_factor=False))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_upsample_repeat_matches_torch_area():
    x = rand_img(h=4, w=4)
    ours = np.asarray(I.upsample_repeat(jnp.asarray(x), 4))
    ref = from_torch(F.interpolate(to_torch(x), (16, 16), mode="area"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_matches_torch():
    x = rand_img(h=12, w=10)
    rng = np.random.RandomState(1)
    coords = (rng.rand(2, 33, 2) * 2.4 - 1.2).astype(np.float32)  # incl. oob
    ours = np.asarray(I.grid_sample(jnp.asarray(x), jnp.asarray(coords)))
    ref = F.grid_sample(to_torch(x), torch.tensor(coords)[:, None],
                        align_corners=False, padding_mode="zeros")
    ref = ref[:, :, 0].permute(0, 2, 1).numpy()  # b,c,1,n -> b,n,c
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_map_shape():
    x = rand_img(h=8, w=8)
    grid = np.zeros((2, 5, 6, 2), np.float32)
    out = I.grid_sample_map(jnp.asarray(x), jnp.asarray(grid))
    assert out.shape == (2, 5, 6, 3)


def test_rotate_90deg():
    # a distinctive corner patch; rotate CCW by 90 and compare to np.rot90
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 1, 2, 0] = 1.0
    ours = np.asarray(I.rotate(jnp.asarray(x), jnp.asarray(90.0)))
    expect = np.rot90(x[0, :, :, 0], k=1)  # CCW
    ij_ours = np.unravel_index(np.argmax(ours[0, :, :, 0]), (8, 8))
    ij_ref = np.unravel_index(np.argmax(expect), (8, 8))
    assert ij_ours == ij_ref
    np.testing.assert_allclose(ours[0, :, :, 0].sum(), 1.0, atol=1e-4)


def test_rotate_matches_torchvision_if_available():
    try:
        import torchvision.transforms.functional as TF
        from torchvision.transforms import InterpolationMode
    except Exception:
        pytest.skip("torchvision unavailable")
    x = rand_img(h=16, w=16)
    ours = np.asarray(I.rotate(jnp.asarray(x), jnp.asarray(33.0)))
    ref = from_torch(TF.rotate(to_torch(x), 33.0,
                               interpolation=InterpolationMode.BILINEAR))
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_color_jitter_ranges():
    x = jnp.asarray(rand_img())
    out = I.color_jitter(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # zero-strength jitter is identity
    out0 = I.color_jitter(jax.random.PRNGKey(0), x, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-5)
