import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfcorr_tpu.ops import geometry as G


def random_rotation(seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    return np.asarray(G.quat_to_matrix(jnp.asarray(q)))


def test_rot6d_orthonormal():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 6))
    R = G.rot6d_to_matrix(x)
    eye = jnp.eye(3)[None].repeat(16, 0)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)),
                               np.asarray(eye), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_rot6d_identity():
    # first 3 = x-axis, last 3 = y-axis -> identity
    x = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    np.testing.assert_allclose(np.asarray(G.rot6d_to_matrix(x))[0], np.eye(3), atol=1e-6)


def test_quat_matrix_roundtrip():
    for seed in range(5):
        R = random_rotation(seed)
        q = G.matrix_to_quat(jnp.asarray(R))
        R2 = G.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_axisangle_quat():
    q = G.axisangle_to_quat(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 2))
    R = np.asarray(G.quat_to_matrix(q))
    expected = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float64)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_product_matches_matrix_product():
    q1 = G.axisangle_to_quat(jnp.asarray([1.0, 0, 0]), jnp.asarray(0.7))
    q2 = G.axisangle_to_quat(jnp.asarray([0.0, 1.0, 0]), jnp.asarray(-0.3))
    R12 = G.quat_to_matrix(G.quat_product(q1, q2))
    R_ref = G.quat_to_matrix(q1) @ G.quat_to_matrix(q2)
    np.testing.assert_allclose(np.asarray(R12), np.asarray(R_ref), atol=1e-6)


def test_project_ndc():
    verts = jnp.asarray([[[0.5, -0.25, 2.0]]])  # (1,1,3)
    pp = jnp.asarray([[0.1, -0.2]])
    foc = jnp.asarray([[2.0, 2.0]])
    out = np.asarray(G.project_ndc(verts, pp, foc))
    assert out[0, 0, 0] == pytest.approx(0.1 + 0.5 * 2.0 / 2.0)
    assert out[0, 0, 1] == pytest.approx(-(-0.2 + -0.25 * 2.0 / 2.0))
    assert out[0, 0, 2] == pytest.approx(2.0)


def test_camera_geodesic():
    R1 = jnp.eye(3)[None]
    R2 = jnp.asarray(G.quat_to_matrix(
        G.axisangle_to_quat(jnp.asarray([0.0, 0, 1.0]), jnp.asarray(0.4))))[None]
    ang = np.asarray(G.camera_geodesic(R1, R2))
    np.testing.assert_allclose(ang, 0.4, atol=1e-5)


def test_symmetry_rotations():
    rots = G.symmetry_rotations(0, division=4)
    assert rots.shape == (4, 3, 3)
    # each must map y axis to itself
    y = np.array([0, 1.0, 0])
    for R in rots:
        np.testing.assert_allclose(R @ y, y, atol=1e-6)
    rots = G.symmetry_rotations(1)
    assert rots.shape == (2, 3, 3)
    np.testing.assert_allclose(rots[1], np.diag([-1.0, 1, 1]))
    assert G.symmetry_rotations(-1).shape == (1, 3, 3)


def test_depth_backproject_roundtrip():
    # project a known point then backproject its depth pixel
    b, h, w = 1, 8, 8
    pp = jnp.zeros((b, 2))
    foc = jnp.ones((b, 2)) * 2.0
    depth = jnp.full((b, h, w), 3.0)
    pc = np.asarray(G.depth_to_point_cloud(depth, pp, foc))
    assert pc.shape == (1, 64, 3)
    # center-ish pixel u=v=+1/8 NDC
    i = 4 * 8 + 4
    u = (4 + 0.5) * 2 / 8 - 1
    np.testing.assert_allclose(pc[0, i], [u * 3.0 / 2.0, u * 3.0 / 2.0, 3.0], atol=1e-6)
