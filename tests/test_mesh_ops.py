import numpy as np
import jax
import jax.numpy as jnp

from selfcorr_tpu.ops import mesh_ops as M


def test_icosphere_counts():
    v, f = M.icosphere(subdivisions=3)
    assert v.shape == (642, 3)
    assert f.shape == (1280, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)


def test_icosphere_euler_and_watertight():
    for sub in (0, 1, 2):
        v, f = M.icosphere(sub)
        V, F = len(v), len(f)
        edges = set()
        for a, b, c in f:
            for u, w in [(a, b), (b, c), (c, a)]:
                edges.add((min(u, w), max(u, w)))
        E = len(edges)
        assert V - E + F == 2  # Euler characteristic of sphere


def test_obj_roundtrip(tmp_path):
    v, f = M.icosphere(1)
    p = str(tmp_path / "m.obj")
    M.save_obj(p, v, f)
    v2, f2 = M.load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-7)
    np.testing.assert_array_equal(f2, f)


def test_normalize_prior():
    rng = np.random.RandomState(0)
    v = rng.randn(50, 3) * 4 + 2
    out = M.normalize_prior(v, (1.0, 2.0, 0.5))
    centered = out / np.array([1.0, 2.0, 0.5])
    np.testing.assert_allclose(centered.mean(0), 0, atol=1e-12)
    assert np.abs(centered).max() == 1.0 or np.isclose(np.abs(centered).max(), 1.0)


def test_laplacian_matches_reference_formula():
    # tetrahedron
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    L = M.laplacian_matrix(4, faces)
    # every vertex has degree 3 -> diag 1, offdiag -1/3
    np.testing.assert_allclose(np.diag(L), 1.0)
    off = L - np.diag(np.diag(L))
    np.testing.assert_allclose(off[off != 0], -1.0 / 3.0)
    # applying to a constant field gives zero
    np.testing.assert_allclose(L @ np.ones((4, 3)), 0, atol=1e-7)


def test_flatten_quads_tetra():
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    v0, v1, v2, v3 = M.flatten_quads(faces)
    assert len(v0) == 6  # tetra has 6 edges, each shared by 2 faces
    for a, b, c, d in zip(v0, v1, v2, v3):
        assert len({a, b, c, d}) == 4


def test_face_areas_unit_triangle():
    verts = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]]])
    faces = jnp.asarray([[0, 1, 2]])
    a = np.asarray(M.face_areas(verts, faces))
    np.testing.assert_allclose(a, [[0.5]], atol=1e-7)


def test_sample_surface_on_sphere():
    v, f = M.icosphere(2)
    verts = jnp.asarray(v, jnp.float32)[None]
    faces = jnp.asarray(f)
    pts = M.sample_surface(jax.random.PRNGKey(0), verts, faces, 2000)
    assert pts.shape == (1, 2000, 3)
    r = np.linalg.norm(np.asarray(pts[0]), axis=1)
    # points lie on the polyhedral surface: radii slightly below 1
    assert r.min() > 0.9 and r.max() <= 1.0 + 1e-5
    # roughly uniform: mean position near origin
    np.testing.assert_allclose(np.asarray(pts[0]).mean(0), 0, atol=0.08)


def test_farthest_point_sampling():
    # a cube's corners: FPS from corner 0 must pick the opposite corner next
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float32)
    idx = np.asarray(M.farthest_point_sampling(jnp.asarray(pts)[None], 4))
    assert idx.shape == (1, 4)
    assert idx[0, 0] == 0
    assert idx[0, 1] == 7  # opposite corner
    assert len(set(idx[0].tolist())) == 4  # distinct picks
