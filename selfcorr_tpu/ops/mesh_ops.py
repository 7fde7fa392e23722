"""Mesh construction and mesh-derived constants.

Host-side (numpy) builders run once at model setup and produce static device
constants — the Laplacian, flatten-loss quadruples, symmetry sets, icosphere —
so the jitted step sees only fixed-shape arrays. Device-side functions
(surface sampling, areas) are pure jnp.

Replaces the reference's trimesh / pytorch3d usage:
  icosphere          <- trimesh.creation.icosphere   (reference mesh.py:94)
  load_obj/save_obj  <- trimesh load/export          (reference mesh.py:67)
  laplacian_matrix   <- loss_utils.LaplacianLoss buffer (loss_utils.py:63-84)
  flatten_quads      <- loss_utils.FlattenLoss buffers  (loss_utils.py:98-143)
  sample_surface     <- pytorch3d.ops.sample_points_from_meshes (mesh.py:58)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Icosphere (host-side)
# ---------------------------------------------------------------------------

def icosphere(subdivisions: int = 3, radius: float = 1.0):
    """Subdivided icosahedron; subdivisions=3 -> 642 verts / 1280 faces.

    Returns (verts float64 (V,3), faces int64 (F,3)) with outward-facing CCW
    winding, all vertices on the sphere of `radius`.
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)

    for _ in range(subdivisions):
        edge_mid: dict = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            if key in edge_mid:
                return edge_mid[key]
            m = verts_list[a] + verts_list[b]
            m /= np.linalg.norm(m)
            verts_list.append(m)
            idx = len(verts_list) - 1
            edge_mid[key] = idx
            return idx

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)

    return verts * radius, faces


# ---------------------------------------------------------------------------
# OBJ I/O (host-side; replaces trimesh for shape priors)
# ---------------------------------------------------------------------------

def load_obj(path: str):
    """Minimal OBJ parser: vertices + triangular faces (fan-triangulated)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for face in np.asarray(faces):
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def normalize_prior(verts: np.ndarray, init_scale=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Center at the mean, scale max |coord| to 1, then per-axis init_scale
    (reference mesh.py:68-74)."""
    v = verts - verts.mean(0)
    v = v / np.abs(v).max()
    return v * np.asarray(init_scale, v.dtype)


# ---------------------------------------------------------------------------
# Graph constants (host-side)
# ---------------------------------------------------------------------------

def laplacian_matrix(num_verts: int, faces: np.ndarray) -> np.ndarray:
    """Row-normalized graph Laplacian, dense (V, V) float32.

    L[i,i] = 1, L[i,j] = -1/deg(i) for mesh edges (i,j); rows with degree 0
    stay zero. Matches the reference buffer exactly (loss_utils.py:68-84).
    """
    L = np.zeros((num_verts, num_verts), np.float32)
    f = np.asarray(faces)
    for a, b in [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)]:
        L[f[:, a], f[:, b]] = -1.0
    deg = -L.sum(1)
    np.fill_diagonal(L, deg)
    nz = deg != 0
    L[nz] /= deg[nz, None]
    return L


def flatten_quads(faces: np.ndarray):
    """Edge -> opposite-vertex quadruples (v0, v1, v2, v3) for the dihedral
    flatten loss (reference loss_utils.py:104-143). Only edges shared by
    exactly two faces are returned.
    """
    f = np.asarray(faces)
    edge_faces: dict = {}
    for fi, (a, b, c) in enumerate(f):
        for (u, v) in [(a, b), (b, c), (a, c)]:
            key = (min(u, v), max(u, v))
            edge_faces.setdefault(key, []).append(fi)
    v0s, v1s, v2s, v3s = [], [], [], []
    for (u, v), flist in sorted(edge_faces.items()):
        if len(flist) != 2:
            continue
        opp = []
        for fi in flist:
            tri = set(int(x) for x in f[fi])
            opp.append((tri - {u, v}).pop())
        v0s.append(u)
        v1s.append(v)
        v2s.append(opp[0])
        v3s.append(opp[1])
    return (np.asarray(v0s, np.int32), np.asarray(v1s, np.int32),
            np.asarray(v2s, np.int32), np.asarray(v3s, np.int32))


# ---------------------------------------------------------------------------
# Device-side mesh math
# ---------------------------------------------------------------------------

def face_vertices(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex coords: (B,V,3),(F,3) -> (B,F,3,3)."""
    return verts[:, faces]  # fancy-gather over vertex axis


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B,V,3),(F,3) -> (B,F) triangle areas."""
    fv = face_vertices(verts, faces)
    e1 = fv[..., 1, :] - fv[..., 0, :]
    e2 = fv[..., 2, :] - fv[..., 0, :]
    return 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def farthest_point_sampling(points: jnp.ndarray, num_samples: int,
                            first: int = 0) -> jnp.ndarray:
    """Iterative FPS over (B, N, 3) -> (B, num_samples) int32 indices
    (reference model/util/mesh_utils.py ships the same utility alongside
    area-weighted sampling). O(num_samples * N), jittable."""
    b, n, _ = points.shape

    def body(i, state):
        idx, dmin = state
        last = idx[:, i - 1]  # (B,)
        lastp = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d = jnp.sum((points - lastp) ** 2, axis=-1)  # (B, N)
        dmin = jnp.minimum(dmin, d)
        nxt = jnp.argmax(dmin, axis=-1).astype(jnp.int32)
        return idx.at[:, i].set(nxt), dmin

    idx0 = jnp.zeros((b, num_samples), jnp.int32).at[:, 0].set(first)
    dmin0 = jnp.full((b, n), jnp.inf)
    idx, _ = jax.lax.fori_loop(1, num_samples, body, (idx0, dmin0))
    return idx


def sample_surface(key: jax.Array, verts: jnp.ndarray, faces: jnp.ndarray,
                   num_samples: int) -> jnp.ndarray:
    """Area-weighted uniform surface sampling, fixed sample count.

    TPU-native replacement for pytorch3d.ops.sample_points_from_meshes:
    categorical face pick by area + uniform barycentric warp, fully batched,
    static shapes. Returns (B, num_samples, 3).
    """
    b = verts.shape[0]
    areas = face_areas(verts, faces)  # (B, F)
    kf, kb = jax.random.split(key)
    # Inverse-CDF face selection as a ONE-HOT INTERVAL MASK consumed by an
    # MXU matmul — no gather/scatter anywhere:
    #   onehot[s, f] = [cum_{f-1} <= u_s < cum_f]   (exactly one per sample;
    #   zero-area faces get an empty interval and are never picked, unlike
    #   the round-1 gumbel-argmax whose log-clamp could select them)
    #   tri = onehot @ face_corner_matrix            (B,S,F)@(B,F,9)
    # The round-1 categorical generated AND materialized (B, S, F) gumbel
    # noise then row-gathered winners (26.5 ms at flagship symmetry shapes:
    # TPU gathers — and their scatter-add transpose in reverse-mode — are
    # lane-serial); the one-hot is a cheap fusion and both the forward
    # einsum and its transpose run on the MXU (~4x faster end to end).
    cum = jnp.cumsum(jax.lax.stop_gradient(areas), axis=-1)    # (B, F)
    u = (jax.random.uniform(kf, (b, num_samples, 1)) * cum[:, -1:, None])
    cum_prev = jnp.pad(cum[:, :-1], ((0, 0), (1, 0)))
    onehot = ((u >= cum_prev[:, None, :]) & (u < cum[:, None, :]))
    ub = jax.random.uniform(kb, (b, num_samples, 2))
    # uniform barycentric: fold the unit square onto the triangle
    su = jnp.sqrt(ub[..., 0])
    w0 = 1.0 - su
    w1 = su * (1.0 - ub[..., 1])
    w2 = su * ub[..., 1]
    fv9 = face_vertices(verts, faces).reshape(b, -1, 9)  # (B,F,9)
    tri9 = jnp.einsum("bsf,bfk->bsk", onehot.astype(jnp.float32), fv9,
                      preferred_element_type=jnp.float32)
    tri = tri9.reshape(b, num_samples, 3, 3)
    return (w0[..., None] * tri[:, :, 0] + w1[..., None] * tri[:, :, 1]
            + w2[..., None] * tri[:, :, 2])
