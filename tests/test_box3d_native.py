"""Native C++ exact IoU vs the pure-python/scipy implementation."""
import numpy as np
import pytest

from selfcorr_tpu.eval import box3d_native as native
from selfcorr_tpu.eval.box3d import Box3D, box_iou
from selfcorr_tpu.ops import geometry as G
import jax.numpy as jnp


def random_box(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = np.asarray(G.quat_to_matrix(jnp.asarray(q)))
    t = rng.randn(3) * 0.5
    s = rng.uniform(0.5, 2.0, 3)
    return Box3D.from_transformation(R, t, s)


def test_native_builds():
    assert native.available(), "g++ build of libbox3d_iou.so failed"


def test_native_matches_python_random_boxes():
    rng = np.random.RandomState(0)
    diffs = []
    for _ in range(60):
        a = random_box(rng)
        b = random_box(rng)
        v_py = box_iou(a, b)
        v_cc = native.iou(a.vertices, b.vertices)
        diffs.append(abs(v_py - v_cc))
    assert max(diffs) < 2e-3, max(diffs)


def test_native_identity_and_disjoint():
    b = random_box(np.random.RandomState(1))
    assert native.iou(b.vertices, b.vertices) == pytest.approx(1.0, abs=1e-9)
    far = Box3D(b.vertices + np.array([100.0, 0, 0]))
    assert native.iou(b.vertices, far.vertices) == 0.0


def test_iou_max():
    rng = np.random.RandomState(2)
    pred = random_box(rng)
    cands = np.stack([random_box(rng).vertices for _ in range(10)]
                     + [pred.vertices])
    assert native.iou_max(pred.vertices, cands) == pytest.approx(1.0, abs=1e-9)
