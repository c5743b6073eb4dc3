"""Golden tests for the geometry op library against NumPy/SciPy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cofii2p_tpu.ops import geometry as G


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_pairwise_sq_dist_matches_numpy(rng):
    a = rng.randn(17, 3).astype(np.float32)
    b = rng.randn(23, 3).astype(np.float32)
    got = np.asarray(G.pairwise_sq_dist(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_sq_dist_clamped_nonnegative(rng):
    a = rng.randn(50, 3).astype(np.float32) * 100
    got = np.asarray(G.pairwise_sq_dist(jnp.asarray(a), jnp.asarray(a)))
    assert (got >= 0).all()


def test_point2node_matches_argmin(rng):
    nodes = rng.randn(31, 3).astype(np.float32)
    points = rng.randn(100, 3).astype(np.float32)
    got = np.asarray(G.point2node(jnp.asarray(nodes), jnp.asarray(points)))
    want = ((points[:, None] - nodes[None]) ** 2).sum(-1).argmin(-1)
    np.testing.assert_array_equal(got, want)


def test_se3_apply_and_inverse(rng):
    R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    t = rng.randn(3).astype(np.float32)
    T = np.asarray(G.se3_from_rt(jnp.asarray(R), jnp.asarray(t)))
    pts = rng.randn(20, 3).astype(np.float32)
    moved = np.asarray(G.apply_se3(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(moved, pts @ R.T + t, rtol=1e-5, atol=1e-5)

    Tinv = np.asarray(G.inverse_se3(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-5)


def test_rodrigues_roundtrip(rng):
    rvec = rng.randn(8, 3).astype(np.float32)
    R = np.asarray(G.rodrigues(jnp.asarray(rvec)))
    want = Rotation.from_rotvec(rvec).as_matrix()
    np.testing.assert_allclose(R, want, rtol=1e-4, atol=1e-4)

    back = np.asarray(G.rotation_to_rodrigues(jnp.asarray(R)))
    back_R = Rotation.from_rotvec(back).as_matrix()
    np.testing.assert_allclose(back_R, want, rtol=1e-3, atol=1e-3)


def test_rodrigues_zero_is_identity():
    R = np.asarray(G.rodrigues(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_euler_to_rotation_matches_reference_convention(rng):
    # reference builds R = Rz @ Ry @ Rx (data/kitti.py:204-215)
    angles = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
    got = np.asarray(G.euler_to_rotation(jnp.asarray(angles)))
    want = Rotation.from_euler("xyz", angles).as_matrix()  # extrinsic xyz == Rz@Ry@Rx
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_neighbors_shadow_row(rng):
    vals = rng.randn(10, 4).astype(np.float32)
    idx = np.array([[0, 9, 10], [10, 10, 1]], dtype=np.int32)  # 10 == shadow
    out = np.asarray(G.gather_neighbors(jnp.asarray(vals), jnp.asarray(idx)))
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(out[0, 0], vals[0])
    np.testing.assert_allclose(out[0, 2], 0.0)
    np.testing.assert_allclose(out[1, 0], 0.0)


def test_project_points(rng):
    K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]], np.float32)
    pts = np.array([[0.0, 0.0, 2.0], [1.0, -0.5, 4.0]], np.float32)
    got = np.asarray(G.project_points(jnp.asarray(K), jnp.asarray(pts)))
    want = (pts @ K.T)
    want = want[:, :2] / want[:, 2:]
    np.testing.assert_allclose(got, want, rtol=1e-5)
