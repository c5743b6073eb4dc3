"""Native host-op tests: build the C++ library and verify against NumPy."""

import numpy as np
import pytest

from cofii2p_tpu import native
from cofii2p_tpu.data.voxel import voxel_downsample as np_voxel


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_native_voxel_matches_numpy():
    rng = np.random.RandomState(0)
    pts = (rng.randn(5000, 3) * 10).astype(np.float32)
    attrs = rng.rand(5000, 2).astype(np.float32)
    p1, a1 = native.voxel_downsample(pts, attrs, 0.5)
    p2, a2 = np_voxel(pts, attrs, 0.5)
    assert p1.shape == p2.shape
    # same voxel set (order differs): compare sorted rows
    o1 = np.lexsort(p1.T)
    o2 = np.lexsort(p2.T)
    np.testing.assert_allclose(p1[o1], p2[o2], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a1[o1], a2[o2], rtol=1e-4, atol=1e-4)


def test_native_knn_exact():
    rng = np.random.RandomState(1)
    q = (rng.randn(200, 3) * 5).astype(np.float32)
    d = (rng.randn(1000, 3) * 5).astype(np.float32)
    got = native.knn(q, d, 8)
    sq = ((q[:, None] - d[None]) ** 2).sum(-1)
    want = np.argsort(sq, axis=-1)[:, :8]
    got_d = np.take_along_axis(sq, got.astype(np.int64), axis=1)
    want_d = np.take_along_axis(sq, want, axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)


def test_native_knn_pads_small_db():
    q = np.zeros((2, 3), np.float32)
    d = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
    out = native.knn(q, d, 4)
    assert (out[:, 2:] == 2).all()  # padded with len(db)


def test_native_fps_matches_numpy():
    rng = np.random.RandomState(2)
    pts = rng.randn(300, 3).astype(np.float32)
    got = native.farthest_point_sampling(pts, 10, start=5)
    # numpy oracle
    out = [5]
    best = ((pts - pts[5]) ** 2).sum(-1)
    for _ in range(9):
        nxt = int(np.argmax(best))
        out.append(nxt)
        best = np.minimum(best, ((pts - pts[nxt]) ** 2).sum(-1))
    np.testing.assert_array_equal(got, out)


def test_native_knn_speed_at_kitti_scale():
    rng = np.random.RandomState(3)
    d = (rng.rand(20480, 3) * np.array([80, 10, 80])).astype(np.float32)
    import time

    t0 = time.perf_counter()
    out = native.knn(d, d, 128)
    dt = time.perf_counter() - t0
    assert out.shape == (20480, 128)
    np.testing.assert_array_equal(out[:, 0], np.arange(20480))  # self first
    # sanity perf bound: well under a second for the full self-kNN
    assert dt < 2.0, f"native knn too slow: {dt:.2f}s"
