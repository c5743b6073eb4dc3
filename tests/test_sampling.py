"""Tests for farthest point sampling and kNN interpolation."""

import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.ops.sampling import (
    farthest_point_sampling,
    global_avgpool,
    knn_interpolate,
)


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    # two well-separated clusters: FPS must pick from both immediately
    a = rng.randn(50, 3).astype(np.float32)
    b = rng.randn(50, 3).astype(np.float32) + 100.0
    pts = np.concatenate([a, b])
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 10, jax.random.PRNGKey(0)))
    assert len(set(idx.tolist())) == 10
    sides = (idx >= 50).astype(int)
    assert 0 < sides.sum() < 10  # both clusters represented
    assert sides[0] != sides[1]  # second pick is in the other cluster


def test_fps_matches_greedy_oracle():
    rng = np.random.RandomState(1)
    pts = rng.randn(40, 3).astype(np.float32)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 8, jax.random.PRNGKey(3)))
    # greedy oracle from the same start point
    start = idx[0]
    chosen = [start]
    d = ((pts - pts[start]) ** 2).sum(-1)
    for _ in range(7):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, ((pts - pts[nxt]) ** 2).sum(-1))
    np.testing.assert_array_equal(idx, chosen)


def test_knn_interpolate_inverse_distance():
    s_points = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    s_feats = jnp.asarray([[1.0], [3.0]])
    q = jnp.asarray([[0.25, 0.0, 0.0]])
    idx = jnp.asarray([[0, 1]])
    out = np.asarray(knn_interpolate(s_feats, q, s_points, idx, k=2))
    # weights ~ 1/d^2: d0^2=0.0625, d1^2=0.5625 -> w0=16, w1=16/9
    w0, w1 = 1 / 0.0625, 1 / 0.5625
    want = (w0 * 1.0 + w1 * 3.0) / (w0 + w1)
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-4)


def test_knn_interpolate_ignores_shadow():
    s_points = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    s_feats = jnp.asarray([[1.0], [3.0]])
    q = jnp.asarray([[0.5, 0.0, 0.0]])
    idx = jnp.asarray([[0, 2]])  # 2 == shadow
    out = np.asarray(knn_interpolate(s_feats, q, s_points, idx, k=2))
    np.testing.assert_allclose(out[0, 0], 1.0, rtol=1e-4)


def test_global_avgpool_masked():
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]])
    mask = jnp.asarray([True, True, False])
    out = np.asarray(global_avgpool(feats, mask))
    np.testing.assert_allclose(out, [2.0, 3.0])
