"""kNN vs brute force; pyramid contract tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.ops.knn import knn, knn_with_distances
from cofii2p_tpu.ops.pyramid import build_pyramid
from cofii2p_tpu.ops.subsample import grid_subsample, radius_search


def brute_knn(q, d, k):
    sq = ((q[:, None] - d[None]) ** 2).sum(-1)
    return np.argsort(sq, axis=-1, kind="stable")[:, :k]


def test_knn_matches_bruteforce_small():
    rng = np.random.RandomState(1)
    q = rng.randn(37, 3).astype(np.float32)
    d = rng.randn(101, 3).astype(np.float32)
    got = np.asarray(knn(jnp.asarray(q), jnp.asarray(d), k=5))
    sq_got = ((q[:, None] - d[None]) ** 2).sum(-1)[
        np.arange(37)[:, None], got
    ]
    want = brute_knn(q, d, 5)
    sq_want = ((q[:, None] - d[None]) ** 2).sum(-1)[np.arange(37)[:, None], want]
    # compare by distance (ties may reorder indices)
    np.testing.assert_allclose(np.sort(sq_got, -1), np.sort(sq_want, -1), rtol=1e-4, atol=1e-5)


def test_knn_self_query_returns_self_first():
    rng = np.random.RandomState(2)
    pts = rng.randn(64, 3).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(pts), jnp.asarray(pts), k=3))
    np.testing.assert_array_equal(idx[:, 0], np.arange(64))


def test_knn_chunking_consistent():
    rng = np.random.RandomState(3)
    q = rng.randn(100, 3).astype(np.float32)
    d = rng.randn(200, 3).astype(np.float32)
    a = np.asarray(knn(jnp.asarray(q), jnp.asarray(d), k=4, query_chunk=16))
    b = np.asarray(knn(jnp.asarray(q), jnp.asarray(d), k=4, query_chunk=128))
    np.testing.assert_array_equal(a, b)


def test_knn_with_distances():
    rng = np.random.RandomState(4)
    q = rng.randn(10, 3).astype(np.float32)
    d = rng.randn(30, 3).astype(np.float32)
    idx, sq = knn_with_distances(jnp.asarray(q), jnp.asarray(d), k=3)
    idx, sq = np.asarray(idx), np.asarray(sq)
    want = ((q[:, None] - d[None]) ** 2).sum(-1)[np.arange(10)[:, None], idx]
    np.testing.assert_allclose(sq, want, rtol=1e-4, atol=1e-5)
    assert (np.diff(sq, axis=-1) >= -1e-5).all()  # ascending


def test_build_pyramid_contract():
    rng = np.random.RandomState(5)
    pts = rng.randn(256, 3).astype(np.float32)
    sizes = (256, 128, 64, 32, 16)
    out = build_pyramid(jnp.asarray(pts), jax.random.PRNGKey(0), sizes, neighbor_num=8)
    assert [p.shape for p in out["points"]] == [(n, 3) for n in sizes]
    assert [n.shape for n in out["neighbors"]] == [(n, 8) for n in sizes]
    assert [s.shape for s in out["subsampling"]] == [(n, 8) for n in sizes[1:]]
    assert [u.shape for u in out["upsampling"]] == [(n, 8) for n in sizes[:-1]]
    # each level's points are a subset of the previous level
    prev = {tuple(np.round(r, 5)) for r in np.asarray(out["points"][0])}
    for lvl in range(1, 5):
        cur = {tuple(np.round(r, 5)) for r in np.asarray(out["points"][lvl])}
        assert cur <= prev
        prev = cur
    # neighbors indices are valid
    for lvl, n in enumerate(sizes):
        assert np.asarray(out["neighbors"][lvl]).max() < n


def test_grid_subsample_averages_per_voxel():
    pts = np.array(
        [[0.01, 0.01, 0.0], [0.04, 0.02, 0.0], [1.5, 0.0, 0.0]], np.float32
    )
    attrs = np.array([[1.0], [3.0], [10.0]], np.float32)
    out_pts, out_attrs, valid = grid_subsample(
        jnp.asarray(pts), 0.1, max_points=4, attributes=jnp.asarray(attrs)
    )
    out_pts, out_attrs, valid = map(np.asarray, (out_pts, out_attrs, valid))
    assert valid.sum() == 2
    vp = out_pts[valid]
    va = out_attrs[valid]
    # one voxel holds the first two points averaged
    i = np.argmin(vp[:, 0])
    np.testing.assert_allclose(vp[i], [0.025, 0.015, 0.0], atol=1e-6)
    np.testing.assert_allclose(va[i], [2.0], atol=1e-6)


def test_radius_search_masks_far_points():
    q = np.zeros((1, 3), np.float32)
    d = np.array([[0.1, 0, 0], [5.0, 0, 0], [0.2, 0, 0]], np.float32)
    idx = np.asarray(radius_search(jnp.asarray(q), jnp.asarray(d), 1.0, 3))
    assert set(idx[0, :2].tolist()) == {0, 2}
    assert idx[0, 2] == 3  # shadow index == len(database)


def test_morton_order_xz_is_permutation_and_column_contiguous():
    from cofii2p_tpu.ops.pyramid import morton_order

    rng = np.random.RandomState(11)
    # ground-plane cloud with a tall vertical column at a fixed (x, z) cell
    ground = np.stack(
        [rng.uniform(0, 40, 200), rng.uniform(-1, 1, 200), rng.uniform(0, 40, 200)],
        -1,
    )
    col = np.stack(
        [np.full(16, 20.05), np.linspace(-5, 15, 16), np.full(16, 20.05)], -1
    )
    pts = np.concatenate([ground, col]).astype(np.float32)
    perm = np.asarray(morton_order(jnp.asarray(pts), ordering="xz"))
    assert sorted(perm.tolist()) == list(range(len(pts)))
    # all 16 column points share one (x, z) voxel -> contiguous in the order
    pos = np.sort(np.nonzero(perm >= 200)[0])
    assert pos[-1] - pos[0] == 15


def test_build_pyramid_ordering_xz():
    rng = np.random.RandomState(6)
    pts = rng.randn(256, 3).astype(np.float32)
    sizes = (256, 128, 64, 32, 16)
    out = build_pyramid(
        jnp.asarray(pts), jax.random.PRNGKey(0), sizes, need_maps=False,
        ordering="xz",
    )
    # level 0 is a permutation of the input, realignable via perm0
    np.testing.assert_allclose(
        np.asarray(out["points"][0]), pts[np.asarray(out["perm0"])]
    )


def test_apply_overrides_tuple_field():
    from cofii2p_tpu.config import KITTIConfig, apply_overrides

    cfg = apply_overrides(KITTIConfig(), ["kpconv_band_plan=64,128,256,512,512"])
    assert cfg.kpconv_band_plan == (64, 128, 256, 512, 512)
    cfg = apply_overrides(KITTIConfig(), ["kpconv_band_plan=none"])
    assert cfg.kpconv_band_plan is None
    # 'tuple | None'-annotated fields must coerce too (regression: the raw
    # string used to be stored, crashing the FPN's per-level plan lookup)
    cfg = apply_overrides(
        KITTIConfig(),
        ["maxpool_compact_plan=0,0,128,128", "aggregate_compact_plan=none"],
    )
    assert cfg.maxpool_compact_plan == (0, 0, 128, 128)
    assert cfg.aggregate_compact_plan is None
