"""banded_knn path: reference kNN semantics on the banded machinery.

The load-bearing property: with bands that cover the whole support level,
`impl='banded_knn'` must equal `impl='gather'` (the oracle-tested
reference-parity path) *exactly* — same neighborhoods ({j : d2 <= tau} ==
the k nearest), same counts (within-tau == active-row count == k), same
per-layer kernel_points.  That makes the fast path's only approximation the
band itself, which band_coverage / PERF.md quantify separately.

Reference semantics matched: kNN neighbor maps
/root/reference/model/kpconv/preprocess_data.py:74-99, aggregation + count
model/kpconv/kpconv.py:92-116, kNN maxpool functional.py:53-66.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofii2p_tpu.config import get_config
from cofii2p_tpu.models.kpconv import KPConv, KPConvFPN, ResidualBlock
from cofii2p_tpu.ops.banded import banded_knn_tau, banded_maxpool
from cofii2p_tpu.ops.pyramid import build_pyramid

FULL_BAND = 1 << 20  # band_width larger than any level -> band == whole level


def _cloud(n, seed=0, scale=5.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_knn_tau_matches_bruteforce():
    q = jnp.asarray(_cloud(64, 1))
    s = jnp.asarray(_cloud(128, 2))
    k = 16
    tau = banded_knn_tau(q, s, k=k, tile=128, band_width=FULL_BAND)
    d2 = np.sum(
        (np.asarray(q)[:, None, :] - np.asarray(s)[None, :, :]) ** 2, -1
    )
    srt = np.sort(d2, axis=1)
    kth, nxt = srt[:, k - 1], srt[:, k]
    # tau sits mid-gap between the k-th and (k+1)-th distances (arithmetic-
    # robust membership, see banded_knn_tau) and admits exactly k points
    t = np.asarray(tau)
    assert (kth <= t).all() and (t < nxt).all()
    counts = (d2 <= t[:, None]).sum(1)
    assert (counts == k).all()


def test_knn_tau_banded_scan_matches_dense():
    # multi-tile path (m=256, tile=128) with a full-width band must agree
    # with the dense single-tile computation
    pts = jnp.asarray(_cloud(256, 3))
    t_banded = banded_knn_tau(pts, pts, k=16, tile=128, band_width=FULL_BAND)
    d2 = np.sum(
        (np.asarray(pts)[:, None, :] - np.asarray(pts)[None, :, :]) ** 2, -1
    )
    srt = np.sort(d2, axis=1)
    t = np.asarray(t_banded)
    assert (srt[:, 15] <= t).all() and (t < srt[:, 16]).all()
    assert ((d2 <= t[:, None]).sum(1) == 16).all()


def _exact_knn_sorted(q, s, k):
    d2 = np.sum((q[:, None, :] - s[None, :, :]) ** 2, -1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return jnp.asarray(np.sort(idx, axis=1).astype(np.int32))


@pytest.mark.parametrize("perturb_kp", [False, True])
def test_kpconv_banded_knn_equals_gather_full_band(perturb_kp):
    n, h, cin, cout = 256, 32, 8, 16
    pts = jnp.asarray(_cloud(n, 4))[None]
    feats = jnp.asarray(_cloud(n, 5)[:, :1].repeat(cin, 1))[None] * 0.3
    nbr = _exact_knn_sorted(np.asarray(pts[0]), np.asarray(pts[0]), h)[None]

    kw = dict(out_channels=cout, kernel_size=15, radius=0.9, sigma=0.45)
    gather = KPConv(impl="gather", **kw)
    knn = KPConv(impl="banded_knn", tile=128, band_width=FULL_BAND,
                 knn_k=h, **kw)

    params = gather.init(jax.random.PRNGKey(0), feats, pts, pts, nbr)
    if perturb_kp:
        # simulate an imported per-layer disposition: rotate the canonical
        # kernel points (norm-preserving, like the reference's random
        # per-construction rotation) — both paths must consume it
        kp = params["params"]["kernel_points"]
        th = 0.7
        rot = jnp.asarray(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            jnp.float32,
        )
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["params"]["kernel_points"] = kp @ rot.T

    out_g = gather.apply(params, feats, pts, pts, nbr)
    out_k = knn.apply(params, feats, pts, pts)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_g), rtol=2e-5, atol=2e-5
    )


def test_strided_residual_block_equivalence():
    # cross-level: queries = 128-point subset, support = 256 points; the
    # strided shortcut maxpool must take the reference kNN semantics
    # (max over the k nearest, no radius mask)
    n, m, h, cin, cout = 256, 128, 32, 16, 32
    s_pts_np = _cloud(n, 6)
    q_pts_np = s_pts_np[:m] + 0.01
    s_pts, q_pts = jnp.asarray(s_pts_np)[None], jnp.asarray(q_pts_np)[None]
    feats = jnp.asarray(_cloud(n, 7)[:, :1].repeat(cin, 1))[None] * 0.2
    nbr = _exact_knn_sorted(q_pts_np, s_pts_np, h)[None]

    kw = dict(in_channels=cin, out_channels=cout, kernel_size=15,
              radius=0.9, sigma=0.45, strided=True, group_norm=8)
    gather = ResidualBlock(impl="gather", **kw)
    knn = ResidualBlock(impl="banded_knn", tile=128, band_width=FULL_BAND,
                        knn_k=h, **kw)
    params = gather.init(jax.random.PRNGKey(1), feats, q_pts, s_pts, nbr)
    out_g = gather.apply(params, feats, q_pts, s_pts, nbr)
    out_k = knn.apply(params, feats, q_pts, s_pts)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_g), rtol=2e-5, atol=2e-5
    )


def test_banded_maxpool_tau_no_radius_mask():
    # a far-away query still pools over its k nearest (reference kNN maxpool
    # has no radius cutoff) — the radius path would return zeros
    s = jnp.asarray(_cloud(128, 8))
    q = s[:1] + 100.0
    f = jnp.asarray(_cloud(128, 9)[:, :1].repeat(4, 1))
    tau = banded_knn_tau(q, s, k=8, tile=128, band_width=FULL_BAND)
    out_tau = banded_maxpool(f, q, s, 0.5, tile=128, band_width=FULL_BAND,
                             tau=tau)
    out_rad = banded_maxpool(f, q, s, 0.5, tile=128, band_width=FULL_BAND)
    d2 = np.sum((np.asarray(q)[:, None] - np.asarray(s)[None]) ** 2, -1)[0]
    knn8 = np.argsort(d2)[:8]
    np.testing.assert_allclose(
        np.asarray(out_tau)[0], np.asarray(f)[knn8].max(0), rtol=1e-6
    )
    assert (np.asarray(out_rad) == 0.0).all()


@pytest.fixture(scope="module")
def fpn_setup():
    cfg = get_config("tiny")
    sizes = cfg.pyramid_sizes  # (512, 256, 128, 64, 32)
    h = cfg.neighbor_num  # 16
    pts = jnp.asarray(_cloud(sizes[0], 10))[None]
    pyr = jax.jit(
        jax.vmap(
            functools.partial(
                build_pyramid, sizes=sizes, neighbor_num=h, approx=False,
                ordering=cfg.pyramid_ordering,
            )
        )
    )(pts, jax.random.split(jax.random.PRNGKey(2), 1))
    feats = jnp.asarray(_cloud(sizes[0], 11)[:, :1].repeat(4, 1))[None] * 0.3
    feats = jnp.take_along_axis(feats, pyr["perm0"][..., None], axis=1)
    return cfg, pyr, feats, h


@pytest.mark.slow
def test_fpn_banded_knn_equals_gather(fpn_setup):
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
    )
    gather = KPConvFPN(impl="gather", **kw)
    knn = KPConvFPN(impl="banded_knn", tile=128, band_width=FULL_BAND,
                    knn_k=h, **kw)
    params = gather.init(
        jax.random.PRNGKey(3), feats, pyr["points"], pyr["neighbors"],
        pyr["subsampling"], pyr["upsampling"],
    )
    outs_g = gather.apply(
        params, feats, pyr["points"], pyr["neighbors"], pyr["subsampling"],
        pyr["upsampling"],
    )
    outs_k = knn.apply(params, feats, pyr["points"])
    assert len(outs_g) == len(outs_k) == 4
    for og, ok in zip(outs_g, outs_k):
        np.testing.assert_allclose(
            np.asarray(ok), np.asarray(og), rtol=2e-4, atol=2e-4
        )


def test_fpn_maxpool_compact_plan_wiring(fpn_setup):
    # the compacted-maxpool plan must reach the strided shortcuts: with
    # k >= band the compacted form equals the select form exactly, so the
    # whole FPN output must be identical
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
        impl="banded", tile=128, band_width=FULL_BAND,
    )
    base = KPConvFPN(**kw)
    compact = KPConvFPN(maxpool_compact_plan=(1 << 20,) * 5, **kw)
    params = base.init(jax.random.PRNGKey(5), feats, pyr["points"])
    outs_b = base.apply(params, feats, pyr["points"])
    outs_c = compact.apply(params, feats, pyr["points"])
    for ob, oc in zip(outs_b, outs_c):
        np.testing.assert_allclose(
            np.asarray(oc), np.asarray(ob), rtol=1e-6, atol=1e-6
        )


@pytest.mark.slow
def test_fpn_maxpool_compact_gradient(fpn_setup):
    # training must differentiate through the compacted shortcut (top_k
    # indices are non-diff; the cotangent routes through gather+max)
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
        impl="banded", tile=128, band_width=FULL_BAND,
        maxpool_compact_plan=(1 << 20,) * 5,
    )
    fpn = KPConvFPN(**kw)
    params = fpn.init(jax.random.PRNGKey(6), feats, pyr["points"])

    def loss(p):
        outs = fpn.apply(p, feats, pyr["points"])
        return sum(jnp.sum(o**2) for o in outs)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_fpn_aggregate_compact_plan_wiring(fpn_setup):
    # the compacted-aggregation plan must reach every KPConv: with k >= band
    # the compacted form sums the same member set as the full-band path (in
    # nearest-first order), so the FPN output agrees to fp32 roundoff
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
        impl="banded", tile=128, band_width=FULL_BAND,
    )
    base = KPConvFPN(**kw)
    compact = KPConvFPN(aggregate_compact_plan=(1 << 20,) * 5, **kw)
    params = base.init(jax.random.PRNGKey(7), feats, pyr["points"])
    outs_b = base.apply(params, feats, pyr["points"])
    outs_c = compact.apply(params, feats, pyr["points"])
    for ob, oc in zip(outs_b, outs_c):
        np.testing.assert_allclose(
            np.asarray(oc), np.asarray(ob), rtol=2e-4, atol=2e-4
        )


def test_fpn_aggregate_compact_knn_equals_tau(fpn_setup):
    # banded_knn + compacted aggregation (k = knn_k) selects the identical
    # member set as the tau path — reference kNN semantics preserved
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
        impl="banded_knn", tile=128, band_width=FULL_BAND, knn_k=h,
    )
    tau_path = KPConvFPN(**kw)
    compact = KPConvFPN(aggregate_compact_plan=(1,) * 5, **kw)
    params = tau_path.init(jax.random.PRNGKey(8), feats, pyr["points"])
    outs_t = tau_path.apply(params, feats, pyr["points"])
    outs_c = compact.apply(params, feats, pyr["points"])
    for ot, oc in zip(outs_t, outs_c):
        np.testing.assert_allclose(
            np.asarray(oc), np.asarray(ot), rtol=2e-4, atol=2e-4
        )


def test_fpn_aggregate_compact_gradient(fpn_setup):
    # training must differentiate through the compacted aggregation (top_k
    # indices are non-diff; cotangents route through the row gather)
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
        impl="banded", tile=128, band_width=FULL_BAND,
        aggregate_compact_plan=(1 << 20,) * 5,
        maxpool_compact_plan=(1 << 20,) * 5,
    )
    fpn = KPConvFPN(**kw)
    params = fpn.init(jax.random.PRNGKey(9), feats, pyr["points"])

    def loss(p):
        outs = fpn.apply(p, feats, pyr["points"])
        return sum(jnp.sum(o**2) for o in outs)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_fpn_banded_knn_practical_band_close(fpn_setup):
    # practical (non-covering) bands: outputs must stay close to the exact
    # full-band result — this bounds the band approximation at model level
    cfg, pyr, feats, h = fpn_setup
    kw = dict(
        input_dim=4, output_dim=16, init_dim=16, kernel_size=15,
        init_radius=0.9, init_sigma=0.45, group_norm=8,
    )
    full = KPConvFPN(impl="banded_knn", tile=128, band_width=FULL_BAND,
                     knn_k=h, **kw)
    narrow = KPConvFPN(impl="banded_knn", tile=128, band_width=128,
                       knn_k=h, **kw)
    params = full.init(jax.random.PRNGKey(4), feats, pyr["points"])
    outs_f = full.apply(params, feats, pyr["points"])
    outs_n = narrow.apply(params, feats, pyr["points"])
    for of, on in zip(outs_f, outs_n):
        of, on = np.asarray(of), np.asarray(on)
        denom = np.abs(of).mean() + 1e-6
        assert np.abs(of - on).mean() / denom < 0.15


# ---------------------------------------------------------------------------
# round 5: kNN window starts (ops/banded.dynamic_knn_starts) — exactness
# whenever the in-tau rows fit the window, and the Pallas/XLA windowed paths
# agreeing with each other and with the full band.
# ---------------------------------------------------------------------------


def _morton_cloud(n, seed, extent=20.0):
    from cofii2p_tpu.ops.pyramid import morton_order

    rng = np.random.RandomState(seed)
    pts = np.concatenate(
        [rng.uniform(0, extent, (n, 2)), rng.uniform(0, 2.0, (n, 1))], 1
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order]


def test_knn_window_exact_when_span_fits():
    """A window wide enough for every tile's in-tau span must reproduce the
    full-band tau aggregation/maxpool EXACTLY (the kNN windows' core
    contract — unlike radius windows, nothing is dropped)."""
    from cofii2p_tpu.ops.banded import (
        banded_kpconv_aggregate, dynamic_knn_starts,
    )

    n, c, k, tile, width = 512, 8, 8, 32, 384
    s = jnp.asarray(_morton_cloud(n, 5))
    q = s[::4]
    feats = jnp.asarray(np.random.RandomState(0).randn(n, c).astype(np.float32))
    tau = banded_knn_tau(q, s, k=k, tile=tile, band_width=FULL_BAND)

    # full-band reference
    w_ref, c_ref = banded_kpconv_aggregate(
        feats, q, s, 1.2, 0.6, 15, tile, FULL_BAND, tau=tau
    )
    mp_ref = banded_maxpool(feats, q, s, 0.0, tile, FULL_BAND, tau=tau)

    # verify the in-tau span actually fits the window for every tile (the
    # exactness precondition), then check bit-equality
    starts = dynamic_knn_starts(q, s, tau, tile=tile, width=width)
    d2 = np.sum((np.asarray(q)[:, None] - np.asarray(s)[None]) ** 2, -1)
    within = d2 <= np.asarray(tau)[:, None]
    st = np.asarray(starts)
    for t in range(len(st)):
        rows = np.nonzero(within[t * tile : (t + 1) * tile].any(0))[0]
        assert rows.min() >= st[t] and rows.max() < st[t] + width, (
            "test geometry must satisfy the exactness precondition"
        )

    w_win, c_win = banded_kpconv_aggregate(
        feats, q, s, 1.2, 0.6, 15, tile, width, tau=tau, starts=starts
    )
    mp_win = banded_maxpool(feats, q, s, 0.0, tile, width, tau=tau, starts=starts)
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_win))
    np.testing.assert_allclose(
        np.asarray(w_ref), np.asarray(w_win), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mp_ref), np.asarray(mp_win))


def test_knn_window_pallas_matches_xla():
    """The windowed tau Pallas kernels (aggregate, fused, maxpool) agree
    with the windowed XLA twins (interpret mode)."""
    from cofii2p_tpu.models.kernel_points import load_kernel_points
    from cofii2p_tpu.ops.banded import (
        banded_kpconv_aggregate, dynamic_knn_starts,
    )
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_tau_pallas,
        banded_kpconv_fused_tau_pallas,
    )
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas

    n, m, c, k, dout = 256, 128, 8, 16, 8
    radius, sigma = 1.2, 0.6
    s1 = _morton_cloud(n, 7)
    s = jnp.asarray(np.stack([s1, s1 + 0.05]))
    q = s[:, ::2]
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, n, c).astype(np.float32))
    wts = jnp.asarray((rng.randn(15, c, dout) / 10).astype(np.float32))
    kp = jnp.asarray(load_kernel_points(radius, 15, 3), jnp.float32)
    width = 96
    tau = jax.vmap(
        lambda qq, ss: banded_knn_tau(qq, ss, k=k, tile=64, band_width=FULL_BAND)
    )(q, s)
    starts = jax.vmap(
        lambda qq, ss, t: dynamic_knn_starts(qq, ss, t, tile=64, width=width)
    )(q, s, tau)

    w_x, c_x = jax.vmap(
        lambda f, qq, ss, t, st: banded_kpconv_aggregate(
            f, qq, ss, radius, sigma, 15, 64, width, tau=t, kp=kp, starts=st
        )
    )(feats, q, s, tau, starts)
    w_p, c_p = banded_kpconv_aggregate_tau_pallas(
        feats, q, s, tau, kp, radius, sigma, 15, 64, width, jnp.float32, starts
    )
    np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))
    np.testing.assert_allclose(
        np.asarray(w_x), np.asarray(w_p), rtol=2e-5, atol=2e-5
    )

    out_p, cf_p = banded_kpconv_fused_tau_pallas(
        feats, q, s, wts, tau, kp, radius, sigma, 15, 64, width, jnp.float32,
        starts,
    )
    out_x = jnp.einsum("bmkc,kcd->bmd", w_x, wts)
    np.testing.assert_array_equal(np.asarray(c_x), np.asarray(cf_p))
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )

    mp_x = jax.vmap(
        lambda f, qq, ss, t, st: banded_maxpool(
            f, qq, ss, 0.0, 64, width, tau=t, starts=st
        )
    )(feats, q, s, tau, starts)
    mp_p = banded_maxpool_tau_pallas(feats, q, s, tau, 64, width, True, starts)
    np.testing.assert_array_equal(np.asarray(mp_x), np.asarray(mp_p))


def test_knn_window_fpn_wiring():
    """KPConvFPN with knn_window_plan wide enough to be exact must equal the
    full-band banded_knn FPN (pins the plan->tau->starts->kernel plumbing,
    CPU interpret)."""
    import dataclasses

    from cofii2p_tpu.config import TinyConfig
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.device_pipeline import prepare_samples

    cfg = TinyConfig(kpconv_impl="banded_knn")
    ds = SyntheticDataset(cfg, "val", length=2)
    hb = _collate([ds[0], ds[1]])
    hb.pop("index", None)
    batch = prepare_samples(
        hb["pc"], hb["attrs"], hb["P"], hb["K"], jax.random.PRNGKey(0),
        hb["img"], cfg,
    )
    sizes = cfg.pyramid_sizes
    feats = batch["feats"]
    points = batch["points"]
    del dataclasses

    def fpn_out(knn_plan, kernel):
        fpn = KPConvFPN(
            input_dim=feats.shape[-1], output_dim=16, init_dim=8,
            kernel_size=cfg.kernel_size, init_radius=cfg.init_radius,
            init_sigma=cfg.init_sigma, group_norm=2, impl="banded_knn",
            tile=cfg.kpconv_tile, band_width=cfg.kpconv_band_width,
            band_plan=cfg.kpconv_band_plan, kernel=kernel,
            knn_k=cfg.neighbor_num, knn_window_plan=knn_plan,
        )
        params = fpn.init(jax.random.PRNGKey(0), feats, points)
        return fpn.apply(params, feats, points)

    # NOTE: a window is not comparable to the static-band result unless it
    # covers the same row set — tau is the IN-BAND k-th distance, so a
    # window seeing rows outside the band admits extra members (and a too-
    # narrow one drops some).  The plumbing contract tested here is that
    # the XLA and Pallas backends agree exactly under the SAME window plan
    # (the op-level exactness contract is pinned above).
    wide = tuple(sizes)
    out_wide = fpn_out(wide, "xla")
    out_pallas = fpn_out(wide, "pallas")
    for a, b in zip(out_wide, out_pallas):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
    # a narrow plan still runs and stays finite on both backends
    narrow = tuple(max(sz // 2, 8) for sz in sizes)
    for kern in ("xla", "pallas"):
        outs = fpn_out(narrow, kern)
        assert all(bool(np.isfinite(np.asarray(o)).all()) for o in outs)


def test_tau_pallas_bitexact():
    """The Pallas bisection tau producer (ops/tau_kernel.py) is BIT-exact
    vs banded_knn_tau's top_k — including duplicate-point ties, where the
    tie rule (nxt == kth) must reproduce the sorted (k+1)-th exactly."""
    from cofii2p_tpu.ops.tau_kernel import banded_knn_tau_pallas

    s1 = _morton_cloud(512, 21)
    s = jnp.asarray(np.stack([s1, s1 + 0.02]))
    q = s[:, ::2]
    for k in (8, 16):
        tp = banded_knn_tau_pallas(q, s, k, 64, 128)
        tx = jax.vmap(lambda qq, ss: banded_knn_tau(qq, ss, k, 64, 128))(q, s)
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tx))

    # exact duplicates (the resample_fixed padding): k-th and (k+1)-th tie
    dup = np.concatenate([s1[:384], s1[:128]])
    s2 = jnp.asarray(np.stack([dup, dup]))
    q2 = s2[:, ::2]
    tp = banded_knn_tau_pallas(q2, s2, 16, 64, 128)
    tx = jax.vmap(lambda qq, ss: banded_knn_tau(qq, ss, 16, 64, 128))(q2, s2)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(tx))
