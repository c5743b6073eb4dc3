"""Dynamic per-tile band starts (ops.banded.dynamic_band_starts).

The static band plan sizes deep-level bands for worst-case Morton
discontinuities; the dynamic path measures each tile's actual in-reach
index span on device and centers a much narrower window on it.  These
tests pin (a) the starts themselves (exact span recovery), (b) the
windowed XLA twins against the full-band results when the window covers
the span, and (c) the Pallas forwards against the XLA twins with shared
starts — all in interpret mode on CPU.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import (
    banded_kpconv_aggregate,
    banded_maxpool,
    dynamic_band_starts,
    kernel_reach,
)
from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
from cofii2p_tpu.ops.pyramid import morton_order

RADIUS, SIGMA, KS = 0.85, 0.4, 15
R_ACTIVE = kernel_reach(RADIUS, SIGMA, KS)


def _cloud(n, rng, extent=60.0):
    pts = np.concatenate(
        [
            rng.uniform(0, extent, (n, 1)),
            rng.uniform(0, 4.0, (n, 1)),
            rng.uniform(0, 2.0, (n, 1)),
        ],
        1,
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order]


def test_starts_recover_exact_spans():
    """On a cloud sorted along x, each tile's in-reach span is a contiguous
    run; the computed window must contain every in-reach row."""
    rng = np.random.default_rng(0)
    n = 512
    pts = _cloud(n, rng)
    # sorted-x support makes spans tight and easy to verify by brute force
    order = np.argsort(pts[:, 0], kind="stable")
    pts = pts[order]
    q = jnp.asarray(pts)
    width = 256
    starts = np.asarray(
        dynamic_band_starts(
            q, q, R_ACTIVE, tile=128, width=width, center="span"
        )
    )
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    within = d2 <= R_ACTIVE**2
    for t in range(len(starts)):
        rows = within[t * 128 : (t + 1) * 128].any(0)
        (idx,) = np.nonzero(rows)
        assert idx.min() >= starts[t]
        assert idx.max() < starts[t] + width, (t, starts[t], idx.max())


@pytest.mark.parametrize("width", [256, 512])
def test_windowed_twins_match_full_band(width):
    """When the dynamic window covers each tile's span, the windowed ops
    equal the full-band (band == whole level) results exactly."""
    rng = np.random.default_rng(1)
    n, c = 512, 16
    pts = _cloud(n, rng)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    q = jnp.asarray(pts)
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    starts = dynamic_band_starts(
        q, q, R_ACTIVE, tile=128, width=width, center="span"
    )

    full_mp = banded_maxpool(feats, q, q, R_ACTIVE, 128, 1 << 20)
    dyn_mp = banded_maxpool(
        feats, q, q, R_ACTIVE, 128, width, starts=starts
    )
    np.testing.assert_array_equal(np.asarray(full_mp), np.asarray(dyn_mp))

    full_w, full_c = banded_kpconv_aggregate(
        feats, q, q, RADIUS, SIGMA, KS, 128, 1 << 20
    )
    dyn_w, dyn_c = banded_kpconv_aggregate(
        feats, q, q, RADIUS, SIGMA, KS, 128, width, starts=starts
    )
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(dyn_c))
    np.testing.assert_allclose(
        np.asarray(full_w), np.asarray(dyn_w), rtol=2e-5, atol=2e-5
    )


def test_pallas_forwards_match_xla_with_shared_starts():
    """The Pallas kernels with dynamic starts reproduce the XLA twins with
    the same starts (interpret mode; batched)."""
    rng = np.random.default_rng(2)
    n, c, b = 512, 16, 2
    width = 256
    pts = np.stack([_cloud(n, rng) for _ in range(b)])
    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    q = jnp.asarray(pts)
    f = jnp.asarray(feats)
    starts = jax.vmap(
        lambda p: dynamic_band_starts(p, p, R_ACTIVE, tile=128, width=width)
    )(q)

    mp_pl = banded_maxpool_pallas(
        f, q, q, R_ACTIVE, 128, width, True, starts
    )
    mp_x = jax.vmap(
        lambda ff, p, st: banded_maxpool(
            ff, p, p, R_ACTIVE, 128, width, starts=st
        )
    )(f, q, starts)
    np.testing.assert_array_equal(np.asarray(mp_pl), np.asarray(mp_x))

    w_pl, c_pl = banded_kpconv_aggregate_pallas(
        f, q, q, RADIUS, SIGMA, KS, 128, width, jnp.float32, starts
    )
    w_x, c_x = jax.vmap(
        lambda ff, p, st: banded_kpconv_aggregate(
            ff, p, p, RADIUS, SIGMA, KS, 128, width, starts=st
        )
    )(f, q, starts)
    np.testing.assert_array_equal(np.asarray(c_pl), np.asarray(c_x))
    np.testing.assert_allclose(
        np.asarray(w_pl), np.asarray(w_x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("tie_even", [True, False])
def test_dynamic_maxpool_backward_matches_xla(tie_even):
    """The round-4 dynamic-window maxpool backward (forward-geometry stack
    kernel + window scatter-add) equals XLA autodiff through the windowed
    XLA twin — including even tie splitting on duplicated padded points."""
    rng = np.random.default_rng(3)
    n, c, b = 256, 8, 2
    width = 128
    base = np.stack([_cloud(n - 64, rng) for _ in range(b)])
    pts_np = np.concatenate([base, base[:, :64]], axis=1)  # duplicated rows
    feats_np = rng.normal(size=(b, n - 64, c)).astype(np.float32)
    feats_np = np.concatenate([feats_np, feats_np[:, :64]], axis=1)
    pts = jnp.asarray(pts_np)
    f = jnp.asarray(feats_np)
    starts = jax.vmap(
        lambda p: dynamic_band_starts(p, p, R_ACTIVE, tile=128, width=width)
    )(pts)

    def loss_pl(ff):
        out = banded_maxpool_pallas(
            ff, pts, pts, R_ACTIVE, 128, width, tie_even, starts
        )
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_x(ff):
        out = jax.vmap(
            lambda fff, p, st: banded_maxpool(
                fff, p, p, R_ACTIVE, 128, width, starts=st
            )
        )(ff, pts, starts)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_pl = jax.grad(loss_pl)(f)
    g_x = jax.grad(loss_x)(f)
    if tie_even:
        # XLA autodiff splits exact ties evenly; tie_even reproduces it
        np.testing.assert_allclose(
            np.asarray(g_pl), np.asarray(g_x), rtol=1e-5, atol=1e-5
        )
    else:
        # full routing differs on the duplicated rows but total mass matches
        np.testing.assert_allclose(
            float(jnp.sum(g_pl)), float(jnp.sum(g_x)), rtol=1e-4
        )


def test_dynamic_aggregate_backward_matches_xla():
    """The round-4 dynamic-window aggregation backward (forward-geometry
    stack kernel + window scatter-add) equals XLA autodiff through the
    windowed XLA twin."""
    rng = np.random.default_rng(4)
    n, c, b = 256, 8, 2
    width = 128
    pts = jnp.asarray(np.stack([_cloud(n, rng) for _ in range(b)]))
    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    starts = jax.vmap(
        lambda p: dynamic_band_starts(p, p, R_ACTIVE, tile=128, width=width)
    )(pts)
    probe = jnp.asarray(
        rng.normal(size=(b, n, KS, c)).astype(np.float32)
    )

    def loss_pl(ff):
        w, _ = banded_kpconv_aggregate_pallas(
            ff, pts, pts, RADIUS, SIGMA, KS, 128, width, jnp.float32, starts
        )
        return jnp.sum(w * probe)

    def loss_x(ff):
        w, _ = jax.vmap(
            lambda fff, p, st: banded_kpconv_aggregate(
                fff, p, p, RADIUS, SIGMA, KS, 128, width, starts=st
            )
        )(ff, pts, starts)
        return jnp.sum(w * probe)

    g_pl = jax.grad(loss_pl)(f)
    g_x = jax.grad(loss_x)(f)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_model_dynamic_plan_matches_static():
    """config.kpconv_dynamic_plan plumbed through the assembled network
    (CoFiI2P -> KPConvFPN -> blocks): with windows that cover the whole
    (tiny) levels, the dynamic-plan eval forward must reproduce the static
    plan's outputs to fp tolerance (the round-3 TPU driver checked the same
    contract on hardware; its findings live in PERF.md).  XLA twins on both sides — this pins the MODEL
    plumbing (per-pair shared starts, per-level width override), not the
    kernels, which the tests above cover."""
    import dataclasses

    from cofii2p_tpu.config import get_config
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P

    cfg_s = dataclasses.replace(
        get_config("tiny"), kpconv_impl="banded", kpconv_kernel="xla"
    )
    # L0 stays static (a 256 window is a true subset of the 512-point level
    # — outputs would legitimately differ); deeper levels are <= 256 points,
    # so their windows cover the whole level and outputs must match
    cfg_d = dataclasses.replace(
        cfg_s, kpconv_dynamic_plan=(0, 256, 256, 256, 256)
    )

    ds = SyntheticDataset(cfg_s, "val", length=1)
    item = ds[0]
    host = {k: np.asarray(item[k])[None] for k in ("pc", "attrs", "P", "K", "img")}
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(1), host["img"], cfg_s,
    )

    outs = []
    for cfg in (cfg_s, cfg_d):
        model = CoFiI2P(cfg)
        vars_ = model.init(jax.random.PRNGKey(1), batch, mode="train", train=False)
        outs.append(model.apply(vars_, batch, mode="train", train=False))
    for k in ("coarse_pc_score", "fine_pc_feature"):
        np.testing.assert_allclose(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]),
            rtol=5e-4, atol=5e-4, err_msg=k,
        )


def test_dynamic_plan_conflicts_with_compact_plans():
    """A dynamic window and a compacted formulation on the same support
    level must fail loudly: the compact branches take no `starts`, so the
    combination would silently reinterpret the window width as the
    half-band margin (ADVICE r3 #1)."""
    import dataclasses

    from cofii2p_tpu.config import get_config
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P

    cfg = dataclasses.replace(
        get_config("tiny"),
        kpconv_impl="banded",
        kpconv_kernel="xla",
        kpconv_dynamic_plan=(0, 256, 256, 256, 256),
        maxpool_compact_plan=(0, 0, 64, 0, 0),
    )
    ds = SyntheticDataset(cfg, "val", length=1)
    item = ds[0]
    host = {k: np.asarray(item[k])[None] for k in ("pc", "attrs", "P", "K", "img")}
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(1), host["img"], cfg,
    )
    model = CoFiI2P(cfg)
    with pytest.raises(NotImplementedError, match="compact"):
        model.init(jax.random.PRNGKey(1), batch, mode="train", train=False)


@pytest.mark.parametrize("center", ["centroid", "best"])
def test_dynamic_windows_coverage_on_lidar_geometry(center):
    """Neither 'centroid' nor 'best' placement has a per-row containment
    guarantee (unlike 'span'); this pins their in-reach coverage on a
    LiDAR-like 'xz'-Morton-ordered scene so a placement regression fails
    in CI instead of only in offline TPU studies (ADVICE r3 #2).  'best'
    is the max-kept-mass window, so it must also dominate 'centroid'."""
    rng = np.random.default_rng(7)
    n = 2048
    pts = np.concatenate(
        [
            rng.uniform(-40, 40, (n, 1)),
            rng.uniform(-2, 2, (n, 1)),
            rng.uniform(0, 80, (n, 1)),
        ],
        1,
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts), ordering="xz"))
    pts = pts[order]
    q = pts[: n // 2]  # strided level pair, same ordering
    r_active = 4.0
    width = 256
    d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    within = d2 <= r_active**2
    j = np.arange(n)
    m = len(q)

    def coverage(center):
        starts = np.asarray(
            dynamic_band_starts(
                jnp.asarray(q), jnp.asarray(pts), r_active, tile=128,
                width=width, center=center,
            )
        )
        kept = total = static_kept = 0
        for t, st in enumerate(starts):
            blk = within[t * 128 : (t + 1) * 128]
            inwin = (j >= st) & (j < st + width)
            kept += int((blk & inwin[None, :]).sum())
            sst = np.clip(((2 * t * 128 + 128) * n) // (2 * m) - width // 2,
                          0, n - width)
            swin = (j >= sst) & (j < sst + width)
            static_kept += int((blk & swin[None, :]).sum())
            total += int(blk.sum())
        return kept / max(total, 1), static_kept / max(total, 1)

    cov, static_cov = coverage(center)
    # placement must at least match proportional placement at equal width
    # and keep the bulk of the influence mass
    assert cov >= static_cov - 1e-9, (cov, static_cov)
    assert cov >= 0.90, cov
    if center == "best":
        # 'best' is optimal for this metric per tile, so it dominates
        assert cov >= coverage("centroid")[0] - 1e-9


def test_dynamic_fused_backward_matches_xla():
    """The fused (aggregation + weight contraction) kernel's dynamic-window
    VJP: d/d(feats) and d/d(weights) equal XLA autodiff through the
    windowed XLA twin + einsum."""
    rng = np.random.default_rng(5)
    n, c, d_out, b = 256, 8, 4, 2
    width = 128
    pts = jnp.asarray(np.stack([_cloud(n, rng) for _ in range(b)]))
    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(KS, c, d_out)).astype(np.float32))
    starts = jax.vmap(
        lambda p: dynamic_band_starts(p, p, R_ACTIVE, tile=128, width=width)
    )(pts)
    probe = jnp.asarray(rng.normal(size=(b, n, d_out)).astype(np.float32))

    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas

    def loss_pl(ff, ww):
        out, _ = banded_kpconv_fused_pallas(
            ff, pts, pts, ww, RADIUS, SIGMA, KS, 128, width, jnp.float32,
            starts,
        )
        return jnp.sum(out * probe)

    def loss_x(ff, ww):
        wt, _ = jax.vmap(
            lambda fff, p, st: banded_kpconv_aggregate(
                fff, p, p, RADIUS, SIGMA, KS, 128, width, starts=st
            )
        )(ff, pts, starts)
        out = jnp.einsum("bmkc,kcd->bmd", wt, ww)
        return jnp.sum(out * probe)

    gf_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(f, w)
    gf_x, gw_x = jax.grad(loss_x, argnums=(0, 1))(f, w)
    np.testing.assert_allclose(
        np.asarray(gf_pl), np.asarray(gf_x), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw_pl), np.asarray(gw_x), rtol=2e-4, atol=2e-4
    )


def test_strided_estimator_places_near_full():
    """stride>1 subsamples the occupancy estimate; on LiDAR-like geometry
    the chosen windows must keep (almost) the same in-reach mass as the
    full estimator's — the round-5 contract that makes shallow-level
    windows affordable (the full (tile, N) block cost more than the
    narrower scan saved, PERF.md)."""
    rng = np.random.default_rng(12)
    n, m, tile, width = 2048, 512, 64, 256
    pts = _cloud(n, rng)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    s = jnp.asarray(pts[order])
    q = s[:: n // m]

    full = np.asarray(
        dynamic_band_starts(q, s, R_ACTIVE, tile, width, "best", 1)
    )
    sub = np.asarray(
        dynamic_band_starts(q, s, R_ACTIVE, tile, width, "best", 4)
    )

    # mass kept by each start choice, per tile
    d2 = np.sum((np.asarray(q)[:, None] - np.asarray(s)[None]) ** 2, -1)
    within = d2 <= R_ACTIVE**2 * 1.0001
    kept_full = kept_sub = total = 0
    for t in range(len(full)):
        rows = within[t * tile : (t + 1) * tile]
        total += rows.sum()
        kept_full += rows[:, full[t] : full[t] + width].sum()
        kept_sub += rows[:, sub[t] : sub[t] + width].sum()
    assert total > 0
    # the subsampled placement keeps >= 98% of the full placement's mass
    assert kept_sub >= 0.98 * kept_full, (kept_sub, kept_full, total)

    # non-'best' centers reject stride>1 loudly
    with pytest.raises(NotImplementedError):
        dynamic_band_starts(q, s, R_ACTIVE, tile, width, "centroid", 4)
