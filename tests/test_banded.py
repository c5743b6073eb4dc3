"""Tests for the gather-free banded radius KPConv path (ops/banded.py).

Two layers of guarantees:
 - implementation exactness: the banded op equals a dense NumPy oracle of the
   *same* semantics (band-masked radius neighborhood) to float tolerance;
 - coverage: on Morton-ordered clouds the band captures ~all of the influence
   mass, and in the dense regime (band >= level) the banded op equals the
   *full* radius-neighborhood oracle and the gather path exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cofii2p_tpu.models.kernel_points import load_kernel_points
from cofii2p_tpu.ops import banded
from cofii2p_tpu.ops.pyramid import morton_order


def _cloud(n, rng, extent=30.0):
    pts = np.concatenate(
        [rng.uniform(0, extent, (n, 2)), rng.uniform(0, 2.0, (n, 1))], 1
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order]


def _dense_oracle(q, s, radius, sigma, band_mask=None):
    """Full-precision radius-neighborhood KPConv aggregation."""
    kp = np.asarray(load_kernel_points(radius, 15, 3))
    r = banded.kernel_reach(radius, sigma)
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    within = d2 <= r * r
    if band_mask is not None:
        within = within & band_mask
    offs = s[None, :, :] - q[:, None, :]
    dk = np.sqrt(np.maximum(d2[..., None] - 2 * offs @ kp.T + (kp**2).sum(-1), 0))
    infl = np.maximum(1 - dk / sigma, 0) * within[..., None]
    return infl, within


def _band_mask(m, n, tile, band_width):
    tile, _, band, dense = banded._band_geometry(m, n, tile, band_width)
    if dense:
        return np.ones((m, n), bool)
    t_idx = np.arange(m) // tile
    centers = ((2 * t_idx * tile + tile) * n) // (2 * m)
    starts = np.clip(centers - band // 2, 0, n - band)
    j = np.arange(n)[None, :]
    return (j >= starts[:, None]) & (j < starts[:, None] + band)


class TestBandedAggregate:
    def test_exact_vs_band_masked_oracle(self):
        rng = np.random.default_rng(0)
        pts = _cloud(1024, rng)
        feats = rng.normal(size=(1024, 8)).astype(np.float32)
        radius, sigma = 0.85, 0.4
        w, cnt = banded.banded_kpconv_aggregate(
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
            radius, sigma, 15, tile=128, band_width=128,
        )
        mask = _band_mask(1024, 1024, 128, 128)
        infl, within = _dense_oracle(pts, pts, radius, sigma, mask)
        oracle = np.einsum("mnk,nc->mkc", infl, feats)
        np.testing.assert_allclose(np.asarray(w), oracle, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(cnt), np.maximum(within.sum(-1), 1)
        )

    def test_dense_regime_equals_full_oracle(self):
        rng = np.random.default_rng(1)
        pts = _cloud(256, rng, extent=10.0)
        feats = rng.normal(size=(256, 8)).astype(np.float32)
        radius, sigma = 0.85, 0.4
        w, cnt = banded.banded_kpconv_aggregate(
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
            radius, sigma, 15, tile=128, band_width=512,  # band >= N -> dense
        )
        infl, within = _dense_oracle(pts, pts, radius, sigma)
        oracle = np.einsum("mnk,nc->mkc", infl, feats)
        np.testing.assert_allclose(np.asarray(w), oracle, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(cnt), np.maximum(within.sum(-1), 1))

    def test_strided_direction(self):
        """Queries at the coarse level, support at the fine level (ratio 2)."""
        rng = np.random.default_rng(2)
        s_pts = _cloud(512, rng)
        q_pts = s_pts[np.sort(rng.choice(512, 256, replace=False))]
        feats = rng.normal(size=(512, 4)).astype(np.float32)
        radius, sigma = 0.85, 0.4
        w, cnt = banded.banded_kpconv_aggregate(
            jnp.asarray(feats), jnp.asarray(q_pts), jnp.asarray(s_pts),
            radius, sigma, 15, tile=64, band_width=64,
        )
        mask = _band_mask(256, 512, 64, 64)
        infl, within = _dense_oracle(q_pts, s_pts, radius, sigma, mask)
        oracle = np.einsum("mnk,nc->mkc", infl, feats)
        np.testing.assert_allclose(np.asarray(w), oracle, rtol=1e-4, atol=1e-4)

    def test_compact_aggregate_radius_matches_banded(self):
        # with k >= band the compacted top-k form sums the same member set
        # (in nearest-first order) as the full-band path; capped k keeps
        # queries whose in-reach count <= k identical
        rng = np.random.default_rng(17)
        s = _cloud(512, rng)
        q = s[::2]
        feats = rng.normal(size=(512, 8)).astype(np.float32)
        radius, sigma = 0.85, 0.4
        args = (jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s))
        w_full, cnt_full = banded.banded_kpconv_aggregate(
            *args, radius, sigma, 15, tile=64, band_width=128
        )
        w_c, cnt_c = banded.banded_compact_aggregate(
            *args, radius, sigma, 15, k=512, tile=64, band_width=128
        )
        np.testing.assert_array_equal(np.asarray(cnt_c), np.asarray(cnt_full))
        np.testing.assert_allclose(
            np.asarray(w_c), np.asarray(w_full), rtol=1e-4, atol=1e-5
        )
        # capped: count stays the full in-reach count; weighted agrees
        # wherever the in-reach count <= k (pick k at the median count so the
        # cap genuinely bites on some queries)
        r = banded.kernel_reach(radius, sigma)
        mask = _band_mask(256, 512, 64, 128)
        within = (((q[:, None, :] - s[None, :, :]) ** 2).sum(-1) <= r * r) & mask
        k = int(np.median(within.sum(-1)))
        w_k, cnt_k = banded.banded_compact_aggregate(
            *args, radius, sigma, 15, k=k, tile=64, band_width=128
        )
        np.testing.assert_array_equal(np.asarray(cnt_k), np.asarray(cnt_full))
        ok = within.sum(-1) <= k
        assert ok.any() and not ok.all()
        np.testing.assert_allclose(
            np.asarray(w_k)[ok], np.asarray(w_full)[ok], rtol=1e-4, atol=1e-5
        )

    def test_compact_aggregate_knn_matches_tau(self):
        # knn=True must equal the tau path (banded_knn_tau threshold) — the
        # same membership computed by top-k selection instead of threshold
        rng = np.random.default_rng(18)
        s = _cloud(512, rng)
        q = s[::2]
        feats = np.abs(rng.normal(size=(512, 8))).astype(np.float32)
        feats[rng.choice(512, 40, replace=False)] = 0.0  # inactive rows
        radius, sigma = 0.85, 0.4
        k = 16
        args = (jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s))
        tau = banded.banded_knn_tau(
            jnp.asarray(q), jnp.asarray(s), k=k, tile=64, band_width=128
        )
        w_tau, cnt_tau = banded.banded_kpconv_aggregate(
            *args, radius, sigma, 15, tile=64, band_width=128, tau=tau
        )
        w_c, cnt_c = banded.banded_compact_aggregate(
            *args, radius, sigma, 15, k=k, tile=64, band_width=128, knn=True
        )
        np.testing.assert_array_equal(np.asarray(cnt_c), np.asarray(cnt_tau))
        np.testing.assert_allclose(
            np.asarray(w_c), np.asarray(w_tau), rtol=1e-4, atol=1e-5
        )

    def test_compact_approx_selection_cpu_exact(self):
        # approx=True (lax.approx_max_k — the TPU partial-reduce selection)
        # lowers to an exact selection on CPU, so both compact ops must
        # reproduce their top_k results bit-for-bit here; on TPU the studies
        # A/B the recall trade (tools/compact_mp_study --approx)
        rng = np.random.default_rng(20)
        s = _cloud(512, rng)
        q = s[::2]
        feats = rng.normal(size=(512, 8)).astype(np.float32)
        args = (jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s))
        mp_e = banded.banded_compact_maxpool(*args, 1.0, k=32, tile=64, band_width=128)
        mp_a = banded.banded_compact_maxpool(
            *args, 1.0, k=32, tile=64, band_width=128, approx=True
        )
        np.testing.assert_array_equal(np.asarray(mp_a), np.asarray(mp_e))
        w_e, c_e = banded.banded_compact_aggregate(
            *args, 0.85, 0.4, 15, k=32, tile=64, band_width=128
        )
        w_a, c_a = banded.banded_compact_aggregate(
            *args, 0.85, 0.4, 15, k=32, tile=64, band_width=128, approx=True
        )
        np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_e))
        np.testing.assert_allclose(
            np.asarray(w_a), np.asarray(w_e), rtol=1e-6, atol=1e-7
        )

    def test_compact_shared_rel_matches_inline_selection(self):
        # banded_knn_select feeds both compact ops: results must be
        # identical to each op's own inline top_k, and a wider shared
        # selection sliced to the consumer's k must equal the narrower one
        # (nearest-first prefix property)
        rng = np.random.default_rng(21)
        s = _cloud(512, rng)
        q = s[::2]
        feats = rng.normal(size=(512, 8)).astype(np.float32)
        qj, sj, fj = jnp.asarray(q), jnp.asarray(s), jnp.asarray(feats)
        rel = banded.banded_knn_select(qj, sj, k=32, tile=64, band_width=128)
        assert rel.shape == (256, 32) and rel.dtype == jnp.int32

        mp_inline = banded.banded_compact_maxpool(
            fj, qj, sj, 1.0, k=16, tile=64, band_width=128
        )
        mp_rel = banded.banded_compact_maxpool(
            fj, qj, sj, 1.0, k=16, tile=64, band_width=128, rel=rel[:, :16]
        )
        np.testing.assert_array_equal(np.asarray(mp_rel), np.asarray(mp_inline))

        w_i, c_i = banded.banded_compact_aggregate(
            fj, qj, sj, 0.85, 0.4, 15, k=16, tile=64, band_width=128
        )
        w_r, c_r = banded.banded_compact_aggregate(
            fj, qj, sj, 0.85, 0.4, 15, k=16, tile=64, band_width=128,
            rel=rel[:, :16],
        )
        np.testing.assert_array_equal(np.asarray(c_r), np.asarray(c_i))
        np.testing.assert_allclose(
            np.asarray(w_r), np.asarray(w_i), rtol=1e-6, atol=1e-7
        )
        # knn semantics through rel too
        mp_knn_i = banded.banded_compact_maxpool(
            fj, qj, sj, 0.0, k=32, tile=64, band_width=128, knn=True
        )
        mp_knn_r = banded.banded_compact_maxpool(
            fj, qj, sj, 0.0, k=32, tile=64, band_width=128, knn=True, rel=rel
        )
        np.testing.assert_array_equal(
            np.asarray(mp_knn_r), np.asarray(mp_knn_i)
        )

    def test_compact_aggregate_gradient(self):
        # autodiff composes top_k/gather (scatter-add VJP) with the influence
        # math — must match the full-band path's feature gradient at k >= band
        rng = np.random.default_rng(19)
        s = _cloud(256, rng)
        q = s[::2]
        feats = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
        radius, sigma = 0.85, 0.4
        qj, sj = jnp.asarray(q), jnp.asarray(s)

        def loss_compact(f):
            w, cnt = banded.banded_compact_aggregate(
                f, qj, sj, radius, sigma, 15, k=256, tile=64, band_width=128
            )
            return jnp.sum((w / cnt[:, None, None]) ** 2)

        def loss_full(f):
            w, cnt = banded.banded_kpconv_aggregate(
                f, qj, sj, radius, sigma, 15, tile=64, band_width=128
            )
            return jnp.sum((w / cnt[:, None, None]) ** 2)

        g_c = jax.grad(loss_compact)(feats)
        g_f = jax.grad(loss_full)(feats)
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g_f), rtol=1e-4, atol=1e-5
        )

    def test_influence_mass_coverage(self):
        """On a Morton-ordered KITTI-like cloud the band loses ~no influence."""
        rng = np.random.default_rng(3)
        pts = _cloud(2048, rng)
        cov = banded.band_coverage(pts, pts, 0.85, 0.4, band_width=256)
        assert cov["mass_coverage"] > 0.98, cov
        # generous band -> everything
        cov_wide = banded.band_coverage(pts, pts, 0.85, 0.4, band_width=1024)
        assert cov_wide["mass_coverage"] == 1.0, cov_wide


class TestBandedMaxpoolNearest:
    def test_maxpool_vs_oracle(self):
        rng = np.random.default_rng(4)
        s = _cloud(512, rng)
        q = s[::2]
        feats = rng.normal(size=(512, 6)).astype(np.float32)
        r = 1.0
        out = banded.banded_maxpool(
            jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s), r,
            tile=64, band_width=512,  # dense
        )
        within = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1) <= r * r
        oracle = np.where(within[..., None], feats[None], -np.inf).max(1)
        oracle = np.where(within.any(-1)[..., None], oracle, 0.0)
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-6)

    def test_compact_maxpool_radius_matches_select(self):
        # where the in-reach count <= k, the compacted top-k form must equal
        # banded_maxpool exactly; with k >= band it always does
        rng = np.random.default_rng(14)
        s = _cloud(512, rng)
        q = s[::2]
        feats = rng.normal(size=(512, 6)).astype(np.float32)
        r = 1.0
        args = (jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s))
        sel = banded.banded_maxpool(*args, r, tile=64, band_width=256)
        comp = banded.banded_compact_maxpool(
            *args, r, k=512, tile=64, band_width=256
        )
        np.testing.assert_array_equal(np.asarray(comp), np.asarray(sel))
        # capped k: rows whose count <= k still agree
        k = 16
        comp_k = banded.banded_compact_maxpool(
            *args, r, k=k, tile=64, band_width=256
        )
        within = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1) <= r * r
        ok = within.sum(-1) <= k
        assert ok.any()
        np.testing.assert_array_equal(
            np.asarray(comp_k)[ok], np.asarray(sel)[ok]
        )

    def test_compact_maxpool_knn_matches_bruteforce(self):
        # knn=True: max over the k nearest (reference kNN maxpool), full band
        rng = np.random.default_rng(15)
        s = _cloud(256, rng)
        q = _cloud(64, rng)
        feats = rng.normal(size=(256, 5)).astype(np.float32)
        k = 8
        out = banded.banded_compact_maxpool(
            jnp.asarray(feats), jnp.asarray(q), jnp.asarray(s), 0.0, k=k,
            tile=64, band_width=512, knn=True,
        )
        d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        knn_idx = np.argsort(d2, axis=1)[:, :k]
        oracle = feats[knn_idx].max(1)
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-6)

    def test_compact_maxpool_gradient(self):
        # autodiff routes the cotangent through gather+max (scatter to the
        # argmax rows) — must match the select path's gradient where they
        # agree on membership
        rng = np.random.default_rng(16)
        s = _cloud(256, rng)
        q = s[::2]
        feats = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
        r = 1.0

        def loss_comp(f):
            return jnp.sum(
                banded.banded_compact_maxpool(
                    f, jnp.asarray(q), jnp.asarray(s), r, k=256, tile=64,
                    band_width=256,
                ) ** 2
            )

        def loss_sel(f):
            return jnp.sum(
                banded.banded_maxpool(
                    f, jnp.asarray(q), jnp.asarray(s), r, tile=64,
                    band_width=256,
                ) ** 2
            )

        g_c = jax.grad(loss_comp)(feats)
        g_s = jax.grad(loss_sel)(feats)
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g_s), rtol=1e-6, atol=1e-6
        )

    def test_nearest_index_dense_exact(self):
        rng = np.random.default_rng(5)
        s = _cloud(256, rng)
        q = _cloud(512, rng)
        idx = banded.banded_nearest_index(
            jnp.asarray(q), jnp.asarray(s), tile=128, band_width=256  # dense
        )
        true = np.argmin(((q[:, None, :] - s[None, :, :]) ** 2).sum(-1), axis=1)
        np.testing.assert_array_equal(np.asarray(idx), true)

    def test_nearest_index_banded_recall(self):
        rng = np.random.default_rng(6)
        fine = _cloud(2048, rng)
        coarse = fine[np.sort(rng.choice(2048, 1024, replace=False))]
        idx = banded.banded_nearest_index(
            jnp.asarray(fine), jnp.asarray(coarse), tile=128, band_width=256
        )
        true = np.argmin(((fine[:, None, :] - coarse[None, :, :]) ** 2).sum(-1), 1)
        assert (np.asarray(idx) == true).mean() > 0.99


class TestBandedKPConvModule:
    def test_matches_gather_path_when_everything_covered(self):
        """With band >= N, kNN H = N, and reach >= cloud diameter, the banded
        and gather KPConv paths compute the identical function (same params)."""
        from cofii2p_tpu.models.kpconv import KPConv

        rng = np.random.default_rng(7)
        n = 64
        pts = _cloud(n, rng, extent=1.0)[None]  # diameter ~ 2.4
        feats = np.abs(rng.normal(size=(1, n, 5))).astype(np.float32) + 0.1
        nbr = np.argsort(
            ((pts[0][:, None, :] - pts[0][None, :, :]) ** 2).sum(-1), axis=-1
        ).astype(np.int32)[None]

        radius, sigma = 4.0, 4.0  # reach > diameter -> all pairs active
        kw = dict(out_channels=8, kernel_size=15, radius=radius, sigma=sigma)
        mod_g = KPConv(**kw, impl="gather")
        mod_b = KPConv(**kw, impl="banded", tile=64, band_width=n)
        params = mod_g.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(nbr))
        out_g = mod_g.apply(params, jnp.asarray(feats), jnp.asarray(pts),
                            jnp.asarray(pts), jnp.asarray(nbr))
        out_b = mod_b.apply(params, jnp.asarray(feats), jnp.asarray(pts),
                            jnp.asarray(pts), None)
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_b),
                                   rtol=1e-4, atol=1e-5)


class TestBandedNetwork:
    @pytest.fixture(scope="class")
    def cfg(self):
        from cofii2p_tpu.config import TinyConfig

        return TinyConfig(kpconv_impl="banded", kpconv_tile=64, kpconv_band_width=64)

    def test_pyramid_skips_maps(self, cfg):
        from cofii2p_tpu.ops.pyramid import build_pyramid

        pts = jnp.asarray(np.random.default_rng(0).normal(size=(512, 3)), jnp.float32)
        pyr = build_pyramid(pts, jax.random.PRNGKey(0), cfg.pyramid_sizes,
                            need_maps=False)
        assert "neighbors" not in pyr and "subsampling" not in pyr
        assert len(pyr["points"]) == cfg.num_stages

    @pytest.mark.slow
    def test_forward_and_train_step(self, cfg):
        from cofii2p_tpu.data.loader import _collate
        from cofii2p_tpu.data.synthetic import SyntheticDataset
        from cofii2p_tpu.models import CoFiI2P
        from cofii2p_tpu import train_lib

        ds = SyntheticDataset(cfg, "train", length=2)
        host = _collate([ds[i] for i in range(2)])
        host = {k: v for k, v in host.items() if k != "index"}
        model = CoFiI2P(cfg)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
        step = train_lib.make_train_step(cfg, model, tx)
        state2, metrics = step(state, host, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # a second step must reuse the compiled function (static shapes)
        state3, metrics2 = step(state2, host, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics2["loss"]))
