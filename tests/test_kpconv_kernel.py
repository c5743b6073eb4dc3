"""Pallas banded-KPConv kernel vs the XLA banded path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import banded_kpconv_aggregate
from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
from cofii2p_tpu.ops.pyramid import morton_order


def _cloud(n, rng, extent=20.0):
    pts = np.concatenate(
        [rng.uniform(0, extent, (n, 2)), rng.uniform(0, 2.0, (n, 1))], 1
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order]


def _setup(b=2, n=256, c=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([_cloud(n, rng) for _ in range(b)])
    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(pts)


KW = dict(radius=0.85, sigma=0.4, kernel_size=15, tile=64, band_width=64)


def test_matches_xla_banded_path():
    feats, pts = _setup()
    w_pl, cnt_pl = banded_kpconv_aggregate_pallas(feats, pts, pts, **KW)
    w_xla, cnt_xla = jax.vmap(
        lambda f, q, s: banded_kpconv_aggregate(f, q, s, **KW)
    )(feats, pts, pts)
    np.testing.assert_allclose(
        np.asarray(w_pl), np.asarray(w_xla), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(cnt_pl), np.asarray(cnt_xla))


def test_strided_direction():
    feats, pts = _setup(n=256)
    q = pts[:, ::2]  # (B, 128, 3) coarse queries
    kw = dict(KW, tile=64, band_width=48)
    w_pl, cnt_pl = banded_kpconv_aggregate_pallas(feats, q, pts, **kw)
    w_xla, cnt_xla = jax.vmap(
        lambda f, qq, s: banded_kpconv_aggregate(f, qq, s, **kw)
    )(feats, q, pts)
    np.testing.assert_allclose(
        np.asarray(w_pl), np.asarray(w_xla), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(cnt_pl), np.asarray(cnt_xla))


def test_gradient_matches_xla_path():
    feats, pts = _setup(b=1, n=128, c=8)
    kw = dict(KW, tile=32, band_width=32)

    def loss_pl(f):
        w, _ = banded_kpconv_aggregate_pallas(f, pts, pts, **kw)
        return jnp.sum(w * w)

    def loss_xla(f):
        w, _ = jax.vmap(
            lambda ff, q, s: banded_kpconv_aggregate(ff, q, s, **kw)
        )(f, pts, pts)
        return jnp.sum(w * w)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_gradient_matches_xla_path_strided_multitile():
    # m != n and several query tiles + support tiles: exercises the backward
    # kernel's per-support-tile query-window plan and the in-kernel band mask
    feats, pts = _setup(b=2, n=512, c=8)
    q = pts[:, ::2]  # (B, 256, 3)
    kw = dict(KW, tile=64, band_width=48)
    g = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 256, 15, 8)).astype(np.float32)
    )

    def loss_pl(f):
        w, _ = banded_kpconv_aggregate_pallas(f, q, pts, **kw)
        return jnp.sum(w * g)

    def loss_xla(f):
        w, _ = jax.vmap(
            lambda ff, qq, s: banded_kpconv_aggregate(ff, qq, s, **kw)
        )(f, q, pts)
        return jnp.sum(w * g)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_network_forward_with_pallas_kernel():
    from cofii2p_tpu.config import TinyConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib

    cfg = TinyConfig(kpconv_impl="banded", kpconv_kernel="pallas",
                     kpconv_tile=64, kpconv_band_width=64)
    ds = SyntheticDataset(cfg, "train", length=2)
    host = {k: v for k, v in _collate([ds[i] for i in range(2)]).items()
            if k != "index"}
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    step = train_lib.make_train_step(cfg, model, tx)
    _, metrics = step(state, host, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_fused_contraction_matches_unfused():
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas

    feats, pts = _setup(b=2, n=256, c=16)
    q = pts[:, ::2]
    kw = dict(KW, tile=64, band_width=48)
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.normal(size=(15, 16, 24)).astype(np.float32) * 0.1)

    out_f, cnt_f = banded_kpconv_fused_pallas(feats, q, pts, w, **kw)
    weighted, cnt_u = banded_kpconv_aggregate_pallas(feats, q, pts, **kw)
    out_u = jnp.einsum("bmkc,kcd->bmd", weighted, w,
                       preferred_element_type=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))


def test_fused_gradients_match_unfused():
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas

    feats, pts = _setup(b=1, n=128, c=8)
    kw = dict(KW, tile=32, band_width=32)
    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.normal(size=(15, 8, 8)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(1, 128, 8)).astype(np.float32))

    def loss_fused(f, ww):
        out, _ = banded_kpconv_fused_pallas(f, pts, pts, ww, **kw)
        return jnp.sum(out * g)

    def loss_unfused(f, ww):
        weighted, _ = banded_kpconv_aggregate_pallas(f, pts, pts, **kw)
        out = jnp.einsum("bmkc,kcd->bmd", weighted, ww,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out * g)

    gf, gw = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    gf2, gw2 = jax.grad(loss_unfused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_fused_contraction_fits_gate():
    from cofii2p_tpu.ops.kpconv_kernel import fused_contraction_fits

    assert fused_contraction_fits(15, 32, 32)
    assert fused_contraction_fits(15, 256, 256)
    assert not fused_contraction_fits(15, 512, 512)


# ---------------------------------------------------------------------------
# tau (k-NN semantics) variants
# ---------------------------------------------------------------------------


def _tau_setup(b=2, n=256, c=16, k=24, seed=0, tile=64, band_width=64):
    from cofii2p_tpu.ops.banded import banded_knn_tau

    feats, pts = _setup(b=b, n=n, c=c, seed=seed)
    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=k, tile=tile, band_width=band_width)
    )(pts, pts)
    return feats, pts, tau


def _ref_kp(radius, kernel_size, rot=0.3):
    """A rotated disposition standing in for an imported per-layer buffer."""
    from cofii2p_tpu.ops.banded import _load_kernel_points

    kp = _load_kernel_points(radius, kernel_size)
    c, s = np.cos(rot), np.sin(rot)
    r = np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
    return jnp.asarray(kp @ r.T)


def test_tau_matches_xla_banded_path():
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_tau_pallas

    feats, pts, tau = _tau_setup()
    kp = _ref_kp(KW["radius"], KW["kernel_size"])
    w_pl, cnt_pl = banded_kpconv_aggregate_tau_pallas(
        feats, pts, pts, tau, kp, **KW
    )
    w_xla, cnt_xla = jax.vmap(
        lambda f, q, s, t: banded_kpconv_aggregate(f, q, s, tau=t, kp=kp, **KW)
    )(feats, pts, pts, tau)
    np.testing.assert_allclose(
        np.asarray(w_pl), np.asarray(w_xla), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(cnt_pl), np.asarray(cnt_xla))


def test_tau_active_row_count():
    # count must follow the reference's feature-sum>0 rule, not |{d2<=tau}|
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_tau_pallas

    # full-coverage band so the brute-force full-cloud expectation applies
    feats, pts, tau = _tau_setup(b=1, c=4, band_width=512)
    kw = dict(KW, band_width=512)
    # force some rows inactive (all-negative features)
    f = np.array(feats)
    f[0, ::3] = -np.abs(f[0, ::3]) - 0.1
    feats = jnp.asarray(f)
    kp = _ref_kp(KW["radius"], KW["kernel_size"])
    _, cnt = banded_kpconv_aggregate_tau_pallas(feats, pts, pts, tau, kp, **kw)
    d2 = np.sum(
        (np.asarray(pts)[0, :, None] - np.asarray(pts)[0, None]) ** 2, -1
    )
    active = f[0].sum(-1) > 0
    expect = np.maximum(
        ((d2 <= np.asarray(tau)[0][:, None]) & active[None, :]).sum(-1), 1
    )
    np.testing.assert_array_equal(np.asarray(cnt)[0], expect)


def test_tau_gradient_matches_xla_path():
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_tau_pallas

    feats, pts, tau = _tau_setup(b=1, n=128, c=8, tile=32, band_width=32)
    kw = dict(KW, tile=32, band_width=32)
    kp = _ref_kp(KW["radius"], KW["kernel_size"])

    def loss_pl(f):
        w, _ = banded_kpconv_aggregate_tau_pallas(f, pts, pts, tau, kp, **kw)
        return jnp.sum(w * w)

    def loss_xla(f):
        w, _ = jax.vmap(
            lambda ff, q, s, t: banded_kpconv_aggregate(
                ff, q, s, tau=t, kp=kp, **kw
            )
        )(f, pts, pts, tau)
        return jnp.sum(w * w)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_fused_tau_matches_unfused():
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_tau_pallas,
        banded_kpconv_fused_tau_pallas,
    )

    feats, pts, tau = _tau_setup(c=8)
    kp = _ref_kp(KW["radius"], KW["kernel_size"])
    d_out = 12
    rng = np.random.default_rng(5)
    weights = jnp.asarray(
        rng.normal(size=(KW["kernel_size"], 8, d_out)).astype(np.float32) * 0.1
    )
    out_f, cnt_f = banded_kpconv_fused_tau_pallas(
        feats, pts, pts, weights, tau, kp, **KW
    )
    w_u, cnt_u = banded_kpconv_aggregate_tau_pallas(
        feats, pts, pts, tau, kp, **KW
    )
    out_u = jnp.einsum("bmkc,kcd->bmd", w_u, weights)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))


def test_fused_tau_gradients_match_unfused():
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_tau_pallas,
        banded_kpconv_fused_tau_pallas,
    )

    feats, pts, tau = _tau_setup(b=1, n=128, c=8, tile=32, band_width=32)
    kw = dict(KW, tile=32, band_width=32)
    kp = _ref_kp(KW["radius"], KW["kernel_size"])
    d_out = 12
    rng = np.random.default_rng(6)
    weights = jnp.asarray(
        rng.normal(size=(KW["kernel_size"], 8, d_out)).astype(np.float32) * 0.1
    )

    def loss_f(f, w):
        out, _ = banded_kpconv_fused_tau_pallas(f, pts, pts, w, tau, kp, **kw)
        return jnp.sum(out * out)

    def loss_u(f, w):
        wt, _ = banded_kpconv_aggregate_tau_pallas(f, pts, pts, tau, kp, **kw)
        out = jnp.einsum("bmkc,kcd->bmd", wt, w)
        return jnp.sum(out * out)

    gf = jax.grad(loss_f, argnums=(0, 1))(feats, weights)
    gu = jax.grad(loss_u, argnums=(0, 1))(feats, weights)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )



def test_fused_fits_gate_by_weight_dtype():
    """bf16 compute halves the fused kernel's weight block, admitting the
    C=512 convs that fp32 excludes (round 4); the fp32 gate is unchanged."""
    from cofii2p_tpu.ops.kpconv_kernel import fused_contraction_fits

    # fp32 gate: the historical set
    assert fused_contraction_fits(15, 256, 256, wbytes=4)
    assert not fused_contraction_fits(15, 512, 256, wbytes=4)
    # bf16 gate: C=512 in/out-256 now fits; K*512*1024 still does not
    assert fused_contraction_fits(15, 512, 256, wbytes=2)
    assert fused_contraction_fits(15, 512, 512, wbytes=2)
    assert not fused_contraction_fits(15, 512, 1024, wbytes=2)


def test_fused_bf16_weights_match_incode_cast():
    """Shipping W pre-cast to the compute dtype is value-identical to the
    old in-kernel cast: the bf16 fused kernel still matches the unfused
    bf16 path to MXU rounding."""
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_pallas,
        banded_kpconv_fused_pallas,
    )

    rng = np.random.default_rng(11)
    n, c, d_out = 256, 32, 16
    pts = jnp.asarray(_cloud(n, rng))[None]
    feats = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(15, c, d_out)).astype(np.float32) * 0.1
    )
    kw = dict(KW, dtype=jnp.bfloat16)
    out_f, cnt_f = banded_kpconv_fused_pallas(feats, pts, pts, w, **kw)
    weighted, cnt = banded_kpconv_aggregate_pallas(feats, pts, pts, **kw)
    out_u = jnp.einsum(
        "bmkc,kcd->bmd",
        weighted.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt))
    rms = float(np.sqrt(np.mean(np.asarray(out_u) ** 2))) + 1e-12
    rel = np.abs(np.asarray(out_f) - np.asarray(out_u)) / np.maximum(
        np.abs(np.asarray(out_u)), rms
    )
    assert rel.max() < 5e-2, rel.max()
