"""Pallas banded-maxpool kernel vs the XLA banded path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import banded_maxpool, kernel_reach
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
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
    # all-distinct feature values: exact fp32 collisions are a real (if
    # measure-zero) event for rng.normal at this size; tied values are
    # exercised separately by the duplicate-point tests below
    vals = rng.permutation(b * n * c).astype(np.float32)
    feats = ((vals - vals.mean()) / (b * n * c / 4)).reshape(b, n, c)
    return jnp.asarray(feats), jnp.asarray(pts)


def _setup_duplicates(n_unique=96, n_dup=32, c=8, seed=11):
    """A cloud padded by exact point duplication — the resample_fixed
    padding semantics that makes maxpool ties real, not measure-zero."""
    rng = np.random.default_rng(seed)
    pts_u = _cloud(n_unique, rng)
    feats_u = rng.normal(size=(n_unique, c)).astype(np.float32)
    pts = np.concatenate([pts_u, pts_u[:n_dup]], 0)
    feats = np.concatenate([feats_u, feats_u[:n_dup]], 0)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return jnp.asarray(feats[order])[None], jnp.asarray(pts[order])[None]


R_ACTIVE = kernel_reach(0.85, 0.4, 15)
KW = dict(tile=64, band_width=64)


def _xla(feats, q, s, **kw):
    return jax.vmap(
        lambda f, qq, ss: banded_maxpool(f, qq, ss, R_ACTIVE, **kw)
    )(feats, q, s)


def test_matches_xla_banded_path():
    feats, pts = _setup()
    out_pl = banded_maxpool_pallas(feats, pts, pts, R_ACTIVE, **KW)
    out_xla = _xla(feats, pts, pts, **KW)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla))


def test_strided_direction_non_multiple_channels():
    # c=192 is not a 128-multiple, so the kernel's rule runs it as a single
    # channel chunk (maxpool_kernel.py cc rule); strided m != n
    feats, pts = _setup(n=256, c=192)
    q = pts[:, ::2]
    kw = dict(tile=64, band_width=48)
    out_pl = banded_maxpool_pallas(feats, q, pts, R_ACTIVE, **kw)
    out_xla = _xla(feats, q, pts, **kw)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla))


def test_multichunk_channel_and_band_revisit(monkeypatch):
    """Force cc=128 (so cj spans 2 chunks at c=256) and band chunking in
    interpret mode — the revisit/accumulation paths production C=128/256/512
    takes on TPU, including the cnt/_finish interplay across cj."""
    from cofii2p_tpu.ops import maxpool_kernel as mk

    feats, pts = _setup(n=256, c=256)
    q = pts[:, ::2]
    kw = dict(tile=64, band_width=32)  # band = 128 + 64 = 192, 64-divisible
    out_xla = _xla(feats, q, pts, **kw)
    monkeypatch.setattr(mk, "_FORCE_CHUNKS", (128, 64))
    out_pl = banded_maxpool_pallas(feats, q, pts, R_ACTIVE, **kw)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla))


def test_multichunk_gradient(monkeypatch):
    """Backward channel chunking (cj > 1) under forced chunks."""
    from cofii2p_tpu.ops import maxpool_kernel as mk

    feats, pts = _setup(b=1, n=256, c=256)
    g = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 256, 256)).astype(np.float32)
    )

    def loss_xla(f):
        return jnp.sum(_xla(f, pts, pts, **KW) * g)

    g_xla = jax.grad(loss_xla)(feats)
    monkeypatch.setattr(mk, "_FORCE_CHUNKS", (128, 64))

    def loss_pl(f):
        return jnp.sum(banded_maxpool_pallas(f, pts, pts, R_ACTIVE, **KW) * g)

    g_pl = jax.grad(loss_pl)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-5
    )


def test_empty_neighborhood_yields_zeros():
    feats, pts = _setup(b=1, n=128, c=8)
    # one far-away query: nothing within reach -> exact zeros
    q = jnp.concatenate(
        [pts[:, :63], jnp.full((1, 1, 3), 500.0), pts[:, 63:64]], axis=1
    )
    out = banded_maxpool_pallas(feats, q, pts, R_ACTIVE, tile=32, band_width=32)
    np.testing.assert_array_equal(np.asarray(out[0, 63]), np.zeros(8))


def test_gradient_matches_xla_path():
    feats, pts = _setup(b=2, n=256, c=16)
    g = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 256, 16)).astype(np.float32)
    )

    def loss_pl(f):
        return jnp.sum(banded_maxpool_pallas(f, pts, pts, R_ACTIVE, **KW) * g)

    def loss_xla(f):
        return jnp.sum(_xla(f, pts, pts, **KW) * g)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-5
    )


def test_gradient_strided_multitile():
    feats, pts = _setup(b=2, n=512, c=8)
    q = pts[:, ::2]
    kw = dict(tile=64, band_width=48)
    g = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 256, 8)).astype(np.float32)
    )

    def loss_pl(f):
        return jnp.sum(banded_maxpool_pallas(f, q, pts, R_ACTIVE, **kw) * g)

    def loss_xla(f):
        return jnp.sum(_xla(f, q, pts, **kw) * g)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-5
    )


def test_tie_gradient_even_split_with_duplicates():
    """Duplicated (padded) points tie at the max in every channel; the
    backward's count pass must split the cotangent evenly like XLA
    autodiff — full routing would amplify the summed gradient N-fold."""
    feats, pts = _setup_duplicates()
    kw = dict(tile=32, band_width=32)
    g = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 128, 8)).astype(np.float32)
    )

    def loss_pl(f):
        return jnp.sum(banded_maxpool_pallas(f, pts, pts, R_ACTIVE, **kw) * g)

    def loss_xla(f):
        return jnp.sum(_xla(f, pts, pts, **kw) * g)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-6
    )
    # sanity: the ties are real — tie_even=False (the pre-fix routing)
    # must NOT match on this input
    def loss_full(f):
        return jnp.sum(
            banded_maxpool_pallas(f, pts, pts, R_ACTIVE, kw["tile"],
                                  kw["band_width"], False) * g
        )

    g_full = jax.grad(loss_full)(feats)
    assert np.abs(np.asarray(g_full) - np.asarray(g_xla)).max() > 1e-3


def test_tau_tie_gradient_even_split_with_duplicates():
    from cofii2p_tpu.ops.banded import banded_knn_tau
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas

    feats, pts = _setup_duplicates(seed=13)
    kw = dict(tile=32, band_width=32)
    tau = jax.vmap(lambda q, s: banded_knn_tau(q, s, k=12, **kw))(pts, pts)
    g = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, 128, 8)).astype(np.float32)
    )

    def loss_pl(f):
        return jnp.sum(banded_maxpool_tau_pallas(f, pts, pts, tau, **kw) * g)

    def loss_xla(f):
        out = jax.vmap(
            lambda ff, q, s, t: banded_maxpool(ff, q, s, 0.0, tau=t, **kw)
        )(f, pts, pts, tau)
        return jnp.sum(out * g)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-6
    )


# ---------------------------------------------------------------------------
# tau (k-NN semantics) variant
# ---------------------------------------------------------------------------


def test_tau_matches_xla_banded_path():
    from cofii2p_tpu.ops.banded import banded_knn_tau
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas

    feats, pts = _setup()
    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=12, tile=KW["tile"],
                                    band_width=KW["band_width"])
    )(pts, pts)
    out_pl = banded_maxpool_tau_pallas(
        feats, pts, pts, tau, KW["tile"], KW["band_width"]
    )
    out_xla = jax.vmap(
        lambda f, q, s, t: banded_maxpool(
            f, q, s, 0.0, KW["tile"], KW["band_width"], tau=t
        )
    )(feats, pts, pts, tau)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_xla))


def test_tau_gradient_matches_xla_path():
    from cofii2p_tpu.ops.banded import banded_knn_tau
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas

    feats, pts = _setup(b=1, n=128, c=8)
    kw = dict(tile=32, band_width=32)
    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=12, **kw)
    )(pts, pts)

    def loss_pl(f):
        return jnp.sum(
            banded_maxpool_tau_pallas(f, pts, pts, tau, **kw) ** 2
        )

    def loss_xla(f):
        out = jax.vmap(
            lambda ff, q, s, t: banded_maxpool(ff, q, s, 0.0, tau=t, **kw)
        )(f, pts, pts, tau)
        return jnp.sum(out**2)

    g_pl = jax.grad(loss_pl)(feats)
    g_xla = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_xla), rtol=1e-5, atol=1e-5
    )


def test_tau_direct_indexed_chunked(monkeypatch):
    import cofii2p_tpu.ops.maxpool_kernel as mod
    from cofii2p_tpu.ops.banded import banded_knn_tau
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas

    monkeypatch.setattr(mod, "_FORCE_CHUNKS", (None, 32))
    feats, pts = _setup()
    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=12, tile=KW["tile"],
                                    band_width=KW["band_width"])
    )(pts, pts)
    out_pl = banded_maxpool_tau_pallas(
        feats, pts, pts, tau, KW["tile"], KW["band_width"]
    )
    out_xla = jax.vmap(
        lambda f, q, s, t: banded_maxpool(
            f, q, s, 0.0, KW["tile"], KW["band_width"], tau=t
        )
    )(feats, pts, pts, tau)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_xla))
