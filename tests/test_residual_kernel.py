"""Fused strided-ResidualBlock band pass (ops/residual_kernel.py) vs the
unfused aggregation + maxpool pair (interpret mode on CPU).

The fused kernel serves the strided blocks' eval path; these tests pin
(a) value equality of all three outputs against the unfused Pallas pair,
(b) gradient equality against the unfused composition (the VJP delegates
to it, so this checks the delegation wiring end-to-end), (c) the chunked
revisit paths via the _FORCE_CHUNKS hook, and (d) the model-level wiring:
a strided banded ResidualBlock with kernel='pallas' must match kernel='xla'.

Reference semantics: /root/reference/model/kpconv/modules.py:162-240 (the
strided bottleneck block whose shortcut maxpools the block input over the
conv's own neighborhood).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cofii2p_tpu.ops.banded import kernel_reach
from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
from cofii2p_tpu.ops.residual_kernel import (
    banded_residual_fused_pallas,
    residual_fused_fits,
)
from cofii2p_tpu.ops.pyramid import morton_order

K = 15
RADIUS, SIGMA = 2.5, 1.2
TILE, BW = 32, 64


def _cloud(n, rng, extent=20.0):
    pts = np.concatenate(
        [rng.uniform(0, extent, (n, 2)), rng.uniform(0, 2.0, (n, 1))], 1
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts)))
    return pts[order]


def _setup(b=2, m=64, n=128, cin=32, cmid=8, dout=8, seed=0):
    rng = np.random.default_rng(seed)
    s = np.stack([_cloud(n, rng) for _ in range(b)])
    # queries = strided subset of the support cloud (like the pyramid)
    q = s[:, :: n // m, :]
    fm = rng.normal(size=(b, n, cin)).astype(np.float32)
    fa = rng.normal(size=(b, n, cmid)).astype(np.float32)
    w = (rng.normal(size=(K, cmid, dout)) / np.sqrt(cmid * K)).astype(np.float32)
    return (
        jnp.asarray(fm), jnp.asarray(fa), jnp.asarray(w),
        jnp.asarray(q), jnp.asarray(s),
    )


def _unfused(fm, fa, w, q, s, starts=None):
    out, count = banded_kpconv_fused_pallas(
        fa, q, s, w, RADIUS, SIGMA, K, TILE, BW, jnp.float32, starts
    )
    mp = banded_maxpool_pallas(
        fm, q, s, kernel_reach(RADIUS, SIGMA, K), TILE, BW, True, starts
    )
    return out, count, mp


def test_fused_matches_unfused_pair():
    fm, fa, w, q, s = _setup()
    agg_f, cnt_f, mp_f = banded_residual_fused_pallas(
        fm, fa, w, q, s, RADIUS, SIGMA, K, TILE, BW
    )
    agg_u, cnt_u, mp_u = _unfused(fm, fa, w, q, s)
    # single-chunk interpret mode: identical accumulation order -> exact
    np.testing.assert_array_equal(np.asarray(agg_f), np.asarray(agg_u))
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    np.testing.assert_array_equal(np.asarray(mp_f), np.asarray(mp_u))
    assert agg_f.dtype == jnp.float32 and mp_f.dtype == fm.dtype
    # sanity: some neighborhoods are non-trivial
    assert int(cnt_f.max()) > 1


def test_fused_matches_unfused_pair_dynamic_starts():
    from cofii2p_tpu.ops.banded import dynamic_band_starts

    fm, fa, w, q, s = _setup(seed=3)
    r_act = kernel_reach(RADIUS, SIGMA, K)
    starts = jax.vmap(
        lambda qq, ss: dynamic_band_starts(qq, ss, r_act, TILE, BW, "best")
    )(q, s)
    agg_f, cnt_f, mp_f = banded_residual_fused_pallas(
        fm, fa, w, q, s, RADIUS, SIGMA, K, TILE, BW, jnp.float32, True, starts
    )
    agg_u, cnt_u, mp_u = _unfused(fm, fa, w, q, s, starts)
    np.testing.assert_array_equal(np.asarray(agg_f), np.asarray(agg_u))
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    np.testing.assert_array_equal(np.asarray(mp_f), np.asarray(mp_u))


def test_fused_chunked_revisit(monkeypatch):
    """Force channel + band chunking so the running-max revisit, the
    membership-scratch reuse across cin chunks, and the acc accumulation
    across band chunks all execute off-TPU."""
    import cofii2p_tpu.ops.residual_kernel as rk

    fm, fa, w, q, s = _setup(seed=5)
    base = banded_residual_fused_pallas(fm, fa, w, q, s, RADIUS, SIGMA, K, TILE, BW)
    monkeypatch.setattr(rk, "_FORCE_CHUNKS", (16, 32))
    chunked = banded_residual_fused_pallas(fm, fa, w, q, s, RADIUS, SIGMA, K, TILE, BW)
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(chunked[1]))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(chunked[2]))
    # fp32 partial sums in band-chunk order: tiny reassociation tolerance
    np.testing.assert_allclose(
        np.asarray(base[0]), np.asarray(chunked[0]), rtol=2e-6, atol=2e-6
    )


def test_fused_gradients_match_unfused():
    """The VJP delegates to the unfused pair; grads must be identical."""
    fm, fa, w, q, s = _setup(seed=7)

    def loss_fused(fm_, fa_, w_):
        a, _, m_ = banded_residual_fused_pallas(
            fm_, fa_, w_, q, s, RADIUS, SIGMA, K, TILE, BW
        )
        return jnp.sum(a * 0.1) + jnp.sum(m_ * 0.3)

    def loss_unfused(fm_, fa_, w_):
        a, _, m_ = _unfused(fm_, fa_, w_, q, s)
        return jnp.sum(a * 0.1) + jnp.sum(m_ * 0.3)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(fm, fa, w)
    gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(fm, fa, w)
    for a, b in zip(gf, gu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_residual_fused_fits():
    # serving-shape cases fit; the fp32 static enc5_1 shape must not
    assert residual_fused_fits(15, 64, 64, 256, 192, 128, 2, 2)  # enc3_1 bf16
    assert residual_fused_fits(15, 256, 256, 1024, 192, 128, 2, 2)  # enc5_1 bf16 w192
    assert not residual_fused_fits(15, 256, 256, 1024, 2304, 128, 4, 4)  # enc5_1 fp32 static


@pytest.mark.slow
def test_strided_block_model_wiring():
    """ResidualBlock(strided, banded, kernel='pallas') == kernel='xla'
    banded path — checks the mp_feats plumbing through KPConv and the
    shortcut substitution, not just the op."""
    from cofii2p_tpu.models.kpconv import ResidualBlock

    fm, fa, w, q, s = _setup(cin=16, cmid=8)
    del fa, w
    kw = dict(
        in_channels=16, out_channels=16, kernel_size=K, radius=RADIUS,
        sigma=SIGMA, strided=True, impl="banded", tile=TILE, band_width=BW,
        group_norm=4, residual_fused=True,
    )
    blk_p = ResidualBlock(kernel="pallas", **kw)
    blk_x = ResidualBlock(kernel="xla", **kw)
    params = blk_p.init(jax.random.PRNGKey(0), fm, q, s)
    out_p = blk_p.apply(params, fm, q, s)
    out_x = blk_x.apply(params, fm, q, s)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )
