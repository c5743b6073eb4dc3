"""One-shot TPU validation of the direct-indexed (scalar-prefetch) chunked
kernels against the XLA banded twins at a deep-level shape (band >= 1024
triggers the direct path; CPU interpret tests can only force it via hooks).

Run on TPU: python -m tools.direct_check
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.ops.banded import (
        banded_kpconv_aggregate,
        banded_knn_tau,
        banded_maxpool,
    )
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_pallas,
        banded_kpconv_aggregate_tau_pallas,
        banded_kpconv_fused_pallas,
        banded_kpconv_fused_tau_pallas,
    )
    from cofii2p_tpu.ops.maxpool_kernel import (
        banded_maxpool_pallas,
        banded_maxpool_tau_pallas,
    )
    from cofii2p_tpu.models.kernel_points import load_kernel_points

    assert jax.devices()[0].platform == "tpu", jax.devices()

    rng = np.random.default_rng(0)
    b, m, n, c = 2, 1280, 2560, 128
    band, tile = 1024, 128
    radius, sigma, ks = 4.8, 3.6, 15

    pts_s = jnp.asarray(
        np.sort(rng.normal(size=(b, n, 3)).astype(np.float32) * 20.0, axis=1)
    )
    pts_q = pts_s[:, ::2, :]
    feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    kw = dict(radius=radius, sigma=sigma, kernel_size=ks, tile=tile,
              band_width=band)

    # aggregation (radius)
    w_pl, cnt_pl = banded_kpconv_aggregate_pallas(feats, pts_q, pts_s, **kw)
    w_xla, cnt_xla = jax.vmap(
        lambda f, q, s: banded_kpconv_aggregate(f, q, s, **kw)
    )(feats, pts_q, pts_s)
    dw = np.abs(np.asarray(w_pl) - np.asarray(w_xla)).max()
    rel = dw / max(np.abs(np.asarray(w_xla)).max(), 1e-9)
    dc = np.abs(np.asarray(cnt_pl) - np.asarray(cnt_xla)).max()
    print(f"agg:      max abs {dw:.2e}  rel {rel:.2e}  cnt diff {dc}")
    assert rel < 2e-3 and dc == 0

    # fused contraction
    weights = jnp.asarray(rng.normal(size=(ks, c, 64)).astype(np.float32) * 0.1)
    out_f, cnt_f = banded_kpconv_fused_pallas(feats, pts_q, pts_s, weights, **kw)
    out_ref = jnp.einsum("bmkc,kcd->bmd", w_xla, weights)
    df = np.abs(np.asarray(out_f) - np.asarray(out_ref)).max()
    relf = df / max(np.abs(np.asarray(out_ref)).max(), 1e-9)
    dcf = np.abs(np.asarray(cnt_f) - np.asarray(cnt_xla)).max()
    print(f"fused:    max abs {df:.2e}  rel {relf:.2e}  cnt diff {dcf}")
    assert relf < 2e-3 and dcf == 0

    # tau variants (banded_knn semantics)
    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=32, tile=tile, band_width=band)
    )(pts_q, pts_s)
    kp = load_kernel_points(radius, ks)
    w_t, c_t = banded_kpconv_aggregate_tau_pallas(
        feats, pts_q, pts_s, tau, kp, **kw
    )
    w_xt, c_xt = jax.vmap(
        lambda f, q, s, t: banded_kpconv_aggregate(f, q, s, tau=t, kp=kp, **kw)
    )(feats, pts_q, pts_s, tau)
    dt = np.abs(np.asarray(w_t) - np.asarray(w_xt)).max()
    relt = dt / max(np.abs(np.asarray(w_xt)).max(), 1e-9)
    dct = np.abs(np.asarray(c_t) - np.asarray(c_xt)).max()
    print(f"tau agg:  max abs {dt:.2e}  rel {relt:.2e}  cnt diff {dct}")
    assert relt < 2e-3 and dct == 0

    out_ft, c_ft = banded_kpconv_fused_tau_pallas(
        feats, pts_q, pts_s, weights, tau, kp, **kw
    )
    out_reft = jnp.einsum("bmkc,kcd->bmd", w_xt, weights)
    dft = np.abs(np.asarray(out_ft) - np.asarray(out_reft)).max()
    relft = dft / max(np.abs(np.asarray(out_reft)).max(), 1e-9)
    print(f"tau fus:  max abs {dft:.2e}  rel {relft:.2e}  "
          f"cnt diff {np.abs(np.asarray(c_ft) - np.asarray(c_xt)).max()}")
    assert relft < 2e-3

    # maxpool (radius) — bit-exact contract
    mp_pl = banded_maxpool_pallas(feats, pts_q, pts_s, radius, tile, band)
    mp_xla = jax.vmap(
        lambda f, q, s: banded_maxpool(f, q, s, radius, tile, band)
    )(feats, pts_q, pts_s)
    dmp = np.abs(np.asarray(mp_pl) - np.asarray(mp_xla)).max()
    print(f"maxpool:  max abs {dmp}")
    assert dmp == 0.0

    # maxpool (tau) — bit-exact contract
    mpt_pl = banded_maxpool_tau_pallas(feats, pts_q, pts_s, tau, tile, band)
    mpt_xla = jax.vmap(
        lambda f, q, s, t: banded_maxpool(f, q, s, 0.0, tile, band, tau=t)
    )(feats, pts_q, pts_s, tau)
    dmpt = np.abs(np.asarray(mpt_pl) - np.asarray(mpt_xla)).max()
    print(f"maxpool tau: max abs {dmpt}")
    assert dmpt == 0.0

    print("direct-indexed chunked kernels: ALL OK on TPU")


if __name__ == "__main__":
    main()
