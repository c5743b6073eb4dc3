"""A/B harness: save / compare the tau-variant kernel outputs at a chunked
deep-level shape, to prove the direct-indexed path is bit-identical to the
sliced-chunked path it replaces (membership arithmetic per (q, p) pair is
the same; only the HBM layout differs).

Usage:
  python -m tools.tau_ab --save /tmp/tau_old.npz   # on the old tree
  python -m tools.tau_ab --cmp  /tmp/tau_old.npz   # on the new tree
"""

import argparse

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.ops.banded import banded_knn_tau
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_tau_pallas,
    )
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas
    from cofii2p_tpu.models.kernel_points import load_kernel_points

    ap = argparse.ArgumentParser()
    ap.add_argument("--save")
    ap.add_argument("--cmp")
    args = ap.parse_args()

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

    tau = jax.vmap(
        lambda q, s: banded_knn_tau(q, s, k=32, tile=tile, band_width=band)
    )(pts_q, pts_s)
    kp = load_kernel_points(radius, ks)

    w_t, c_t = banded_kpconv_aggregate_tau_pallas(
        feats, pts_q, pts_s, tau, kp, **kw
    )
    mpt = banded_maxpool_tau_pallas(feats, pts_q, pts_s, tau, tile, band)

    w_t, c_t, mpt = np.asarray(w_t), np.asarray(c_t), np.asarray(mpt)
    if args.save:
        np.savez(args.save, w=w_t, c=c_t, mp=mpt)
        print(f"saved {args.save}")
    else:
        old = np.load(args.cmp)
        dw = np.abs(w_t - old["w"]).max()
        dc = np.abs(c_t - old["c"]).max()
        dmp = np.abs(mpt - old["mp"]).max()
        print(f"tau agg:  max abs vs old {dw}")
        print(f"tau cnt:  max abs vs old {dc}")
        print(f"tau mp:   max abs vs old {dmp}")
        assert dw == 0.0 and dc == 0 and dmp == 0.0, "direct != sliced"
        print("direct-indexed tau path is BIT-IDENTICAL to the sliced path")


if __name__ == "__main__":
    main()
