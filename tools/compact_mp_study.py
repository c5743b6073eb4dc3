"""Compacted-maxpool study (run on real TPU).

The banded maxpool's masked select is ops-bound: each 128-query tile
rescans its whole support band (1024 rows at deep levels) though only
<=~128 rows are in reach of any query.  ops/banded.banded_compact_maxpool
instead SELECTS the <=k nearest band rows per query (lax.top_k over the
banded d2), GATHERS them, and maxes — O(m*k*C) instead of O(m*band*C).

This tool times, per strided-shortcut shape (B=8 KITTI scale):
  A: shipped Pallas banded maxpool (radius semantics)
  C: compacted top-k maxpool, radius semantics, k=128
  K: compacted top-k maxpool, kNN semantics (the .t7 banded_knn path)
and reports the fraction of queries whose in-reach count exceeds k (the
rows where radius-C deviates from A by design).

Usage: python -m tools.compact_mp_study [--batch 8] [--inner 4] [--k 128]
"""

from __future__ import annotations

import argparse
import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops.banded import (
        banded_compact_maxpool,
        kernel_reach,
    )
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.ops.pyramid import morton_order
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--approx", action="store_true",
                    help="approx_max_k selection instead of top_k (radius "
                    "variant only; the kNN parity variant stays exact)")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    plan = cfg.kpconv_band_plan
    tile = cfg.kpconv_tile
    k = args.k

    # strided shortcut shapes: (name, m, n, C, support_level)
    shapes = [
        ("enc2_1", 10240, 20480, 128, 0),
        ("enc3_1", 5120, 10240, 256, 1),
        ("enc4_1", 2560, 5120, 512, 2),
        ("enc5_1", 1280, 2560, 1024, 3),
    ]

    rng = np.random.RandomState(0)

    def make_level(n):
        pts = np.concatenate(
            [rng.uniform(-40, 40, (n, 1)), rng.uniform(-2, 2, (n, 1)),
             rng.uniform(0, 80, (n, 1))], 1
        ).astype(np.float32)
        order = np.asarray(morton_order(jnp.asarray(pts), ordering="xz"))
        return pts[order]

    def chain(fn, *arrs):
        def body(acc, _):
            out = fn(arrs[0] + acc * 1e-20, *arrs[1:])
            return acc + jnp.sum(out)

        return jax.jit(
            lambda: functools.reduce(
                body, range(args.inner), jnp.zeros((), jnp.float32)
            )
        )

    for name, m, n, c, lvl in shapes:
        band = int(plan[lvl])
        r = cfg.init_radius * (2 ** lvl)
        s = cfg.init_sigma * (2 ** lvl)
        r_act = float(kernel_reach(r, s, cfg.kernel_size))
        pts_np = make_level(n)
        s_pts = jnp.asarray(np.stack([pts_np] * b))
        q_pts = s_pts[:, :: n // m, :][:, :m]
        feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

        t_a = timeit_sync(
            chain(
                lambda fe, qq, ss: banded_maxpool_pallas(
                    fe, qq, ss, r_act, tile, band
                ),
                feats, q_pts, s_pts,
            ),
            iters=args.iters,
        ) / args.inner

        comp_r = jax.vmap(
            lambda f1, q1, s1: banded_compact_maxpool(
                f1, q1, s1, r_act, k, tile, band, approx=args.approx
            )
        )
        t_c = timeit_sync(
            chain(comp_r, feats, q_pts, s_pts), iters=args.iters
        ) / args.inner

        comp_k = jax.vmap(
            lambda f1, q1, s1: banded_compact_maxpool(
                f1, q1, s1, 0.0, k, tile, band, knn=True
            )
        )
        t_k = timeit_sync(
            chain(comp_k, feats, q_pts, s_pts), iters=args.iters
        ) / args.inner

        # overflow fraction + agreement on non-overflow rows (sample 0)
        out_a = np.asarray(
            jax.jit(
                lambda fe, qq, ss: banded_maxpool_pallas(
                    fe, qq, ss, r_act, tile, band
                )
            )(feats, q_pts, s_pts)
        )[0]
        out_c = np.asarray(jax.jit(comp_r)(feats, q_pts, s_pts))[0]
        d2 = (
            (np.asarray(q_pts[0])[:, None] - np.asarray(s_pts[0])[None]) ** 2
        ).sum(-1)
        cnt = (d2 <= r_act * r_act).sum(-1)
        over = cnt > k
        ok = ~over
        agree = float(np.abs(out_c[ok] - out_a[ok]).max()) if ok.any() else 0.0
        print(
            f"{name:8s} m{m:6d} n{n:6d} C{c:5d} band{band:5d}: "
            f"pallas {t_a*1e3:7.2f} ms  compact-r {t_c*1e3:7.2f}"
            f"  compact-knn {t_k*1e3:7.2f}"
            f"  (count>k {over.mean()*100:5.2f}%, agree<=k {agree:.1e})"
        )


if __name__ == "__main__":
    main()
