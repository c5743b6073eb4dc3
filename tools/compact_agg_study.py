"""Compacted-aggregation study (run on real TPU).

The banded aggregation kernels compute influence for every (query, band
row) pair — O(tile * band * K) VPU work per conv — though only <=~k rows
are within kernel reach at the deep levels.  ops/banded.
banded_compact_aggregate instead SELECTS the <=k nearest band rows per
query (lax.top_k over the banded d2), GATHERS them, and aggregates over
the compacted (tile, k) neighborhood.

This tool times, per FPN conv shape (B=8 KITTI scale, contraction
included on both sides):
  A: shipped dispatch — fused Pallas kernel where it fits, else unfused
     Pallas + XLA contraction (what models.kpconv.KPConv ships)
  C: compacted top-k aggregation (radius semantics, k) + XLA contraction
and reports the fraction of queries whose in-reach count exceeds k (the
rows where C deviates from A by design) plus the agreement elsewhere.

Usage: python -m tools.compact_agg_study [--batch 8] [--inner 4] [--k 128]
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
        banded_compact_aggregate,
        kernel_reach,
    )
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_pallas,
        banded_kpconv_fused_pallas,
        fused_contraction_fits,
    )
    from cofii2p_tpu.ops.pyramid import morton_order
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--approx", action="store_true",
                    help="approx_max_k selection instead of top_k")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    plan = cfg.kpconv_band_plan
    tile = cfg.kpconv_tile
    k = args.k
    ks = cfg.kernel_size

    # KPConv shapes inside the FPN (mid channels of each residual stage):
    # (name, m, n, cin=cout, support_level)
    shapes = [
        ("enc1_2", 20480, 20480, 32, 0),
        ("enc2_1s", 10240, 20480, 64, 0),
        ("enc2_2", 10240, 10240, 64, 1),
        ("enc3_1s", 5120, 10240, 128, 1),
        ("enc3_2", 5120, 5120, 128, 2),
        ("enc4_1s", 2560, 5120, 256, 2),
        ("enc4_2", 2560, 2560, 256, 3),
        ("enc5_1s", 1280, 2560, 512, 3),
        ("enc5_2", 1280, 1280, 512, 4),
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
        pts_np = make_level(n)
        s_pts = jnp.asarray(np.stack([pts_np] * b))
        q_pts = s_pts[:, :: n // m, :][:, :m]
        feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        weights = jnp.asarray(
            (rng.randn(ks, c, c) / np.sqrt(c * ks)).astype(np.float32)
        )
        fused = fused_contraction_fits(ks, c, c, tile)

        def shipped(fe, qq, ss):
            if fused:
                out, cnt = banded_kpconv_fused_pallas(
                    fe, qq, ss, weights, r, s, ks, tile, band
                )
            else:
                w, cnt = banded_kpconv_aggregate_pallas(
                    fe, qq, ss, r, s, ks, tile, band
                )
                out = jnp.einsum(
                    "bmkc,kcd->bmd", w, weights,
                    preferred_element_type=jnp.float32,
                )
            return out / cnt[..., None].astype(out.dtype)

        def compact(fe, qq, ss):
            w, cnt = jax.vmap(
                lambda f1, q1, s1: banded_compact_aggregate(
                    f1, q1, s1, r, s, ks, k, tile, band, approx=args.approx
                )
            )(fe, qq, ss)
            out = jnp.einsum(
                "bmkc,kcd->bmd", w, weights,
                preferred_element_type=jnp.float32,
            )
            return out / cnt[..., None].astype(out.dtype)

        t_a = timeit_sync(chain(shipped, feats, q_pts, s_pts), iters=args.iters) / args.inner
        t_c = timeit_sync(chain(compact, feats, q_pts, s_pts), iters=args.iters) / args.inner

        # overflow fraction + agreement on non-overflow rows (sample 0)
        out_a = np.asarray(jax.jit(shipped)(feats, q_pts, s_pts))[0]
        out_c = np.asarray(jax.jit(compact)(feats, q_pts, s_pts))[0]
        r_act = float(kernel_reach(r, s, ks))
        d2 = (
            (np.asarray(q_pts[0])[:, None] - np.asarray(s_pts[0])[None]) ** 2
        ).sum(-1)
        cnt = (d2 <= r_act * r_act).sum(-1)
        over = cnt > k
        ok = ~over
        scale = np.abs(out_a).max() + 1e-9
        agree = (
            float(np.abs(out_c[ok] - out_a[ok]).max() / scale) if ok.any() else 0.0
        )
        print(
            f"{name:8s} m{m:6d} n{n:6d} C{c:5d} band{band:5d} "
            f"{'fused' if fused else 'unfus'}: "
            f"pallas {t_a*1e3:7.2f} ms  compact {t_c*1e3:7.2f}"
            f"  (count>k {over.mean()*100:5.2f}%, rel agree<=k {agree:.1e})"
        )


if __name__ == "__main__":
    main()
