"""Per-level kernel-only A/B: fused residual band pass vs the unfused
aggregation + maxpool pair (real TPU, chained-scan stream timing).

The pipeline A/B (tools/resfuse_ab) measured the fusion SLOWER in context
(+22 ms/batch at w192 serving) — this tool localizes the regression per
strided level.  Each arm scans ITERS data-dependent applications inside one
jit (iteration i's features depend on i-1's outputs, so XLA cannot overlap
or CSE the chain), subtracting nothing: the per-iteration delta between
arms is the per-application delta.

Usage: python -m tools.resfuse_micro [--dtype bfloat16] [--iters 8]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops import residual_kernel as rk
    from cofii2p_tpu.ops.banded import dynamic_band_starts, kernel_reach
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.ops.pyramid import morton_order
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--levels", default="0,1,2,3")
    ap.add_argument("--variant", default="scratch",
                    help="residual_kernel._VARIANT: 'scratch' | 'recompute'")
    ap.add_argument("--arms", default="pair,fused")
    args = ap.parse_args()
    rk_variant = args.variant

    cfg = KITTIConfig(compute_dtype=args.dtype)
    sizes = cfg.pyramid_sizes
    rng = np.random.default_rng(0)
    fdt = jnp.dtype(args.dtype)
    b = args.batch

    cases = {
        0: (128, None),
        1: (256, 192),
        2: (512, 192),
        3: (1024, 192),
    }
    for lvl in [int(x) for x in args.levels.split(",")]:
        cin, w = cases[lvl]
        n, m = sizes[lvl], sizes[lvl + 1]
        cmid = cin // 4
        radius = cfg.init_radius * 2**lvl
        sigma = cfg.init_sigma * 2**lvl
        pts = np.concatenate(
            [rng.uniform(0, 60, (n, 2)), rng.uniform(0, 4, (n, 1))], 1
        ).astype(np.float32)
        pts = pts[np.asarray(morton_order(jnp.asarray(pts)))]
        s = jnp.asarray(
            np.stack([pts + 0.01 * i for i in range(b)]).astype(np.float32)
        )
        q = s[:, : 2 * m : 2, :]
        fm0 = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32)).astype(fdt)
        fa0 = jnp.asarray(rng.normal(size=(b, n, cmid)).astype(np.float32)).astype(fdt)
        wts = jnp.asarray(
            (rng.normal(size=(15, cmid, cmid)) / np.sqrt(15 * cmid)).astype(np.float32)
        )
        band = w if w else cfg.kpconv_band_plan[lvl]
        if w:
            r_act = kernel_reach(radius, sigma, 15)
            starts = jax.vmap(
                lambda qq, ss: dynamic_band_starts(qq, ss, r_act, 128, w, "best")
            )(q, s)
        else:
            starts = None

        def chain(step_fn):
            @jax.jit
            def run(fm, fa, st):
                def body(carry, _):
                    fm_c, fa_c = carry
                    out, mp = step_fn(fm_c, fa_c, st)
                    # data dependence: tiny, O(B) reduction feeding the next
                    # iteration's features
                    eps = (jnp.mean(out) + jnp.mean(mp.astype(jnp.float32))) * 1e-12
                    return (fm_c + eps.astype(fm_c.dtype),
                            fa_c + eps.astype(fa_c.dtype)), None

                (fm_f, fa_f), _ = jax.lax.scan(
                    body, (fm, fa), None, length=args.iters
                )
                return jnp.sum(fm_f[..., 0]) + jnp.sum(fa_f[..., 0])

            return run

        def step_pair(fm_c, fa_c, st):
            out, _ = banded_kpconv_fused_pallas(
                fa_c, q, s, wts, radius, sigma, 15, 128, band, fdt, st
            )
            mp = banded_maxpool_pallas(
                fm_c, q, s, kernel_reach(radius, sigma, 15), 128, band, True, st
            )
            return out, mp

        def step_fused(fm_c, fa_c, st):
            out, _, mp = rk.banded_residual_fused_pallas(
                fm_c, fa_c, wts, q, s, radius, sigma, 15, 128, band, fdt,
                True, st
            )
            return out, mp

        arms = {"pair": step_pair, "fused": step_fused}
        for name in args.arms.split(","):
            fn = arms[name]
            rk._VARIANT = rk_variant
            run = chain(fn)
            ms = (
                timeit_sync(lambda: run(fm0, fa0, starts), warmup=1,
                            iters=args.reps)
                * 1e3 / args.iters
            )
            print(
                f"lvl{lvl} Cin={cin:4d} band={band:4d} {name:5s}: "
                f"{ms:7.2f} ms/apply (B={b})"
            )


if __name__ == "__main__":
    main()
