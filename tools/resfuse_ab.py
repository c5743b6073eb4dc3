"""A/B of the fused strided-ResidualBlock band pass (real TPU).

Round-5 brief #1: the strided blocks' shortcut maxpool and conv aggregation
share geometry/membership and paid the band DMA + d2 twice
(ops/residual_kernel.py fuses them).  This tool measures the fusion in
context with the trusted stream method (lax.scan of CHUNK eval bodies in
ONE jitted program) under the w192 serving plan, and checks op-level
correctness at the real strided shapes.

Arms:
  fused    — cfg.kpconv_residual_fused=True (ResidualBlock requests the
             fused band pass)
  unfused  — the default config: separate aggregation + maxpool kernels
             (the round-4 serving configuration)

Result (round 5, recorded in PERF.md): the fusion measured a wash at best
('recompute' body) and a regression with the scratch-mediated body —
kpconv_residual_fused stays OFF by default.

Usage: python -m tools.resfuse_ab [--batch 8] [--chunk 4] [--dtype bfloat16]
       python -m tools.resfuse_ab --check   # op-level correctness only
"""

from __future__ import annotations

import argparse

import numpy as np


def check_shapes(dtype):
    """Fused vs unfused op outputs at the four strided KITTI shapes."""
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops import residual_kernel as rk
    from cofii2p_tpu.ops.banded import dynamic_band_starts, kernel_reach
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_fused_pallas
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.ops.pyramid import morton_order

    cfg = KITTIConfig(compute_dtype=dtype)
    sizes = cfg.pyramid_sizes
    rng = np.random.default_rng(0)
    fdt = jnp.dtype(dtype)

    # (support level, Cin, window width or None for static band)
    cases = [
        (0, 128, None),
        (1, 256, 192),
        (2, 512, 192),
        (3, 1024, 192),
    ]
    for lvl, cin, w in cases:
        n, m = sizes[lvl], sizes[lvl + 1]
        cmid = cin // 4
        radius = cfg.init_radius * 2**lvl
        sigma = cfg.init_sigma * 2**lvl
        pts = np.concatenate(
            [rng.uniform(0, 60, (n, 2)), rng.uniform(0, 4, (n, 1))], 1
        ).astype(np.float32)
        pts = pts[np.asarray(morton_order(jnp.asarray(pts)))]
        s = jnp.asarray(np.stack([pts, pts + 0.01]))
        q = s[:, : 2 * m : 2, :]
        fm = jnp.asarray(rng.normal(size=(2, n, cin)).astype(np.float32)).astype(fdt)
        fa = jnp.asarray(rng.normal(size=(2, n, cmid)).astype(np.float32)).astype(fdt)
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

        agg_f, cnt_f, mp_f = jax.jit(
            lambda fm, fa, wts, q, s, st: rk.banded_residual_fused_pallas(
                fm, fa, wts, q, s, radius, sigma, 15, 128, band, fdt, True, st
            )
        )(fm, fa, wts, q, s, starts)
        agg_u, cnt_u = jax.jit(
            lambda fa, q, s, wts, st: banded_kpconv_fused_pallas(
                fa, q, s, wts, radius, sigma, 15, 128, band, fdt, st
            )
        )(fa, q, s, wts, starts)
        mp_u = jax.jit(
            lambda fm, q, s, st: banded_maxpool_pallas(
                fm, q, s, kernel_reach(radius, sigma, 15), 128, band, True, st
            )
        )(fm, q, s, starts)
        scale = float(jnp.abs(agg_u).max())
        print(
            f"lvl{lvl} Cin={cin:4d} band={band:4d}: "
            f"agg rel {float(jnp.abs(agg_f - agg_u).max()) / scale:.2e}  "
            f"cnt diff {int(jnp.abs(cnt_f - cnt_u).max())}  "
            f"mp abs {float(jnp.abs(mp_f.astype(jnp.float32) - mp_u.astype(jnp.float32)).max()):.2e}"
        )


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import (
        KITTIConfig, SERVE_DYNAMIC_PLAN, SERVE_DYNAMIC_PLAN_SELF,
    )
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_body
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--static", action="store_true",
                    help="A/B under static bands instead of the serving plan")
    args = ap.parse_args()

    if args.check:
        check_shapes(args.dtype)
        return

    base = KITTIConfig(
        compute_dtype=args.dtype,
        kpconv_dynamic_plan=None if args.static else SERVE_DYNAMIC_PLAN,
        kpconv_dynamic_plan_self=None if args.static else SERVE_DYNAMIC_PLAN_SELF,
    )
    ds = SyntheticDataset(base, "val", length=args.batch * args.chunk)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(args.chunk)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(jax.tree.map(lambda *xs: np.stack(xs), *batches))
    host0 = jax.device_put(batches[0])
    rngs = jax.random.split(jax.random.PRNGKey(0), args.chunk)

    for name in ("unfused", "fused"):
        cfg = base.replace(kpconv_residual_fused=(name == "fused"))
        model = CoFiI2P(cfg)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host0
        )
        body = make_eval_body(cfg, model)

        @jax.jit
        def run(params, batch_stats, stream, rr):
            def step(carry, xs):
                b_k, r_k = xs
                out = body(params, batch_stats, b_k, r_k)
                return carry + jnp.sum(out.t), None

            total, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), (stream, rr)
            )
            return total

        def call(run=run, state=state):
            return run(state.params, state.batch_stats, stream_host, rngs)

        ms = timeit_sync(call, warmup=2, iters=args.iters) * 1e3 / args.chunk
        print(f"{name:8s}: {ms:8.2f} ms/batch  ({args.batch / ms * 1e3:.1f} fps)")


if __name__ == "__main__":
    main()
