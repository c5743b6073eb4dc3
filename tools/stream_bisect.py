"""Stream-method cost bisection of the FULL eval pipeline (real TPU).

tools/fpn_bisect chains applications inside one jit — the method the
round-2 correction showed can overstate components (XLA overlaps/CSEs the
chain).  This tool instead times a lax.scan of CHUNK independent eval
bodies inside ONE jitted program (the method whose total was verified
three ways, PERF.md round-2 correction) with selected pieces stubbed, so
each piece's share is a delta between two *trusted* totals.

Run with the bench config (bf16) by default — shares measured in fp32 do
not transfer (the select chain runs in the feature dtype).

Usage: python -m tools.stream_bisect [--batch 8] [--chunk 4]
       [--dtype bfloat16] [--variants full,mp,agg,near,gn,kernels,all]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_body
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync
    import cofii2p_tpu.models.kpconv as kpconv_mod
    import cofii2p_tpu.models.layers as layers_mod
    import cofii2p_tpu.ops.kpconv_kernel as agg_mod
    import cofii2p_tpu.ops.maxpool_kernel as mp_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--variants", default="full,mp,agg,near,gn,kernels,all"
    )
    ap.add_argument(
        "--plan", default="static",
        help="'static' (the parity bands) or 'serve' (the bench serving "
        "plan, config.SERVE_DYNAMIC_PLAN) — measure stage shares under "
        "the narrow windows",
    )
    args = ap.parse_args()

    cfg = KITTIConfig(compute_dtype=args.dtype)
    if args.plan == "serve":
        from cofii2p_tpu.config import (
            SERVE_DYNAMIC_PLAN, SERVE_DYNAMIC_PLAN_SELF,
        )

        cfg = cfg.replace(
            kpconv_dynamic_plan=SERVE_DYNAMIC_PLAN,
            kpconv_dynamic_plan_self=SERVE_DYNAMIC_PLAN_SELF,
        )
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=args.batch * args.chunk)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(args.chunk)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *batches)
    )
    host0 = jax.device_put(batches[0])
    rngs = jax.random.split(jax.random.PRNGKey(0), args.chunk)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host0)

    real_agg = agg_mod.banded_kpconv_aggregate_pallas
    real_fused = agg_mod.banded_kpconv_fused_pallas
    real_mp = mp_mod.banded_maxpool_pallas
    real_near = kpconv_mod.banded_nearest_index
    real_gn = layers_mod._gn_normalize

    def stub_agg(s_feats, q_points, s_points, radius, sigma, kernel_size=15,
                 tile=128, band_width=1024, dtype=jnp.float32, starts=None):
        bq, m = q_points.shape[:2]
        c = s_feats.shape[-1]
        w = jnp.zeros((bq, m, kernel_size, c), jnp.float32)
        w = w + jnp.mean(s_feats, axis=1)[:, None, None, :].astype(jnp.float32)
        return w, jnp.ones((bq, m), jnp.int32)

    def stub_fused(s_feats, q_points, s_points, weights, radius, sigma,
                   kernel_size=15, tile=128, band_width=1024,
                   dtype=jnp.float32, starts=None):
        bq, m = q_points.shape[:2]
        out = jnp.zeros((bq, m, weights.shape[-1]), jnp.float32)
        out = out + jnp.mean(s_feats, axis=1)[:, None, :1].astype(jnp.float32)
        return out, jnp.ones((bq, m), jnp.int32)

    def stub_mp(s_feats, q_points, s_points, r_active, tile=128,
                band_width=1024, tie_even=True, starts=None):
        step = s_feats.shape[1] // q_points.shape[1]
        return s_feats[:, ::step]

    def stub_near(q_points, s_points, tile=128, band_width=1024):
        m, n = q_points.shape[0], s_points.shape[0]
        return (jnp.arange(m, dtype=jnp.int32) * n) // m

    def stub_gn(x, g, eps):
        return x.astype(jnp.float32)

    def set_stubs(agg=False, mp=False, near=False, gn=False):
        agg_mod.banded_kpconv_aggregate_pallas = stub_agg if agg else real_agg
        agg_mod.banded_kpconv_fused_pallas = stub_fused if agg else real_fused
        kpconv_mod.banded_nearest_index = stub_near if near else real_near
        mp_mod.banded_maxpool_pallas = stub_mp if mp else real_mp
        layers_mod._gn_normalize = stub_gn if gn else real_gn

    variants = {
        "full": {},
        "mp": dict(mp=True),
        "agg": dict(agg=True),
        "near": dict(near=True),
        "gn": dict(gn=True),
        "kernels": dict(mp=True, agg=True),
        "all": dict(mp=True, agg=True, near=True, gn=True),
    }
    want = args.variants.split(",")

    results = {}
    try:
        for name in want:
            set_stubs(**variants[name])
            body = make_eval_body(cfg, model)

            @jax.jit
            def run(params, batch_stats, stream, rr, body=body):
                def step(carry, xs):
                    b_k, r_k = xs
                    out = body(params, batch_stats, b_k, r_k)
                    return carry + jnp.sum(out.t), None

                total, _ = jax.lax.scan(
                    step, jnp.zeros((), jnp.float32), (stream, rr)
                )
                return total

            def call(run=run):
                return run(state.params, state.batch_stats, stream_host, rngs)

            ms = timeit_sync(call, warmup=2, iters=args.iters) * 1e3 / args.chunk
            results[name] = round(ms, 2)
            extra = ""
            if name != "full" and "full" in results:
                extra = f"  (share {results['full'] - ms:+.2f} ms)"
            print(f"{name:8s}: {ms:8.2f} ms/batch{extra}")
    finally:
        set_stubs()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
