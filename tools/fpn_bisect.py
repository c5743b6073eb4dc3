"""In-context FPN cost bisection by stubbing pieces (TPU).

tools/fpn_bench.py times pieces in isolation; the sum falls short of the
FPN's in-context time.  This tool times the real FPN with selected pieces
monkeypatched to near-free stubs, so each piece's *in-context* cost
(including XLA scheduling/fusion effects) is the delta from the full run.

Stubs preserve shapes/dtypes:
  maxpool  -> strided slice of the support features
  agg      -> zeros weighted + ones count (skips band slicing too)
  nearest  -> proportional index map (no distance search)

Usage:  python -m tools.fpn_bisect [--batch 8] [--inner 8]
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
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.models.kpconv import KPConvFPN
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync
    import cofii2p_tpu.models.kpconv as kpconv_mod
    import cofii2p_tpu.models.layers as layers_mod
    import cofii2p_tpu.ops.kpconv_kernel as agg_mod
    import cofii2p_tpu.ops.maxpool_kernel as mp_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--pipeline", action="store_true",
                    help="bisect the full eval body instead of the bare FPN "
                    "(full minus all-stubs = the FPN kernels' in-context "
                    "share of the whole pipeline)")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=b)
    host = _collate([ds[i] for i in range(b)])
    host = {k: v for k, v in host.items() if k != "index"}
    host = jax.device_put(host)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    batch = jax.block_until_ready(
        prepare_samples(
            host["pc"], host["attrs"], host["P"], host["K"],
            jax.random.PRNGKey(0), host["img"], cfg, has_normals=True,
        )
    )

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fpn = KPConvFPN(
        input_dim=cfg.kpconv_input_dim, output_dim=cfg.kpconv_output_dim,
        init_dim=cfg.kpconv_init_dim, kernel_size=cfg.kernel_size,
        init_radius=cfg.init_radius, init_sigma=cfg.init_sigma,
        norm=cfg.norm, group_norm=cfg.group_norm, dtype=dtype,
        impl=cfg.kpconv_impl, tile=cfg.kpconv_tile,
        band_width=cfg.kpconv_band_width, band_plan=cfg.kpconv_band_plan,
        kernel=cfg.kpconv_kernel, dynamic_plan=cfg.kpconv_dynamic_plan,
    )
    fpn_params = {"params": state.params["pc_encoder"]}

    results = {}
    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    print(f"{'dispatch floor':34s} {floor * 1e3:8.2f} ms")

    def chained_ms(name, one, x0):
        def body(i, acc):
            x, s = acc
            return (x + 1e-12 * s, one(x))

        fn = jax.jit(
            lambda x: jax.lax.fori_loop(0, args.inner, body, (x, 0.0))[1]
        )
        dt = timeit_sync(lambda: fn(x0), warmup=2, iters=args.iters)
        ms = max(dt - floor, 0.0) / args.inner * 1e3
        results[name] = round(ms, 2)
        print(f"{name:34s} {ms:8.2f} ms")
        return ms

    def fpn_one(feats):
        outs = fpn.apply(fpn_params, feats, batch["points"])
        return jnp.sum(outs[0].astype(jnp.float32)) * 1e-9

    if args.pipeline:
        from cofii2p_tpu.evaluation.pipeline import make_eval_body

        body = make_eval_body(cfg, model)
        rng0 = jax.random.PRNGKey(0)

        def pipe_one(pc):
            out = body(
                state.params, state.batch_stats, dict(host, pc=pc), rng0
            )
            return (
                jnp.sum(out.t.astype(jnp.float32)) * 1e-9
                + jnp.sum(out.success) * 0.0
            )

    real_agg = agg_mod.banded_kpconv_aggregate_pallas
    real_fused = agg_mod.banded_kpconv_fused_pallas
    real_mp = mp_mod.banded_maxpool_pallas
    real_near = kpconv_mod.banded_nearest_index

    def stub_agg(s_feats, q_points, s_points, radius, sigma, kernel_size=15,
                 tile=128, band_width=1024, dtype=jnp.float32):
        bq, m = q_points.shape[:2]
        c = s_feats.shape[-1]
        w = jnp.zeros((bq, m, kernel_size, c), jnp.float32)
        w = w + jnp.mean(s_feats, axis=1)[:, None, None, :]  # keep data dep
        return w, jnp.ones((bq, m), jnp.int32)

    def stub_fused(s_feats, q_points, s_points, weights, radius, sigma,
                   kernel_size=15, tile=128, band_width=1024,
                   dtype=jnp.float32):
        # most convs (C <= 256) take the fused kernel, not the unfused one —
        # stubbing only banded_kpconv_aggregate_pallas misses them entirely
        bq, m = q_points.shape[:2]
        out = jnp.zeros((bq, m, weights.shape[-1]), jnp.float32)
        out = out + jnp.mean(s_feats, axis=1)[:, None, :1]  # keep data dep
        return out, jnp.ones((bq, m), jnp.int32)

    def stub_mp(s_feats, q_points, s_points, r_active, tile=128, band_width=1024):
        step = s_feats.shape[1] // q_points.shape[1]
        return s_feats[:, ::step]

    def stub_near(q_points, s_points, tile=128, band_width=1024):
        m, n = q_points.shape[0], s_points.shape[0]
        return (jnp.arange(m, dtype=jnp.int32) * n) // m

    real_gn = layers_mod._gn_normalize

    def stub_gn(x, g, eps):
        return x.astype(jnp.float32)  # skip stats; affine+cast stay real

    # the KPConv module imports these inside __call__ — patching the module
    # attributes reaches both the fused and unfused dispatch
    def set_stubs(agg=False, mp=False, near=False, gn=False):
        agg_mod.banded_kpconv_aggregate_pallas = stub_agg if agg else real_agg
        agg_mod.banded_kpconv_fused_pallas = stub_fused if agg else real_fused
        kpconv_mod.banded_nearest_index = stub_near if near else real_near
        mp_mod.banded_maxpool_pallas = stub_mp if mp else real_mp
        layers_mod._gn_normalize = stub_gn if gn else real_gn

    if args.pipeline:
        one, x0, tag = pipe_one, host["pc"], "pipe"
    else:
        one, x0, tag = fpn_one, batch["feats"], "fpn"
    try:
        set_stubs()
        chained_ms(f"{tag} full", one, x0)
        set_stubs(mp=True)
        chained_ms(f"{tag} - maxpool", one, x0)
        set_stubs(agg=True)
        chained_ms(f"{tag} - agg", one, x0)
        set_stubs(near=True)
        chained_ms(f"{tag} - nearest", one, x0)
        set_stubs(gn=True)
        chained_ms(f"{tag} - norms", one, x0)
        set_stubs(agg=True, mp=True, near=True)
        chained_ms(f"{tag} - all three", one, x0)
        set_stubs(agg=True, mp=True, near=True, gn=True)
        chained_ms(f"{tag} - all + norms", one, x0)
    finally:
        set_stubs()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
