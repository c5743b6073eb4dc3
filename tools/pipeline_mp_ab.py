"""Full-pipeline A/B of the compacted kernel formulations (TPU).

Times the scan-streamed eval pipeline (same formulation as bench.py) under
the default full-band kernels vs compacted-top-k plans (maxpool and/or
KPConv aggregation), same everything else.

Usage: python -m tools.pipeline_mp_ab [--plan 0,0,128,128]
         [--agg-plan 0,0,128,128] [--dtype bfloat16] [--train]
  plan:     per-support-level maxpool ks, 0 = keep the select kernel.
  agg-plan: per-support-level aggregation ks, 0 = keep the Pallas kernel.
"""

from __future__ import annotations

import argparse
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_body
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", default="0,0,128,128")
    ap.add_argument("--agg-plan", default=None,
                    help="aggregate_compact_plan; omit to keep the kernel")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--train", action="store_true",
                    help="time the fused train step instead of eval")
    args = ap.parse_args()

    plan = tuple(int(x) for x in args.plan.split(","))
    batch, chunk = args.batch, args.chunk

    def measure_train(cfg, label):
        from cofii2p_tpu.utils.profiling import timeit_sync

        model = CoFiI2P(cfg)
        ds = SyntheticDataset(cfg, "train", length=batch)
        host = _collate([ds[i] for i in range(batch)])
        host.pop("index", None)
        host = jax.device_put(host)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host
        )
        step = train_lib.make_train_step(cfg, model, tx)

        holder = {"state": state}

        def one():
            s2, m = step(holder["state"], host, jax.random.PRNGKey(1))
            holder["state"] = s2
            return m["loss"]

        # single-call train timings vary ±15% run to run (CLAUDE.md);
        # time two separated rounds and report both so a spread that
        # swamps the A/B delta is visible in the log
        dt1 = timeit_sync(one, iters=8)
        dt2 = timeit_sync(one, iters=8)
        print(
            f"{label}: {dt1*1e3:.1f} / {dt2*1e3:.1f} ms/step "
            f"({batch/min(dt1, dt2):.2f} frames/s best)"
        )
        return 1.0 / min(dt1, dt2)

    def measure(cfg, label):
        model = CoFiI2P(cfg)
        ds = SyntheticDataset(cfg, "val", length=batch * chunk)
        batches = [
            _collate([ds[k * batch + i] for i in range(batch)])
            for k in range(chunk)
        ]
        for hb in batches:
            hb.pop("index", None)
        stream = jax.device_put(jax.tree.map(lambda *xs: np.stack(xs), *batches))
        host0 = jax.device_put(batches[0])
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host0
        )
        body = make_eval_body(cfg, model)

        @jax.jit
        def run_stream(params, batch_stats, stream, rngs):
            def step(carry, xs):
                batch_k, rng_k = xs
                out = body(params, batch_stats, batch_k, rng_k)
                return carry + jnp.sum(out.t), out.success

            total, outs = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), (stream, rngs)
            )
            return total, outs

        rngs0 = jax.random.split(jax.random.PRNGKey(0), chunk)
        float(jax.device_get(
            run_stream(state.params, state.batch_stats, stream, rngs0)[0]
        ))
        float(jax.device_get(
            run_stream(state.params, state.batch_stats, stream, rngs0)[0]
        ))
        t0 = time.perf_counter()
        res = None
        for s in range(args.streams):
            rngs = jax.random.split(jax.random.PRNGKey(s + 1), chunk)
            res = run_stream(state.params, state.batch_stats, stream, rngs)
        float(jax.device_get(res[0]))
        dt = time.perf_counter() - t0
        fps = args.streams * chunk * batch / dt
        print(f"{label}: {fps:.2f} frames/s  ({dt / (args.streams * chunk) * 1e3:.1f} ms/batch)")
        return fps

    meas = measure_train if args.train else measure
    base = KITTIConfig(compute_dtype=args.dtype)
    fps_a = meas(base, "select ")
    agg_plan = (
        tuple(int(x) for x in args.agg_plan.split(","))
        if args.agg_plan else None
    )
    comp = KITTIConfig(
        compute_dtype=args.dtype,
        maxpool_compact_plan=plan,
        aggregate_compact_plan=agg_plan,
    )
    fps_b = meas(comp, f"compact mp={plan} agg={agg_plan}")
    print(f"speedup x{fps_b / fps_a:.3f}")


if __name__ == "__main__":
    main()
