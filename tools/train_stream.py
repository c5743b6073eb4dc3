"""Streamed train-step measurement (real TPU): a lax.scan of K full train
steps inside ONE jitted program.

Single-call train-step timings through the tunnel vary ±15% between runs
(PERF.md "Training throughput" caveat) — this tool applies the eval side's
trusted stream discipline to training: the TrainState rides the scan carry
(params/opt/batch_stats update step-over-step, exactly the real training
recurrence), host batches stream from a stacked (K, ...) tensor, and one
scalar readback closes the program.  ms/step = total / K with no dispatch
or readback noise inside.

Usage: python -m tools.train_stream [--steps 8] [--batch 8]
       [--fast]        # the w256 FAST_DYNAMIC_PLAN train --fast applies
       [--dtype float32]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig, with_fast_windows
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    cfg = KITTIConfig(compute_dtype=args.dtype)
    if args.fast:
        cfg = with_fast_windows(cfg)
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)

    ds = SyntheticDataset(cfg, "train", length=args.batch * args.steps)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(args.steps)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *batches)
    )
    host0 = jax.device_put(batches[0])
    state0 = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host0)
    rngs = jax.random.split(jax.random.PRNGKey(3), args.steps)

    # the inner step body, untraced by make_train_step's own jit wrapper
    step_fn = train_lib.make_train_step(cfg, model, tx).__wrapped__

    @jax.jit
    def run(state, stream, rr):
        def body(st, xs):
            hb, r = xs
            new_st, metrics = step_fn(st, hb, r)
            return new_st, metrics["loss"]

        final, losses = jax.lax.scan(body, state, (stream, rr))
        return losses[-1] + 0.0 * jnp.sum(final.params["pc_encoder"]
                                          ["encoder1_1"]["KPConv"]["weights"])

    def call():
        return run(state0, stream_host, rngs)

    ms = timeit_sync(call, warmup=1, iters=args.iters) * 1e3 / args.steps
    plan = "w256 fast windows" if args.fast else "static bands"
    print(
        f"streamed train step ({plan}, {args.dtype}, B={args.batch}, "
        f"scan of {args.steps}): {ms:.1f} ms/step "
        f"({args.batch / ms * 1e3:.1f} fps)"
    )


if __name__ == "__main__":
    main()
