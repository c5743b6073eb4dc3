"""Fused train-step A/B of the dynamic band windows (real TPU).

The round-4 forward-geometry backward makes kpconv_dynamic_plan legal in
training; this times the full fused train step (prep + forward + losses +
backward + Adam) at KITTI scale under the static band plan vs candidate
dynamic plans, and (``--tie``) the tie_even count-pass cost (ADVICE r3 #4).

Single-call train-step timings vary +-15% through the tunnel (PERF.md), so
each config is timed twice and the best is reported, like pipeline_mp_ab.

Usage: python -m tools.dyn_train_ab [--batch 8] [--dtype float32] [--tie]
"""

from __future__ import annotations

import argparse
import json


def main():
    import jax
    import numpy as np

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--tie", action="store_true",
                    help="also A/B tie_even on the static plan")
    ap.add_argument("--plans", default="all",
                    help="comma-separated config names, or 'all'")
    args = ap.parse_args()

    configs = [
        ("static", None, None),
        ("w512", (0, 512, 512, 512, 0), (0, 0, 512, 512, 0)),
        ("w256", (0, 256, 256, 256, 0), (0, 0, 256, 256, 0)),
    ]
    if args.plans != "all":
        want = set(args.plans.split(","))
        configs = [c for c in configs if c[0] in want]

    results = {}

    def measure(cfg, label):
        model = CoFiI2P(cfg)
        ds = SyntheticDataset(cfg, "train", length=args.batch)
        host = _collate([ds[i] for i in range(args.batch)])
        host.pop("index", None)
        host = jax.device_put(host)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host
        )
        step = train_lib.make_train_step(cfg, model, tx)

        holder = {"state": state, "i": 0}

        def call():
            holder["i"] += 1
            st, metrics = step(
                holder["state"], host, jax.random.PRNGKey(holder["i"])
            )
            holder["state"] = st
            return metrics["loss"]

        best = min(
            timeit_sync(call, warmup=2, iters=args.iters) * 1e3
            for _ in range(2)
        )
        loss = float(jax.device_get(call()))
        assert np.isfinite(loss), loss
        results[label] = round(best, 1)
        print(f"{label:12s} {best:8.1f} ms/step  (loss {loss:.3f})",
              flush=True)

    base = KITTIConfig(compute_dtype=args.dtype)
    for name, plan, plan_self in configs:
        measure(
            base.replace(
                kpconv_dynamic_plan=plan, kpconv_dynamic_plan_self=plan_self
            ),
            name,
        )
    if args.tie:
        import cofii2p_tpu.ops.maxpool_kernel as mp

        # tie_even=False via the kw plumbing would need a config field; A/B
        # at the kernel layer instead: patch the default argument.
        real = mp.banded_maxpool_pallas

        def no_tie(s_feats, q_points, s_points, r_active, tile=128,
                   band_width=1024, tie_even=True, starts=None):
            return real(s_feats, q_points, s_points, r_active, tile,
                        band_width, False, starts)

        # the model imports the symbol from the module at call time, so the
        # module-attribute patch reaches it
        mp.banded_maxpool_pallas = no_tie
        try:
            measure(base, "static_notie")
        finally:
            mp.banded_maxpool_pallas = real
    print(json.dumps(results))


if __name__ == "__main__":
    main()
