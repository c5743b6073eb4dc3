"""Full-eval-pipeline A/B of the dynamic band-window plan (real TPU).

bench.py with the round-3 dynamic plan moved 43.996 -> 44.18 fps while the
standalone kernel A/Bs (tools/dyn_mp_ab) showed 2x on the deep strided
maxpools — this tool isolates why, using the trusted stream method from the
round-2 correction (a lax.scan of CHUNK full eval bodies inside ONE jitted
program; no per-batch dispatch anything).

Configs:
  static    — the shipped static band plan
  dynamic   — the round-3 plan (cross 0,1024,1280,1024,0 / self 0,0,1280,1280,0)
  narrow    — an aggressive w=256 plan on every deep support: NOT an accuracy
              candidate, purely an engagement canary.  If even this does not
              move the stream time, the plan is not reaching the kernels (or
              the maxpool is off the critical path entirely).

Usage: python -m tools.dyn_pipeline_ab [--batch 8] [--chunk 4] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse

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

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--plans", default="static,dynamic,narrow",
                    help="comma-separated plan names from the table")
    ap.add_argument("--tile", type=int, default=0,
                    help="override cfg.kpconv_tile (0 = keep default)")
    ap.add_argument("--knn", action="store_true",
                    help="time kNN window plans (kpconv_knn_window_plan) on "
                    "the .t7-style config instead of radius dynamic plans; "
                    "plan names knnstatic,knn640,knn512,knn384,knn256")
    args = ap.parse_args()

    plans = {
        "static": (None, None),
        "dynamic": ((0, 1024, 1280, 1024, 0), (0, 0, 1280, 1280, 0)),
        "narrow": ((0, 256, 256, 256, 0), (0, 0, 256, 256, 0)),
        # round-4 serving default (the w192 cross/self windows)
        "serve": ((0, 192, 192, 192, 0), (0, 0, 192, 192, 0)),
        # round-5 shallow/self coverage canaries: the serving plan leaves
        # support-lvl0 cross (enc2_1, static band 512), self lvl0/1
        # (enc1_*, enc2_2/3: bands 384/640) and self lvl4 (enc5_2/3: the
        # WHOLE 1280-point level) on static bands — these measure the
        # remaining scanned-width headroom before any accuracy gating
        "c0w256": ((256, 192, 192, 192, 0), (0, 0, 192, 192, 0)),
        "s4w256": ((0, 192, 192, 192, 0), (0, 0, 192, 192, 256)),
        "selfw256": ((0, 192, 192, 192, 0), (256, 256, 192, 192, 256)),
        "all256": ((256, 256, 256, 256, 0), (256, 256, 256, 256, 256)),
        "all192": ((192, 192, 192, 192, 0), (192, 192, 192, 192, 192)),
    }
    knn_plans = {
        "knnstatic": None,
        "knn640": (640, 640, 640, 640, 640),
        "knn512": (512, 512, 512, 512, 512),
        "knn384": (384, 384, 384, 384, 384),
        "knn256": (256, 256, 256, 256, 256),
        "knn192": (192, 192, 192, 192, 192),
        # graded: narrow where the top_k cost lives (shallow), wider/off at
        # the deep levels where the 128-NN span most of the level
        "knngrade": (256, 256, 384, 640, 0),
        "knngrade2": (384, 384, 512, 0, 0),
    }
    if args.knn:
        if args.plans == "static,dynamic,narrow":
            args.plans = "knnstatic,knn512,knn256"
        plans = {k: knn_plans[k] for k in args.plans.split(",")}
    else:
        plans = {k: plans[k] for k in args.plans.split(",")}

    base = KITTIConfig(compute_dtype=args.dtype)
    if args.tile:
        base = base.replace(kpconv_tile=args.tile)
    if args.knn:
        base = base.replace(
            kpconv_impl="banded_knn",
            kpconv_shared_influence=False,
            fine_decode="reference",
        )
    ds = SyntheticDataset(base, "val", length=args.batch * args.chunk)
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

    for name, spec in plans.items():
        if args.knn:
            cfg = base.replace(kpconv_knn_window_plan=spec)
        else:
            plan, plan_self = spec
            cfg = base.replace(
                kpconv_dynamic_plan=plan,
                kpconv_dynamic_plan_self=plan_self,
            )
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
