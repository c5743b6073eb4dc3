"""Accuracy vs dynamic-window width on a trained checkpoint (real TPU).

The round-4 stream bisect + narrow canary showed the eval pipeline's
remaining cost is real select/influence work on in-reach rows — narrowing
the dynamic windows below the in-reach span is the one lever that moves
the pipeline (189 -> 129.6 ms at w=256), and it DROPS out-of-window
neighbors.  This tool measures what that does to registration quality:
a trained (synthetic-protocol) checkpoint is evaluated on the same frames
under each candidate plan, reporting success rate, RRE, RTE, and coarse
top-1 feature recall — the round-2 bf16-validation protocol, applied to
window width.  Also reports the streamed ms/batch of each plan so the
accuracy/speed frontier is one table.

Usage: python -m tools.acc_study <ckpt_dir> [--frames 32] [--batch 8]
       [--dtype bfloat16] [--plans default]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig, TinyConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_body, pose_errors_np
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.checkpoint import restore_checkpoint
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=str, nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--plans", default="all",
                    help="comma-separated plan names, or 'all' (7 plans = 7 "
                         "full eval compiles; w192/w128 joined in round 4, "
                         "so 'all' runs two more passes than it used to)")
    ap.add_argument("--tiny", action="store_true",
                    help="TinyConfig CPU smoke test (random init, no ckpt)")
    ap.add_argument("--hypotheses", default="",
                    help="comma-separated ransac_hypotheses values to sweep "
                    "(each combined with every selected plan; default: the "
                    "config's 512 only) — round-5 brief: 512 was never swept "
                    "at trained quality and RANSAC is 6.1 ms/batch")
    args = ap.parse_args()

    # (name, cross plan, self plan, center) — each config is a full eval
    # compile (5-20 min remote), so the list is the speed/accuracy
    # frontier's corners; add w384/centroid points only if these disagree
    plans = [
        ("static", None, None, "best"),
        ("w512", (0, 512, 512, 512, 0), (0, 0, 512, 512, 0), "best"),
        ("w384", (0, 384, 384, 384, 0), (0, 0, 384, 384, 0), "best"),
        ("w256", (0, 256, 256, 256, 0), (0, 0, 256, 256, 0), "best"),
        ("w256all", (256, 256, 256, 256, 256), (256, 256, 256, 256, 256),
         "best"),
        # below-256 frontier points (round 4 cont.): each drops more
        # out-of-window neighbors; only promotable if the registration
        # metrics hold like w256's did
        ("w192", (0, 192, 192, 192, 0), (0, 0, 192, 192, 0), "best"),
        ("w128", (0, 128, 128, 128, 0), (0, 0, 128, 128, 0), "best"),
    ]
    if args.plans != "all":
        want = set(args.plans.split(","))
        plans = [p for p in plans if p[0] in want]

    if args.tiny:
        base = TinyConfig(compute_dtype=args.dtype)
        # Tiny levels are too small for the KITTI-scale window widths;
        # exercise the dynamic-plan code path with minimal windows.
        plans = [
            ("static", None, None, "best"),
            ("w8", (0, 8, 8, 8, 0), (0, 0, 8, 8, 0), "best"),
        ]
    else:
        # serving-faithful base: the bench config's fused Pallas attention
        # (value-equivalent to 'full'; round-5 serving default)
        base = KITTIConfig(compute_dtype=args.dtype, attention="pallas")
    nb = args.frames // args.batch
    ds = SyntheticDataset(base, "val", length=args.frames)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(nb)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *batches)
    )
    host0 = jax.device_put(batches[0])
    rngs = jax.random.split(jax.random.PRNGKey(7), nb)

    results = {}
    hyp_values = (
        [int(x) for x in args.hypotheses.split(",")] if args.hypotheses
        else [None]
    )
    runs = [
        (name + (f"-h{h}" if h else ""), plan, plan_self, center, h)
        for name, plan, plan_self, center in plans
        for h in hyp_values
    ]
    for name, plan, plan_self, center, hyp in runs:
        cfg = base.replace(
            kpconv_dynamic_plan=plan,
            kpconv_dynamic_plan_self=plan_self,
            kpconv_dynamic_center=center,
        )
        if hyp:
            cfg = cfg.replace(ransac_hypotheses=hyp)
        model = CoFiI2P(cfg)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host0
        )
        if args.ckpt is not None:
            state = restore_checkpoint(args.ckpt, state)
        body = make_eval_body(cfg, model)

        @jax.jit
        def run(params, batch_stats, stream, rr, body=body):
            def step(carry, xs):
                b_k, r_k = xs
                out = body(params, batch_stats, b_k, r_k)
                return carry + jnp.sum(out.t), (
                    out.R, out.t, out.success, out.P_gt
                )

            total, outs = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), (stream, rr)
            )
            return total, outs

        total, (R, t, succ, P_gt) = jax.device_get(
            run(state.params, state.batch_stats, stream_host, rngs)
        )
        R = R.reshape(-1, 3, 3)
        t = t.reshape(-1, 3)
        succ = succ.reshape(-1)
        P_gt = P_gt.reshape(-1, 4, 4)
        rre, rte = [], []
        for i in range(len(R)):
            if not bool(succ[i]):
                continue
            T_pred = np.eye(4)
            T_pred[:3, :3] = R[i]
            T_pred[:3, 3] = t[i]
            t_d, r_d = pose_errors_np(T_pred, np.asarray(P_gt[i], np.float64))
            rre.append(r_d)
            rte.append(t_d)

        ms = timeit_sync(
            lambda: run(state.params, state.batch_stats, stream_host, rngs),
            warmup=1, iters=args.iters,
        ) * 1e3 / nb

        results[name] = {
            "success": f"{int(succ.sum())}/{len(succ)}",
            "rre_deg": round(float(np.mean(rre)), 2) if rre else None,
            "rte_m": round(float(np.mean(rte)), 2) if rte else None,
            "ms_per_batch": round(ms, 1),
            "fps": round(args.batch / ms * 1e3, 1),
        }
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
