"""Stage-wise TPU timing of the inference pipeline for config variants.

Usage:
    python -m tools.perf_stages [key=value ...] [--stages prep,fpn,forward,pipeline]

Examples:
    python -m tools.perf_stages kpconv_impl=banded
    python -m tools.perf_stages kpconv_impl=banded compute_dtype=bfloat16 --batch 8

Times each requested stage with hard-sync readback (utils/profiling.timeit_sync;
block_until_ready is unreliable through the tunneled backend, PERF.md) on
KITTI-scale synthetic frames.  One TPU process at a time — do not run this
concurrently with bench.py or tests on the TPU.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*", default=[])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="prep,forward,pipeline")
    ap.add_argument(
        "--host_inputs", action="store_true",
        help="keep pipeline inputs as host numpy (re-uploaded every call) "
        "instead of pre-staged device arrays",
    )
    args = ap.parse_args()

    from cofii2p_tpu.config import KITTIConfig, apply_overrides
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.evaluation.pipeline import make_eval_pipeline
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync

    cfg = apply_overrides(KITTIConfig(), args.overrides)
    b = args.batch
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=b)
    host = _collate([ds[i] for i in range(b)])
    host = {k: v for k, v in host.items() if k != "index"}

    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    rng = jax.random.PRNGKey(0)
    results = {"config": args.overrides, "batch": b}
    stages = args.stages.split(",")

    if "prep" in stages:
        prep = jax.jit(
            lambda r: prepare_samples(
                host["pc"], host["attrs"], host["P"], host["K"], r, host["img"],
                cfg, has_normals=True,
            )
        )
        dt = timeit_sync(lambda: prep(rng), warmup=2, iters=args.iters)
        results["prep_ms"] = round(dt * 1e3, 1)
        print("prep_ms", results["prep_ms"], flush=True)

    if "forward" in stages or "fpn" in stages:
        batch = jax.block_until_ready(
            prepare_samples(
                host["pc"], host["attrs"], host["P"], host["K"], rng, host["img"],
                cfg, has_normals=True,
            )
        )
        if "forward" in stages:
            fwd = jax.jit(
                lambda p, bs, bt: model.apply(
                    {"params": p, "batch_stats": bs}, bt, mode="test", train=False
                )
            )
            dt = timeit_sync(
                lambda: fwd(state.params, state.batch_stats, batch),
                warmup=2, iters=args.iters,
            )
            results["forward_ms"] = round(dt * 1e3, 1)
            print("forward_ms", results["forward_ms"], flush=True)
        if "fpn" in stages:
            # point branch only, via the full model with a stub: time the FPN
            # submodule directly
            from cofii2p_tpu.models.kpconv import KPConvFPN

            fpn = KPConvFPN(
                input_dim=cfg.kpconv_input_dim,
                output_dim=cfg.kpconv_output_dim,
                init_dim=cfg.kpconv_init_dim,
                kernel_size=cfg.kernel_size,
                init_radius=cfg.init_radius,
                init_sigma=cfg.init_sigma,
                norm=cfg.norm,
                group_norm=cfg.group_norm,
                dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
                impl=cfg.kpconv_impl,
                tile=cfg.kpconv_tile,
                band_width=cfg.kpconv_band_width,
                band_plan=cfg.kpconv_band_plan,
                kernel=cfg.kpconv_kernel,
            )
            fargs = (
                batch["feats"], batch["points"], batch.get("neighbors"),
                batch.get("subsampling"), batch.get("upsampling"),
            )
            fparams = fpn.init(jax.random.PRNGKey(0), *fargs)
            apply = jax.jit(lambda p: fpn.apply(p, *fargs))
            dt = timeit_sync(lambda: apply(fparams), warmup=2, iters=args.iters)
            results["fpn_ms"] = round(dt * 1e3, 1)
            print("fpn_ms", results["fpn_ms"], flush=True)

    if "fpn_bwd" in stages:
        from cofii2p_tpu.models.kpconv import KPConvFPN

        batch = jax.block_until_ready(
            prepare_samples(
                host["pc"], host["attrs"], host["P"], host["K"], rng, host["img"],
                cfg, has_normals=True,
            )
        )
        fpn = KPConvFPN(
            input_dim=cfg.kpconv_input_dim, output_dim=cfg.kpconv_output_dim,
            init_dim=cfg.kpconv_init_dim, kernel_size=cfg.kernel_size,
            init_radius=cfg.init_radius, init_sigma=cfg.init_sigma,
            norm=cfg.norm, group_norm=cfg.group_norm,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            impl=cfg.kpconv_impl, tile=cfg.kpconv_tile,
            band_width=cfg.kpconv_band_width, band_plan=cfg.kpconv_band_plan,
            kernel=cfg.kpconv_kernel,
        )
        fargs = (
            batch["feats"], batch["points"], batch.get("neighbors"),
            batch.get("subsampling"), batch.get("upsampling"),
        )
        fparams = fpn.init(jax.random.PRNGKey(0), *fargs)

        def loss_fn(p):
            outs = fpn.apply(p, *fargs)
            return sum(jnp.sum(o * o) for o in outs)

        gfn = jax.jit(jax.grad(loss_fn))
        dt = timeit_sync(lambda: gfn(fparams), warmup=2, iters=args.iters)
        results["fpn_bwd_ms"] = round(dt * 1e3, 1)
        print("fpn_bwd_ms", results["fpn_bwd_ms"], flush=True)

    if "train" in stages:
        step = train_lib.make_train_step(cfg, model, tx)
        state_t = jax.tree.map(jnp.copy, state)
        counter = iter(range(100000))

        def one_step():
            nonlocal state_t
            state_t, metrics = step(
                state_t, host, jax.random.fold_in(rng, next(counter))
            )
            return metrics["loss"]

        dt = timeit_sync(one_step, warmup=2, iters=args.iters)
        results["train_step_ms"] = round(dt * 1e3, 1)
        results["train_fps"] = round(b / dt, 2)
        print("train_step_ms", results["train_step_ms"], "fps", results["train_fps"], flush=True)

    if "ransac" in stages:
        import functools
        from cofii2p_tpu.pose.ransac import ransac_pnp

        s = cfg.num_superpoints
        r = jax.random.PRNGKey(7)
        obj = jax.random.normal(r, (b, s, 3)) * 10.0
        uv = jax.random.uniform(r, (b, s, 2)) * 100.0
        Ks = jnp.tile(jnp.eye(3)[None], (b, 1, 1)) * 100.0
        mask = (jax.random.uniform(r, (b, s)) < 0.3).astype(jnp.float32)
        run = jax.jit(
            jax.vmap(
                functools.partial(
                    ransac_pnp,
                    inlier_threshold=cfg.ransac_inlier_px,
                    num_hypotheses=cfg.ransac_hypotheses,
                    refine_iters=cfg.ransac_refine_iters,
                )
            )
        )
        keys = jax.random.split(r, b)
        dt = timeit_sync(lambda: run(keys, obj, uv, Ks, mask), warmup=2, iters=args.iters)
        results["ransac_ms"] = round(dt * 1e3, 1)
        print("ransac_ms", results["ransac_ms"], flush=True)

    if "pipeline" in stages:
        pipeline = make_eval_pipeline(cfg, model)
        if not args.host_inputs:
            # steady-state: inputs pre-staged on device (BatchLoader-style
            # prefetch overlaps the H2D copy with compute in production)
            host = jax.device_put(host)
        counter = iter(range(100000))
        dt = timeit_sync(
            lambda: pipeline(
                state.params, state.batch_stats, host,
                jax.random.fold_in(rng, next(counter)),
            ),
            warmup=3, iters=args.iters,
        )
        results["pipeline_ms"] = round(dt * 1e3, 1)
        results["pipeline_fps"] = round(b / dt, 2)
        print("pipeline_ms", results["pipeline_ms"], "fps", results["pipeline_fps"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
