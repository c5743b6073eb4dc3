"""Performance measurement CLI: network FPS, PnP FPS, end-to-end pipeline
FPS, parameter count and per-step FLOPs.

Capability match for /root/reference/evaluation/get_flops_fps.py (fvcore
FLOPs + CUDA-synchronized latency loops), using XLA's compiled cost
analysis and block_until_ready timing.

Usage: ``python -m cofii2p_tpu.evaluation.get_flops_fps [ckpt] [dataset]
[--synthetic]``.  Without a checkpoint it measures randomly-initialized
weights (same cost profile).
"""

from __future__ import annotations

import argparse


import jax
import numpy as np

from cofii2p_tpu.config import apply_overrides, get_config
from cofii2p_tpu.data.loader import BatchLoader
from cofii2p_tpu.evaluation.pipeline import make_eval_pipeline
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.pose.ransac import ransac_pnp
from cofii2p_tpu import train_lib


def _count_activations(closed_jaxpr) -> int:
    """fvcore-style activation count: total elements produced by matmul and
    convolution ops (the reference reports fvcore's ActivationCountAnalysis,
    get_flops_fps.py:25-27, whose convention is exactly this)."""
    total = 0
    seen = set()

    def _jaxprs_of(v):
        out = []
        vals = v if isinstance(v, (list, tuple)) else [v]
        for x in vals:
            if hasattr(x, "jaxpr"):  # ClosedJaxpr
                out.append(x.jaxpr)
            elif hasattr(x, "eqns"):  # raw Jaxpr
                out.append(x)
        return out

    def walk(jaxpr):
        nonlocal total
        if id(jaxpr) in seen:
            return
        seen.add(id(jaxpr))
        for eqn in jaxpr.eqns:
            if eqn.primitive.name in ("dot_general", "conv_general_dilated"):
                for ov in eqn.outvars:
                    n = 1
                    for d in ov.aval.shape:
                        n *= int(d)
                    total += n
            for v in eqn.params.values():
                for j in _jaxprs_of(v):
                    walk(j)

    walk(closed_jaxpr.jaxpr)
    return total


def timed(fn, *a, warmup=3, iters=10, **kw):
    # hard-sync timing (see utils/profiling: block_until_ready is not a
    # reliable barrier on tunneled TPU backends)
    from cofii2p_tpu.utils.profiling import timeit_sync

    return timeit_sync(fn, *a, warmup=warmup, iters=iters, **kw)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", nargs="?", default="")
    parser.add_argument("dataset", nargs="?", default="kitti")
    parser.add_argument(
        "--synthetic",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="synthetic frames (default); --no-synthetic benches real data",
    )
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument(
        "--network",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="also time the bare network forward and report activations "
        "(the reference's fps_params_flops mode); --no-network skips the "
        "extra compile",
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(get_config(args.dataset), args.overrides)
    from cofii2p_tpu.train import build_dataset

    ds = build_dataset(args.dataset, cfg, "val", args.synthetic, 8)
    loader = BatchLoader(ds, args.batch_size, num_workers=4, drop_last=False)
    host_batch = next(loader.epoch(0))
    has_normals = getattr(ds, "has_normals", True)

    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(
        cfg, model, tx, jax.random.PRNGKey(0), host_batch, has_normals
    )
    if args.ckpt:
        from cofii2p_tpu.evaluation.eval_all import load_weights

        params, batch_stats = load_weights(args.ckpt, cfg, model, host_batch, has_normals)
        state = state._replace(params=params, batch_stats=batch_stats)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M")

    pipeline = make_eval_pipeline(cfg, model, has_normals)
    rng = jax.random.PRNGKey(0)

    # FLOPs of the full compiled pipeline
    lowered = pipeline.lower(state.params, state.batch_stats, host_batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if cost and "flops" in cost:
        print(f"pipeline flops/frame: {cost['flops']/args.batch_size/1e9:.2f} GFLOPs")

    dt = timed(pipeline, state.params, state.batch_stats, host_batch, rng)
    fps = args.batch_size / dt
    print(f"end-to-end pipeline: {dt*1000:.2f} ms/batch, {fps:.2f} frames/s")

    if args.network:
        # bare network forward, like the reference's fps_params_flops
        # (/root/reference/evaluation/get_flops_fps.py:14-63): model.apply
        # (mode='test') on an already-prepared device batch, plus an fvcore-
        # style activation count (elements produced by matmul/conv ops) and
        # XLA's bytes-accessed / peak-memory estimates
        from cofii2p_tpu.data.device_pipeline import prepare_samples

        prep_rng, _ = jax.random.split(rng)
        batch_dev = jax.jit(
            lambda hb, r: prepare_samples(
                hb["pc"], hb["attrs"], hb["P"], hb["K"], r, hb["img"], cfg,
                has_normals=has_normals,
            )
        )(host_batch, prep_rng)

        def _net_apply(params, batch_stats, batch):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                mode="test", train=False,
            )

        net_fwd = jax.jit(_net_apply)
        compiled_n = net_fwd.lower(
            state.params, state.batch_stats, batch_dev
        ).compile()
        cost_n = compiled_n.cost_analysis() or {}
        acts = _count_activations(
            jax.make_jaxpr(_net_apply)(state.params, state.batch_stats, batch_dev)
        )
        dt_n = timed(net_fwd, state.params, state.batch_stats, batch_dev)
        print(
            f"network forward: {dt_n*1000/args.batch_size:.2f} ms/frame, "
            f"{args.batch_size/dt_n:.2f} frames/s"
        )
        if "flops" in cost_n:
            print(
                f"network flops/frame: {cost_n['flops']/args.batch_size/1e9:.2f} GFLOPs"
            )
        if "bytes accessed" in cost_n:
            print(
                "network bytes accessed/frame: "
                f"{cost_n['bytes accessed']/args.batch_size/1e9:.2f} GB"
            )
        print(f"network activations/frame: {acts/args.batch_size/1e6:.2f} M")
        try:
            mem = compiled_n.memory_analysis()
            if mem is not None:
                print(
                    f"network peak temp memory: {mem.temp_size_in_bytes/1e6:.1f} MB"
                )
        except Exception:
            pass

    # PnP alone at eval scale
    s = cfg.num_superpoints
    rs = np.random.RandomState(0)
    obj = jax.numpy.asarray(rs.randn(s, 3).astype(np.float32) * 10 + [0, 0, 30])
    uv = jax.numpy.asarray(rs.rand(s, 2).astype(np.float32) * 200)
    K = jax.numpy.asarray(
        np.array([[300.0, 0, 128], [0, 300.0, 40], [0, 0, 1]], np.float32)
    )
    mask = jax.numpy.ones((s,))
    dt_pnp = timed(
        lambda r: ransac_pnp(r, obj, uv, K, mask,
                             num_hypotheses=cfg.ransac_hypotheses),
        jax.random.PRNGKey(1),
    )
    print(f"pnp-ransac alone: {dt_pnp*1000:.2f} ms/frame, {1/dt_pnp:.2f} frames/s")
    return fps


if __name__ == "__main__":
    main()
