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
