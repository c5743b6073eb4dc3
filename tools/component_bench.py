"""In-graph component timing of the eval pipeline (TPU).

Single-call timings through the tunneled backend carry a ~38 ms dispatch
floor (tools/kernel_bench.py measures it), which swamps every component —
the FPN's aggregation kernels total ~31 ms of real device time.  This tool
times each pipeline component by chaining `--inner` applications inside one
jit (data-dependent, so they serialize) and dividing out the floor.

Usage:  python -m tools.component_bench [--batch 8] [--inner 8]
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig, apply_overrides
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.evaluation.pipeline import make_eval_pipeline
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.models.network import fine_match_xy
    from cofii2p_tpu.pose.ransac import ransac_pnp
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*", default=[])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    cfg = apply_overrides(KITTIConfig(), args.overrides)
    b = args.batch
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=b)
    host = _collate([ds[i] for i in range(b)])
    host = {k: v for k, v in host.items() if k != "index"}
    host = jax.device_put(host)

    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    rng = jax.random.PRNGKey(0)
    batch = jax.block_until_ready(
        prepare_samples(
            host["pc"], host["attrs"], host["P"], host["K"], rng, host["img"],
            cfg, has_normals=True,
        )
    )

    results = {}

    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    results["dispatch_floor_ms"] = round(floor * 1e3, 2)
    print(f"{'dispatch floor':28s} {floor * 1e3:8.2f} ms")

    def chained_ms(name, one, x0):
        """Time `one(x) -> scalar` applied --inner times with a data chain."""

        def body(i, acc):
            x, s = acc
            return (x + 1e-12 * s, one(x))

        fn = jax.jit(
            lambda x: jax.lax.fori_loop(0, args.inner, body, (x, 0.0))[1]
        )
        dt = timeit_sync(lambda: fn(x0), warmup=2, iters=args.iters)
        ms = max(dt - floor, 0.0) / args.inner * 1e3
        results[name] = round(ms, 2)
        print(f"{name:28s} {ms:8.2f} ms")
        return ms

    # 1. sample prep (perturb + pyramid + GT)
    pc0 = host["pc"]

    def prep_one(pc):
        bt = prepare_samples(
            pc, host["attrs"], host["P"], host["K"], rng, host["img"],
            cfg, has_normals=True,
        )
        return jnp.sum(bt["points"][0]) * 1e-9
    chained_ms("prep", prep_one, pc0)

    # 2. full model forward, test mode
    def fwd_one(feats):
        bt = dict(batch, feats=feats)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            bt, mode="test", train=False,
        )
        return jnp.sum(out["fine_pc_feature"].astype(jnp.float32)) * 1e-9
    chained_ms("model forward (test)", fwd_one, batch["feats"])

    # 3. FPN alone (through the model's pc encoder params)
    from cofii2p_tpu.models.kpconv import KPConvFPN

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fpn = KPConvFPN(
        input_dim=cfg.kpconv_input_dim, output_dim=cfg.kpconv_output_dim,
        init_dim=cfg.kpconv_init_dim, kernel_size=cfg.kernel_size,
        init_radius=cfg.init_radius, init_sigma=cfg.init_sigma,
        norm=cfg.norm, group_norm=cfg.group_norm, dtype=dtype,
        impl=cfg.kpconv_impl, tile=cfg.kpconv_tile,
        band_width=cfg.kpconv_band_width, band_plan=cfg.kpconv_band_plan,
        kernel=cfg.kpconv_kernel,
    )
    fpn_params = {"params": state.params["pc_encoder"]}

    def fpn_one(feats):
        outs = fpn.apply(fpn_params, feats, batch["points"])
        return jnp.sum(outs[0].astype(jnp.float32)) * 1e-9
    chained_ms("kpconv fpn", fpn_one, batch["feats"])

    # 4. image encoder alone
    from cofii2p_tpu.models.resnet import ResNetEncoder

    stage_sizes = {"resnet34": (3, 4, 6, 3), "resnet18": (2, 2, 2, 2)}[
        cfg.img_backbone
    ]
    enc = ResNetEncoder(stage_sizes=stage_sizes, dtype=dtype)
    enc_params = {"params": state.params["img_encoder"]}

    def img_one(img):
        outs = enc.apply(enc_params, img)
        return jnp.sum(outs[-1].astype(jnp.float32)) * 1e-9
    chained_ms("resnet encoder", img_one, batch["img"])

    # 5. ransac alone
    s = cfg.num_superpoints
    r = jax.random.PRNGKey(7)
    obj = jax.random.normal(r, (b, s, 3)) * 10.0
    uv = jax.random.uniform(r, (b, s, 2)) * 100.0
    Ks = jnp.tile(jnp.eye(3)[None], (b, 1, 1)) * 100.0
    mask = (jax.random.uniform(r, (b, s)) < 0.3).astype(jnp.float32)
    keys = jax.random.split(r, b)
    rp = jax.vmap(
        functools.partial(
            ransac_pnp,
            inlier_threshold=cfg.ransac_inlier_px,
            num_hypotheses=cfg.ransac_hypotheses,
            refine_iters=cfg.ransac_refine_iters,
        )
    )

    def ransac_one(o):
        res = rp(keys, o, uv, Ks, mask)
        return jnp.sum(res.t) * 1e-9
    chained_ms("ransac", ransac_one, obj)

    # 6. whole pipeline (prep + forward + fine match + ransac)
    pipeline = make_eval_pipeline(cfg, model)

    def pipe_one(pc):
        hb = dict(host, pc=pc)
        out = pipeline(state.params, state.batch_stats, hb, rng)
        return jnp.sum(out.t) * 1e-9
    chained_ms("pipeline total", pipe_one, pc0)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
