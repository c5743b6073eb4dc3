"""Per-conv-shape timing of the Pallas banded KPConv kernel (TPU).

Times banded_kpconv_aggregate_pallas (and optionally its backward) at every
FPN convolution shape under the default band plan, B=8 KITTI scale.  Shows
where the FPN's time actually goes so kernel micro-optimizations target the
right level.

Usage:  python -m tools.kernel_bench [--batch 8] [--iters 10] [--bwd]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8,
                    help="kernel applications chained inside one jit — "
                    "divides out the per-dispatch tunnel overhead")
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    plan = cfg.kpconv_band_plan
    r0, s0 = cfg.init_radius, cfg.init_sigma
    sizes = cfg.pyramid_sizes  # (20480, 10240, 5120, 2560, 1280)
    d = cfg.kpconv_init_dim

    # (name, m, n, support_lvl, radius_scale, C) — mirrors KPConvFPN wiring:
    # ConvBlock enc1_1 aggregates raw feats (C=4); every ResidualBlock's
    # KPConv runs at the bottleneck width C_mid = C_out/4.
    convs = [
        ("enc1_1 L0 C4", sizes[0], sizes[0], 0, 1, 4),
        ("enc1_2 L0 C32", sizes[0], sizes[0], 0, 1, d // 2),
    ]
    for stage in range(2, 6):
        lvl = stage - 1
        cmid = d * 2 ** (stage - 2) // 2  # (cin)/4 .. matches blocks
        convs.append(
            (f"enc{stage}_1 L{lvl-1}->L{lvl} strided C{d * 2 ** (stage - 1) // 4}",
             sizes[lvl], sizes[lvl - 1], lvl - 1, 2 ** (lvl - 1), d * 2 ** (stage - 1) // 4)
        )
        cself = d * 2 ** stage // 4
        convs.append(
            (f"enc{stage}_2/3 L{lvl} self C{cself} (x2)",
             sizes[lvl], sizes[lvl], lvl, 2 ** lvl, cself)
        )

    rng = np.random.default_rng(0)
    dtype = jnp.dtype(args.dtype)
    results = {}
    total = 0.0

    # real pyramid clouds: the banded kernel's chunk-skip rate depends on
    # the Morton/'xz' ordering, which random test clouds do not reproduce
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples

    ds = SyntheticDataset(cfg, "val", length=b)
    host = _collate([ds[i] for i in range(b)])
    batch = jax.block_until_ready(
        prepare_samples(
            host["pc"], host["attrs"], host["P"], host["K"],
            jax.random.PRNGKey(0), host["img"], cfg, has_normals=True,
        )
    )
    pyramid = [jnp.asarray(p) for p in batch["points"]]
    lvl_of_size = {int(p.shape[1]): i for i, p in enumerate(pyramid)}

    # dispatch floor: a trivial jit through the tunneled backend costs a
    # fixed round-trip that would otherwise swamp single-kernel timings
    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    print(f"{'dispatch floor (trivial jit)':42s} {floor * 1e3:8.2f} ms")

    for name, m, n, sl, rs, c in convs:
        reps = 2 if "(x2)" in name else 1
        s_pts = pyramid[lvl_of_size[n]]
        q_pts = pyramid[lvl_of_size[m]]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

        def run(f, q=q_pts, s=s_pts, r=r0 * rs, sg=s0 * rs, bwp=plan[sl]):
            w, _ = banded_kpconv_aggregate_pallas(
                f, q, s, r, sg, cfg.kernel_size, cfg.kpconv_tile, bwp, dtype
            )
            return w

        if args.bwd:
            # g rides as a jit ARGUMENT: a closed-over 300 MB cotangent
            # constant bakes into the MLIR and blows the compile-relay body
            # limit (HTTP 413; PERF.md)
            g = jnp.asarray(
                rng.normal(size=(b, m, cfg.kernel_size, c)).astype(np.float32)
            )
            one = jax.grad(lambda f, gg: jnp.sum(run(f) * gg))

            def chained(f, gg, one=one):
                def body(i, acc):
                    gr = one(acc, gg)
                    return acc + 1e-12 * gr  # data dependency chains iters
                return jnp.sum(jax.lax.fori_loop(0, args.inner, body, f))

            fn = jax.jit(chained)
            dt = timeit_sync(lambda: fn(feats, g), warmup=2, iters=args.iters)
        else:
            def chained(f):
                def body(i, acc):
                    w = run(acc)
                    return acc + 1e-12 * jnp.sum(w)  # scalar dep chains iters
                return jnp.sum(jax.lax.fori_loop(0, args.inner, body, f))

            fn = jax.jit(chained)
            dt = timeit_sync(lambda: fn(feats), warmup=2, iters=args.iters)
        ms = max(dt - floor, 0.0) / args.inner * 1e3 * reps
        total += ms
        results[name] = round(ms, 2)
        print(f"{name:42s} {ms:8.2f} ms" + ("  (both blocks)" if reps == 2 else ""))
    print(f"{'TOTAL (FPN encoder aggregates)':42s} {total:8.2f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
