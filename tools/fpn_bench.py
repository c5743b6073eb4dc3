"""Per-piece timing of the banded KPConv FPN's NON-aggregate ops (TPU).

tools/kernel_bench.py shows the Pallas aggregation kernels total ~31 ms,
while tools/component_bench.py shows the whole FPN at ~226 ms (B=8).  This
tool times the remaining pieces — strided-shortcut banded maxpools, decoder
nearest-index upsamples, the (B,M,K,C)x(K,C,D) contraction einsums, and the
unary/norm glue — to locate the missing time.

Usage:  python -m tools.fpn_bench [--batch 8] [--inner 8]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops.banded import (
        banded_maxpool,
        banded_nearest_index,
        kernel_reach,
    )
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--xla_maxpool", action="store_true",
                    help="also time the XLA banded maxpool for comparison")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    plan = cfg.kpconv_band_plan
    r0, s0 = cfg.init_radius, cfg.init_sigma
    sizes = cfg.pyramid_sizes
    d = cfg.kpconv_init_dim
    ks = cfg.kernel_size
    rng = np.random.default_rng(0)
    results = {}

    # real pyramid clouds (ordering-faithful: the banded kernels' skip rate
    # and coverage depend on the Morton/'xz' ordering, which random test
    # clouds do not reproduce)
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

    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    print(f"{'dispatch floor':46s} {floor * 1e3:8.2f} ms")

    def chained_ms(name, one, x0):
        def body(i, acc):
            x, s = acc
            return (x + 1e-12 * s, one(x))

        fn = jax.jit(
            lambda x: jax.lax.fori_loop(0, args.inner, body, (x, 0.0))[1]
        )
        dt = timeit_sync(lambda: fn(x0), warmup=2, iters=args.iters)
        ms = max(dt - floor, 0.0) / args.inner * 1e3
        results[name] = round(ms, 2)
        print(f"{name:46s} {ms:8.2f} ms")
        return ms

    # 1. strided-shortcut maxpools (stage, m, n, C, support_lvl, radius scale)
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas

    pools = [
        (2, sizes[1], sizes[0], d * 2, 0, 1),
        (3, sizes[2], sizes[1], d * 4, 1, 2),
        (4, sizes[3], sizes[2], d * 8, 2, 4),
        (5, sizes[4], sizes[3], d * 16, 3, 8),
    ]
    for stage, m, n, c, sl, rs in pools:
        s_pts = pyramid[sl]
        q_pts = pyramid[sl + 1]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        ra = kernel_reach(r0 * rs, s0 * rs, ks)

        def one_pl(f, q=q_pts, s=s_pts, ra=ra, bwp=plan[sl]):
            out = banded_maxpool_pallas(f, q, s, ra, cfg.kpconv_tile, bwp)
            return jnp.sum(out) * 1e-9

        chained_ms(f"maxpool-pl enc{stage}_1 m{m} n{n} C{c}", one_pl, feats)

        if args.xla_maxpool:
            def one(f, q=q_pts, s=s_pts, ra=ra, bwp=plan[sl]):
                out = jax.vmap(
                    lambda ff, qq, ss: banded_maxpool(
                        ff, qq, ss, ra, cfg.kpconv_tile, bwp
                    )
                )(f, q, s)
                return jnp.sum(out) * 1e-9

            chained_ms(f"maxpool enc{stage}_1 m{m} n{n} C{c}", one, feats)

    # 2. decoder nearest-index upsamples (fine lvl, coarse lvl)
    for lvl in (3, 2, 1):
        m, n = sizes[lvl], sizes[lvl + 1]
        s_pts = pyramid[lvl]  # fine queries
        c_pts = pyramid[lvl + 1]

        def one(q, sp=c_pts, bwp=plan[lvl + 1]):
            idx = jax.vmap(
                lambda qq, ss: banded_nearest_index(
                    qq, ss, cfg.kpconv_tile, bwp
                )
            )(q, sp)
            return jnp.sum(idx.astype(jnp.float32)) * 1e-9

        chained_ms(f"nearest_idx dec L{lvl} m{m} n{n}", one, s_pts)

    # 3. contraction einsum + count normalization at each conv width
    for m, c, dd in [
        (sizes[0], 4, d // 2), (sizes[0], d // 2, d // 2),
        (sizes[1], d // 2, d), (sizes[1], d, d), (sizes[2], d, d * 2),
        (sizes[2], d * 2, d * 2), (sizes[3], d * 2, d * 4),
        (sizes[3], d * 4, d * 4), (sizes[4], d * 4, d * 8),
        (sizes[4], d * 8, d * 8),
    ]:
        w = jnp.asarray(rng.normal(size=(b, m, ks, c)).astype(np.float32))
        wt = jnp.asarray(rng.normal(size=(ks, c, dd)).astype(np.float32))
        cnt = jnp.ones((b, m), jnp.int32) * 30

        def one(x, wt=wt, cnt=cnt):
            out = jnp.einsum(
                "bmkc,kcd->bmd", x, wt, preferred_element_type=jnp.float32
            )
            out = out / cnt[..., None].astype(out.dtype)
            return jnp.sum(out) * 1e-9

        chained_ms(f"contract m{m} C{c}->D{dd}", one, w)

    # 4. unary + groupnorm + lrelu glue at representative shapes
    from cofii2p_tpu.models.layers import Linear, leaky_relu, norm_factory
    import flax.linen as nn

    class Glue(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x):
            x = Linear(self.out, name="mlp")(x)
            x = norm_factory(cfg.norm, cfg.group_norm)(x)
            return leaky_relu(x)

    for m, c, dd in [(sizes[0], d, d * 2), (sizes[1], d * 2, d * 4),
                     (sizes[2], d * 4, d * 8), (sizes[3], d * 8, d * 16),
                     (sizes[4], d * 16, d * 32)]:
        g = Glue(dd)
        x0 = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
        p = g.init(jax.random.PRNGKey(0), x0)

        def one(x, g=g, p=p):
            return jnp.sum(g.apply(p, x)) * 1e-9

        chained_ms(f"unary+gn m{m} C{c}->D{dd}", one, x0)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
