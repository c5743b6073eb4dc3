"""Dynamic-window (tile, width) A/B for the banded maxpool + aggregation
Pallas kernels (run on real TPU).

The static band plan sizes each 128-query tile's support band for the
UNION of its queries' in-reach spans (plus Morton-tail slack) — at deep
FPN levels that band covers most of the level (enc5_1 scans 2304 of 2560
rows) while a single query's neighborhood is ~20x narrower.  The select /
influence work scales with tile x band x C, so the union span is the
waste.  Dynamic per-tile starts (ops/banded.dynamic_band_starts, landed
round 3) shrink the window; SMALLER QUERY TILES shrink the union span
itself (the round-2 tile=64 static A/B lost only because the static band
could not shrink with it).

This tool measures, per strided-shortcut shape on REAL pyramid clouds
(the synthetic-dataset pipeline — random clouds do not reproduce the
Morton/'xz' locality the skip guards and spans depend on):

  - static baseline (tile=128, band plan)                    [ms]
  - dynamic (tile, width) grid: starts cost + kernel cost     [ms]
  - coverage of the dynamic window vs the full radius op:
    in-reach PAIR coverage (maxpool cares: any missed row may carry the
    max) and influence-mass proxy coverage (aggregation cares)

Timings are chained inside one jit (inner applications with a data
dependency) with the dispatch floor subtracted — single calls through
the tunneled backend pay a ~25-38 ms round trip (PERF.md).

Usage: python -m tools.dyn_mp_ab [--batch 8] [--inner 4] [--agg]
       [--shapes enc4_1,enc5_1] [--tiles 8,32,128] [--widths 256,512,768]
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.ops.banded import dynamic_band_starts, kernel_reach
    from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--agg", action="store_true",
                    help="A/B the aggregation kernel instead of maxpool")
    ap.add_argument("--shapes", default="enc3_1,enc4_1,enc5_1")
    ap.add_argument("--tiles", default="8,32,128")
    ap.add_argument("--widths", default="256,512,768")
    ap.add_argument("--center", default="centroid")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    plan = cfg.kpconv_band_plan

    # (name, m, n, C, support_level): the four strided shortcuts; C is the
    # block INPUT width the shortcut pools (the sibling strided KPConv
    # aggregates the bottleneck width C/4 on the same geometry)
    all_shapes = {
        "enc2_1": (10240, 20480, 128, 0),
        "enc3_1": (5120, 10240, 256, 1),
        "enc4_1": (2560, 5120, 512, 2),
        "enc5_1": (1280, 2560, 1024, 3),
        # self pairs (aggregation only — shortcut maxpool is strided-only);
        # C follows the same x4 convention so --agg runs the bottleneck width
        "enc2_2": (10240, 10240, 256, 1),
        "enc3_2": (5120, 5120, 512, 2),
        "enc4_2": (2560, 2560, 1024, 3),
        "enc5_2": (1280, 1280, 2048, 4),
    }
    shapes = [(nm, *all_shapes[nm]) for nm in args.shapes.split(",")]
    tiles = [int(x) for x in args.tiles.split(",")]
    widths = [int(x) for x in args.widths.split(",")]

    # real pyramid clouds (Morton/'xz' ordered by the device pipeline)
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
    rng = np.random.default_rng(0)

    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    print(f"dispatch floor {floor * 1e3:.2f} ms")

    def chain_feats(fn, feats, *rest):
        """inner applications chained through the FEATURES argument."""
        def body(acc, _):
            out = fn(feats + acc * 1e-20, *rest)
            return acc + jnp.sum(out[0] if isinstance(out, tuple) else out)

        return jax.jit(
            lambda: functools.reduce(
                body, range(args.inner), jnp.zeros((), jnp.float32)
            )
        )

    def coverage(q0, s0, r_act, tile, width, starts0):
        """Sample-0 coverage of the window vs the full radius op, on device
        in query chunks: (pair coverage, influence-mass proxy coverage)."""
        m, n = q0.shape[0], s0.shape[0]
        sigma_proxy = r_act  # mass proxy: relu(1 - d/r_act)
        qchunk = 1024

        def per_chunk(c0):
            q = jax.lax.dynamic_slice(q0, (c0, 0), (qchunk, 3))
            st = jax.lax.dynamic_slice(
                starts0, ((c0 // tile),), (qchunk // tile,)
            )
            st_row = jnp.repeat(st, tile)  # (qchunk,)
            d2 = ((q[:, None, :] - s0[None, :, :]) ** 2).sum(-1)
            within = d2 <= r_act * r_act
            j = jnp.arange(n)[None, :]
            inw = within & (j >= st_row[:, None]) & (j < st_row[:, None] + width)
            mass = jnp.maximum(1.0 - jnp.sqrt(d2) / sigma_proxy, 0.0)
            return (
                jnp.sum(within), jnp.sum(inw),
                jnp.sum(mass * within), jnp.sum(mass * inw),
            )

        tot = pairs_in = m_tot = m_in = 0.0
        for c0 in range(0, m, qchunk):
            t, i, mt, mi = jax.jit(per_chunk)(jnp.int32(c0))
            tot += float(t); pairs_in += float(i)
            m_tot += float(mt); m_in += float(mi)
        return pairs_in / max(tot, 1), m_in / max(m_tot, 1e-9)

    results = {}
    for name, m, n, c, lvl in shapes:
        r = cfg.init_radius * (2 ** lvl)
        sg = cfg.init_sigma * (2 ** lvl)
        r_act = float(kernel_reach(r, sg, cfg.kernel_size))
        s_pts = pyramid[lvl_of_size[n]]
        q_pts = pyramid[lvl_of_size[m]]
        cc = c if not args.agg else c // 4  # agg runs at bottleneck width
        feats = jnp.asarray(rng.normal(size=(b, n, cc)).astype(np.float32))

        # static baseline
        if args.agg:
            base = lambda f, q, s: banded_kpconv_aggregate_pallas(
                f, q, s, r, sg, cfg.kernel_size, cfg.kpconv_tile,
                plan[lvl], jnp.float32,
            )
        else:
            base = lambda f, q, s: banded_maxpool_pallas(
                f, q, s, r_act, cfg.kpconv_tile, plan[lvl]
            )
        t_static = (
            timeit_sync(chain_feats(base, feats, q_pts, s_pts), iters=args.iters)
            - floor
        ) / args.inner
        # static plan's own coverage by the SAME metric (the accuracy bar a
        # dynamic config must clear is the validated static plan, not 1.0)
        from cofii2p_tpu.ops.banded import _band_geometry
        from cofii2p_tpu.ops.kpconv_kernel import _band_starts_np

        tile_s, nt_s, band_s, _ = _band_geometry(m, n, cfg.kpconv_tile, plan[lvl])
        st_static = jnp.asarray(
            _band_starts_np(m, n, tile_s, band_s, nt_s).astype(np.int32)
        )
        pc_s, mc_s = coverage(q_pts[0], s_pts[0], r_act, tile_s, band_s, st_static)
        key = f"{name} C{cc}"
        results[key] = {
            "static_ms": round(t_static * 1e3, 2),
            "static_pair_cov": round(pc_s, 4),
            "static_mass_cov": round(mc_s, 4),
        }
        print(
            f"{name}: static {t_static * 1e3:7.2f} ms  (band {band_s}, "
            f"pair_cov {pc_s:.4f}, mass_cov {mc_s:.4f})"
        )

        for tile in tiles:
            if m % tile:
                continue
            for width in widths:
                if width >= n:
                    continue
                starts_fn = jax.vmap(
                    lambda q, s: dynamic_band_starts(
                        q, s, r_act, tile, width, center=args.center
                    )
                )
                # starts cost (chained through the query points)
                def st_chain(qq=q_pts, ss=s_pts):
                    def body(acc, _):
                        st = starts_fn(qq + acc * 1e-20, ss)
                        return acc + jnp.sum(st).astype(jnp.float32)
                    return functools.reduce(
                        body, range(args.inner), jnp.zeros((), jnp.float32)
                    )
                t_starts = (
                    timeit_sync(jax.jit(st_chain), iters=args.iters) - floor
                ) / args.inner

                starts = jax.block_until_ready(starts_fn(q_pts, s_pts))

                if args.agg:
                    dyn = lambda f, q, s, st: banded_kpconv_aggregate_pallas(
                        f, q, s, r, sg, cfg.kernel_size, tile, width,
                        jnp.float32, st,
                    )
                else:
                    dyn = lambda f, q, s, st: banded_maxpool_pallas(
                        f, q, s, r_act, tile, width, True, st
                    )
                try:
                    t_dyn = (
                        timeit_sync(
                            chain_feats(dyn, feats, q_pts, s_pts, starts),
                            iters=args.iters,
                        )
                        - floor
                    ) / args.inner
                except Exception as e:
                    print(f"  t{tile:4d} w{width:5d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue

                pc, mc = coverage(
                    q_pts[0], s_pts[0], r_act, tile, width, starts[0]
                )
                results[key][f"t{tile}_w{width}"] = {
                    "kernel_ms": round(t_dyn * 1e3, 2),
                    "starts_ms": round(t_starts * 1e3, 2),
                    "pair_cov": round(pc, 4),
                    "mass_cov": round(mc, 4),
                }
                print(
                    f"  t{tile:4d} w{width:5d}: kernel {t_dyn * 1e3:7.2f} ms"
                    f"  starts {t_starts * 1e3:6.2f} ms"
                    f"  pair_cov {pc:.4f}  mass_cov {mc:.4f}"
                )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
