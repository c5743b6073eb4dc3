"""Dynamic band starts: span statistics + A/B timing per FPN conv (TPU).

Phase 'spans': per (query level, support level) pair on real pyramid
clouds, measure each tile's exact in-reach index span and what fraction of
in-reach pairs a centered window of the candidate width keeps.  This picks
the per-level dynamic widths.

Phase 'ab': per FPN conv shape, chained timings of the maxpool and
aggregation Pallas kernels with the static band plan vs dynamic starts at
the given widths (starts computation timed separately — it is shared by
every conv at a level pair, like tau).

Usage:
  python -m tools.dyn_band_study spans [--batch 8]
  python -m tools.dyn_band_study ab [--widths 256,256,256,384,512]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.ops.banded import (
        _membership_d2,
        dynamic_band_starts,
        kernel_reach,
    )
    from cofii2p_tpu.ops.kpconv_kernel import (
        banded_kpconv_aggregate_pallas,
        banded_kpconv_fused_pallas,
    )
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["spans", "ab"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--widths", default="256,256,384,512,768",
                    help="dynamic window width per support level")
    args = ap.parse_args()

    cfg = KITTIConfig()
    b = args.batch
    widths = tuple(int(w) for w in args.widths.split(","))
    sizes = cfg.pyramid_sizes
    plan = cfg.kpconv_band_plan
    r0, s0 = cfg.init_radius, cfg.init_sigma

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

    # (qlvl, slvl) pairs the FPN actually runs + the r_active at each
    pairs = []
    for stage in range(1, 6):
        lvl = stage - 1
        rs = 2 ** max(lvl - 1, 0)
        if stage >= 2:
            pairs.append((lvl, lvl - 1, 2 ** (lvl - 1)))  # strided
        pairs.append((lvl, lvl, 2 ** lvl if stage >= 2 else 1))  # self

    if args.phase == "spans":
        @jax.jit
        def stats_for(qp, sp, r2, width, sband):
            n = sp.shape[1]
            tile = 128

            def per_item(q_points, s_points):
                m = q_points.shape[0]
                nt = m // tile

                def per_tile(t):
                    q = jax.lax.dynamic_slice(
                        q_points, (t * tile, 0), (tile, 3)
                    )
                    d2 = _membership_d2(q, s_points)
                    within = d2 <= r2
                    rows = jnp.any(within, axis=0)
                    jmin = jnp.argmax(rows)
                    jmax = n - 1 - jnp.argmax(rows[::-1])
                    span = jnp.where(jnp.any(rows), jmax - jmin + 1, 0)
                    start = jnp.clip((jmin + jmax + 1 - width) // 2, 0, n - width)
                    j = jnp.arange(n)
                    inwin = (j >= start) & (j < start + width)
                    total = jnp.sum(within)
                    kept = jnp.sum(within & inwin[None, :])
                    # the static proportional plan's coverage (the quality
                    # baseline any faster plan must match)
                    sstart = jnp.clip(
                        ((2 * t * tile + tile) * n) // (2 * m) - sband // 2,
                        0, n - sband,
                    )
                    sin = (j >= sstart) & (j < sstart + sband)
                    skept = jnp.sum(within & sin[None, :])
                    return span, total, kept, skept

                return jax.lax.map(per_tile, jnp.arange(nt))

            return jax.vmap(per_item)(qp, sp)

        out = {}
        for ql, sl, rs in pairs:
            r_act = kernel_reach(r0 * rs, s0 * rs, cfg.kernel_size)
            w = widths[sl]
            sband = min(int(plan[sl]), int(sizes[sl]))
            span, total, kept, skept = jax.device_get(
                stats_for(
                    pyramid[ql], pyramid[sl], r_act * r_act, w, sband
                )
            )
            span = span.ravel()
            cov = kept.sum() / max(total.sum(), 1)
            scov = skept.sum() / max(total.sum(), 1)
            key = f"L{ql}<-L{sl}"
            out[key] = {
                "span_p50": int(np.percentile(span, 50)),
                "span_p95": int(np.percentile(span, 95)),
                "span_max": int(span.max()),
                "width": w,
                "pair_coverage": round(float(cov), 6),
                "static_band": sband,
                "static_coverage": round(float(scov), 6),
                "n": int(sizes[sl]),
            }
            print(key, out[key])
        print(json.dumps(out))
        return

    # --- phase ab ---
    rng = np.random.default_rng(0)
    tiny = jnp.zeros((8, 128))
    floor_fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    floor = timeit_sync(lambda: floor_fn(tiny), warmup=2, iters=args.iters)
    print(f"{'dispatch floor':44s} {floor * 1e3:8.2f} ms")
    results = {}

    def chained_ms(name, one, x0):
        def body(i, acc):
            return acc + 1e-12 * one(acc)

        fn = jax.jit(
            lambda x: jnp.sum(jax.lax.fori_loop(0, args.inner, body, x))
        )
        dt = timeit_sync(lambda: fn(x0), warmup=2, iters=args.iters)
        ms = max(dt - floor, 0.0) / args.inner * 1e3
        results[name] = round(ms, 2)
        print(f"{name:44s} {ms:8.2f} ms")
        return ms

    # cost of computing starts, per level pair (amortized over sibling convs)
    for ql, sl, rs in pairs:
        r_act = kernel_reach(r0 * rs, s0 * rs, cfg.kernel_size)
        w = widths[sl]
        q_pts, s_pts = pyramid[ql], pyramid[sl]

        def starts_one(q, s_pts=s_pts, r_act=r_act, w=w):
            return jnp.sum(
                jax.vmap(
                    lambda qq, ss: dynamic_band_starts(qq, ss, r_act, 128, w)
                )(q, s_pts).astype(jnp.float32)
            )

        chained_ms(f"starts L{ql}<-L{sl} w={w}", starts_one, q_pts)

    # per-conv A/B: maxpool (strided shortcuts) + aggregation
    convs = []
    d = cfg.kpconv_init_dim
    for stage in range(2, 6):
        lvl = stage - 1
        cin = d * 2 ** (stage - 1)  # maxpool shortcut C
        convs.append(
            ("mp", f"enc{stage}_1 mp L{lvl-1}->L{lvl} C{cin}",
             sizes[lvl], sizes[lvl - 1], lvl - 1, 2 ** (lvl - 1), cin)
        )
        cmid = d * 2 ** (stage - 1) // 4
        convs.append(
            ("agg", f"enc{stage}_1 agg L{lvl-1}->L{lvl} C{cmid}",
             sizes[lvl], sizes[lvl - 1], lvl - 1, 2 ** (lvl - 1), cmid)
        )
        cself = d * 2 ** stage // 4
        convs.append(
            ("agg", f"enc{stage}_2/3 agg L{lvl} C{cself} (x2)",
             sizes[lvl], sizes[lvl], lvl, 2 ** lvl, cself)
        )

    for kind, name, m, n, sl, rs, c in convs:
        q_pts = pyramid[lvl_of_size[m]]
        s_pts = pyramid[lvl_of_size[n]]
        r = r0 * rs
        sg = s0 * rs
        r_act = kernel_reach(r, sg, cfg.kernel_size)
        w = widths[sl]
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        starts = jax.block_until_ready(
            jax.vmap(
                lambda qq, ss: dynamic_band_starts(qq, ss, r_act, 128, w)
            )(q_pts, s_pts)
        )
        reps = 2 if "(x2)" in name else 1

        if kind == "mp":
            def stat(f, q=q_pts, s=s_pts, r_=r_act, bw=plan[sl]):
                return jnp.sum(
                    banded_maxpool_pallas(f, q, s, r_, 128, bw)
                )

            def dyn(f, q=q_pts, s=s_pts, r_=r_act, w=w, st=starts):
                return jnp.sum(
                    banded_maxpool_pallas(f, q, s, r_, 128, w, True, st)
                )
        else:
            def stat(f, q=q_pts, s=s_pts, r_=r, sg_=sg, bw=plan[sl]):
                wt, _ = banded_kpconv_aggregate_pallas(
                    f, q, s, r_, sg_, cfg.kernel_size, 128, bw, jnp.float32
                )
                return jnp.sum(wt)

            def dyn(f, q=q_pts, s=s_pts, r_=r, sg_=sg, w=w, st=starts):
                wt, _ = banded_kpconv_aggregate_pallas(
                    f, q, s, r_, sg_, cfg.kernel_size, 128, w, jnp.float32,
                    st,
                )
                return jnp.sum(wt)

        ms_s = chained_ms(f"{name} static", stat, feats) * reps
        ms_d = chained_ms(f"{name} dynamic w={w}", dyn, feats) * reps
        results[name] = {"static": round(ms_s, 2), "dynamic": round(ms_d, 2)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
