"""Maxpool kernel grid-granularity study (real TPU).

The round-4 stream bisect pinned the banded maxpool at 80.5 ms/batch —
43% of eval — yet a vreg-level cost model of the select puts the pure VPU
work nearer 10-15 ms bf16.  Hypothesis: per-grid-cell fixed cost (DMA
issue, revisit sync, Mosaic prologue) dominates at the shipped 128x128
chunking (enc5_1 alone runs 11,520 cells).  This sweeps chunk geometry:

  base        — shipped (cc=128, bch=128)
  bch=<n>     — taller band chunks (fewer band cells, same VPU work)
  cc=<n>      — wider channel blocks (fewer channel cells)
  cloop       — experimental kernel: full-C block, fori_loop over 128-lane
                channel chunks inside the cell (d2 + membership computed
                once per (tile, band-chunk) instead of per channel chunk)

Timing: lax.scan of CHUNK independent applications inside one jit
(the trusted stream method), scalar readback sync.

Usage: python -m tools.mp_grid_study [--dtype bfloat16] [--chunk 8]
"""

from __future__ import annotations

import argparse
import functools


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import cofii2p_tpu.ops.maxpool_kernel as mp
    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.ops.banded import kernel_reach
    from cofii2p_tpu.ops.kpconv_kernel import _band_starts_np, _slice_bands
    from cofii2p_tpu.ops.banded import _band_geometry
    from cofii2p_tpu.ops.pyramid import morton_order
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    cfg = KITTIConfig()
    r0, s0, ks = cfg.init_radius, cfg.init_sigma, cfg.kernel_size
    plan = cfg.kpconv_band_plan
    b = args.batch

    rng = np.random.default_rng(0)

    def cloud(n):
        pts = np.concatenate(
            [rng.uniform(-40, 40, (n, 1)), rng.uniform(-2, 2, (n, 1)),
             rng.uniform(0, 80, (n, 1))], 1).astype(np.float32)
        order = np.asarray(morton_order(jnp.asarray(pts), ordering="xz"))
        return pts[order]

    # (name, m, n, support_lvl, radius_scale, C) — the four strided shortcuts
    shapes = [
        ("enc2_1", 10240, 20480, 0, 1, 128),
        ("enc3_1", 5120, 10240, 1, 2, 256),
        ("enc4_1", 2560, 5120, 2, 4, 512),
        ("enc5_1", 1280, 2560, 3, 8, 1024),
    ]

    # ---- experimental kernel: in-cell channel loop over a full-C block ----
    def _cloop_kernel(q_ref, pT_ref, f_ref, out_ref, cnt_ref, *, r2, cc):
        bc = pl.program_id(2)
        nbc = pl.num_programs(2)

        @pl.when(bc == 0)
        def _init():
            out_ref[...] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        ref = q_ref[0, 0:1, :]
        q = q_ref[0] - ref
        pT = pT_ref[0, 0] - ref.reshape(3, 1)
        d2 = None
        for d in range(3):
            diff = q[:, d : d + 1] - pT[d : d + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        wi = (d2 <= r2).astype(jnp.float32)
        cnt_ref[0, :, :] += jnp.sum(wi, axis=1, keepdims=True)

        c = f_ref.shape[-1]
        ncj = c // cc

        @pl.when(jnp.sum(wi) > 0.0)
        def _pool():
            cdt = f_ref.dtype
            pen = ((wi[:, :, None] - 1.0) * 1e30).astype(cdt)

            def one(cj, _):
                f = f_ref[0, 0, :, pl.ds(cj * cc, cc)]
                cand = f[None, :, :] + pen
                pooled = jnp.maximum(
                    out_ref[0, :, pl.ds(cj * cc, cc)], jnp.max(cand, axis=1)
                )
                out_ref[0, :, pl.ds(cj * cc, cc)] = pooled
                return _

            jax.lax.fori_loop(0, ncj, one, 0)

        @pl.when(bc == nbc - 1)
        def _finish():
            hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
            fixed = jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
            out_ref[0, :, :] = fixed.astype(out_ref.dtype)

    def cloop_forward(s_feats, q_points, s_points, r_active, tile, band_width,
                      bch, cc):
        bq, m = q_points.shape[:2]
        n, c = s_feats.shape[-2:]
        r2 = float(r_active) ** 2
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(s_feats)
        band_pT = jnp.swapaxes(band_p, -1, -2)
        out, _ = pl.pallas_call(
            functools.partial(_cloop_kernel, r2=r2, cc=cc),
            grid=(bq, num_tiles, band // bch),
            in_specs=[
                pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile, c), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bq, m, c), s_feats.dtype),
                jax.ShapeDtypeStruct((bq, m, 1), jnp.float32),
            ],
        )(q_points, band_pT, band_f)
        return out

    for name, m, n, sl, rs, c in shapes:
        pts_n = cloud(n)
        # query level = every other point of the support level (subset, like
        # grid subsample keeps)
        pts_m = pts_n[:: n // m][:m]
        q_pts = jnp.asarray(np.broadcast_to(pts_m, (b, m, 3)).copy())
        s_pts = jnp.asarray(np.broadcast_to(pts_n, (b, n, 3)).copy())
        feats = jnp.asarray(
            rng.standard_normal((b, n, c), np.float32).astype(args.dtype)
        )
        r_act = kernel_reach(r0 * rs, s0 * rs, ks)
        bw = int(plan[sl])
        _, _, band, _ = _band_geometry(m, n, 128, bw)

        def bench(fn, label):
            @jax.jit
            def run(f):
                def step(carry, _):
                    o = fn(f * (1.0 + carry * 0.0))
                    return carry + jnp.sum(o.astype(jnp.float32)) * 1e-30, None
                tot, _ = jax.lax.scan(
                    step, jnp.zeros((), jnp.float32), None, length=args.chunk
                )
                return tot
            ms = timeit_sync(lambda: run(feats), warmup=2, iters=args.iters)
            ms = ms * 1e3 / args.chunk
            print(f"{name} {label:24s} {ms:8.2f} ms", flush=True)
            return ms

        ref_out = None

        def base(f, bw=bw):
            return mp.banded_maxpool_pallas(f, q_pts, s_pts, r_act, 128, bw)

        bench(base, f"base cc=128 bch=128 band={band}")

        for bch in (256, 384, 512):
            if band % bch:
                continue
            mp._FORCE_CHUNKS = (128, bch)
            try:
                bench(base, f"bch={bch}")
            finally:
                mp._FORCE_CHUNKS = None

        if c >= 256:
            mp._FORCE_CHUNKS = (256, 128)
            try:
                bench(base, "cc=256")
            finally:
                mp._FORCE_CHUNKS = None

        for bch in (128, 256):
            if band % bch or c > 128:
                # the cloop variant holds a full-C f block per cell; at
                # C>=256 the (bch, C) block + out block blow the ~16 MB
                # scoped-vmem limit (measured OOM at enc3_1)
                continue

            def cl(f, bch=bch, bw=bw):
                return cloop_forward(
                    f, q_pts, s_pts, r_act, 128, bw, bch, min(c, 128)
                )

            bench(cl, f"cloop bch={bch}")

        if c <= 128:
            # correctness spot check of the experimental kernel vs shipped
            o1 = np.asarray(jax.device_get(base(feats)))
            o2 = np.asarray(jax.device_get(
                cloop_forward(feats, q_pts, s_pts, r_act, 128, bw, 128, c)
            ))
            bad = int((o1 != o2).sum())
            print(f"{name} cloop-vs-base mismatches: {bad}", flush=True)


if __name__ == "__main__":
    main()
