"""Maxpool candidate-layout study (TPU): (tile, bch, cc) sublane-axis
reduce (shipping v2) vs (bch, tile, cc) major-axis reduce (v4 prototype).

The shipping kernel reduces the masked select along the second-minor
(sublane-grouped) axis; this prototypes the transposed layout, where the
max accumulates across major-axis vreg slabs instead.

Usage:  python -m tools.mp_layout_study
"""

from __future__ import annotations

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.ops.banded import _band_geometry, kernel_reach
    from cofii2p_tpu.ops.kpconv_kernel import _band_starts_np, _slice_bands
    from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
    from cofii2p_tpu.utils.profiling import timeit_sync

    cfg = KITTIConfig()
    b = 8
    ds = SyntheticDataset(cfg, "val", length=b)
    host = _collate([ds[i] for i in range(b)])
    batch = jax.block_until_ready(
        prepare_samples(
            host["pc"], host["attrs"], host["P"], host["K"],
            jax.random.PRNGKey(0), host["img"], cfg, has_normals=True,
        )
    )
    pyr = [jnp.asarray(p) for p in batch["points"]]
    rng = np.random.default_rng(0)
    r0, s0 = cfg.init_radius, cfg.init_sigma
    plan = cfg.kpconv_band_plan
    sizes = cfg.pyramid_sizes
    d = cfg.kpconv_init_dim

    def v4_kernel(qT_ref, p_ref, f_ref, out_ref, cnt_ref, *, r2):
        """cand laid out (bch, tile, cc); reduce along the major axis."""
        cj = pl.program_id(2)
        bc = pl.program_id(3)
        nbc = pl.num_programs(3)

        @pl.when(bc == 0)
        def _init():
            out_ref[...] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)

        @pl.when((bc == 0) & (cj == 0))
        def _init_cnt():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        qT = qT_ref[0, 0]  # (3, tile)
        ref = qT[:, 0:1]  # (3, 1)
        qTc = qT - ref
        p = p_ref[0, 0] - ref.reshape(1, 3)  # (bch, 3)
        f = f_ref[0, 0]  # (bch, cc)

        d2 = None
        for dd in range(3):
            diff = p[:, dd : dd + 1] - qTc[dd : dd + 1, :]  # (bch, tile)
            d2 = diff * diff if d2 is None else d2 + diff * diff
        wi = (d2 <= r2).astype(jnp.float32)  # (bch, tile)

        @pl.when(cj == 0)
        def _count():
            cnt_ref[0, :, :] += jnp.sum(wi, axis=0)[:, None]

        @pl.when(jnp.sum(wi) > 0.0)
        def _pool():
            pen = (wi[:, :, None] - 1.0) * 1e30  # (bch, tile, 1)
            cand = f.astype(jnp.float32)[:, None, :] + pen  # (bch, tile, cc)
            pooled = jnp.maximum(
                out_ref[0].astype(jnp.float32), jnp.max(cand, axis=0)
            )
            out_ref[0, :, :] = pooled.astype(out_ref.dtype)

        @pl.when(bc == nbc - 1)
        def _finish():
            hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
            fixed = jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
            out_ref[0, :, :] = fixed.astype(out_ref.dtype)

    def v4(s_feats, q_points, s_points, r_active, tile, band_width):
        bq, m = q_points.shape[:2]
        n, c = s_feats.shape[-2:]
        r2 = float(r_active) ** 2
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts, band))(s_feats)
        qT = jnp.swapaxes(
            q_points.reshape(bq, num_tiles, tile, 3), -1, -2
        )  # (B, nt, 3, tile)

        cc = min(c, 128)
        bch = 128 if band % 128 == 0 else band
        out, _ = pl.pallas_call(
            functools.partial(v4_kernel, r2=r2),
            grid=(bq, num_tiles, c // cc, band // bch),
            in_specs=[
                pl.BlockSpec((1, 1, 3, tile), lambda bb, tt, cj, bc: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bch, 3), lambda bb, tt, cj, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bq, m, c), s_feats.dtype),
                jax.ShapeDtypeStruct((bq, m, 1), jnp.float32),
            ],
            interpret=jax.devices()[0].platform != "tpu",
        )(qT.reshape(bq, num_tiles, 3, tile), band_p, band_f)
        return out

    def chain(one, x0, inner=8):
        def body(i, acc):
            x, sc = acc
            return (x + 1e-12 * sc, one(x))

        fn = jax.jit(
            lambda x: jax.lax.fori_loop(0, inner, body, (x, 0.0))[1]
        )
        tiny = jnp.zeros((8, 128))
        fl = jax.jit(lambda x: jnp.sum(x * 2.0))
        floor = timeit_sync(lambda: fl(tiny), warmup=2, iters=10)
        dt = timeit_sync(lambda: fn(x0), warmup=2, iters=10)
        return (dt - floor) / inner * 1e3

    pools = [
        (2, sizes[1], sizes[0], d * 2, 0, 1),
        (5, sizes[4], sizes[3], d * 16, 3, 8),
    ]
    for stage, m, n, c, sl, rs in pools:
        q = pyr[sl + 1]
        s = pyr[sl]
        f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        ra = kernel_reach(r0 * rs, s0 * rs, 15)

        ref_out = banded_maxpool_pallas(f, q, s, ra, cfg.kpconv_tile, plan[sl])
        got = v4(f, q, s, ra, cfg.kpconv_tile, plan[sl])
        diff = np.abs(np.asarray(got) - np.asarray(ref_out)).max()
        t2 = chain(lambda x: jnp.sum(
            banded_maxpool_pallas(x, q, s, ra, cfg.kpconv_tile, plan[sl])
        ) * 1e-9, f)
        t4 = chain(lambda x: jnp.sum(
            v4(x, q, s, ra, cfg.kpconv_tile, plan[sl])
        ) * 1e-9, f)
        print(f"enc{stage}_1 m{m} n{n} C{c}: v2 {t2:6.2f} ms  v4 {t4:6.2f} ms"
              f"  maxdiff {diff}", flush=True)


if __name__ == "__main__":
    main()
