"""Maxpool kernel layout micro-study (run on real TPU).

The banded maxpool's masked select measures ~0.38 Tops/s — ~10x off the VPU
floor (PERF.md).  Hypothesis: the (tile, bch) -> (tile, bch, 1) minor-dim
insert on the mask forces a lane->sublane relayout per cell, and the
sublane-axis reduce adds shuffle chains.  Variants:

  A: shipped kernel (ops/maxpool_kernel.py)
  E: (cc, tile, bch) orientation — mask broadcast via a *leading* insert
     (free), features pre-transposed outside the kernel, reduce over lanes,
     transposed output fixed up by XLA.
  S: strip-mined sublane variant — loop 8-row band strips, mask slice
     broadcast per strip.

Usage: python -m tools.mp_micro [--n 2560] [--m 1280] [--c 1024] [--band 1024]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cofii2p_tpu.ops.banded import _band_geometry, kernel_reach
from cofii2p_tpu.ops.kpconv_kernel import _band_starts_np, _slice_bands
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
from cofii2p_tpu.ops.pyramid import morton_order
from cofii2p_tpu.utils.profiling import timeit_sync


# ---------------------------------------------------------------------------
# variant E: (cc, tile, bch) orientation
# ---------------------------------------------------------------------------

def _mp_e_kernel(q_ref, pT_ref, fT_ref, out_ref, cnt_ref, *, r2):
    """out (1, cc, tile) running max; fT (1, 1, cc, bch) pre-transposed.

    Mask math stays in wi's natural (tile, bch) 2-D layout; every 3-D
    broadcast inserts a LEADING dim only (no lane<->sublane relayout).
    """
    cj = pl.program_id(2)
    bc = pl.program_id(3)
    nbc = pl.num_programs(3)

    @pl.when(bc == 0)
    def _init():
        out_ref[...] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)

    @pl.when((bc == 0) & (cj == 0))
    def _init_cnt():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
    fT = fT_ref[0, 0]  # (cc, bch)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, bch)
    wi = (d2 <= r2).astype(jnp.float32)

    @pl.when(cj == 0)
    def _count():
        cnt_ref[0, :, :] += jnp.sum(wi, axis=1, keepdims=True)

    @pl.when(jnp.sum(wi) > 0.0)
    def _pool():
        cdt = fT.dtype
        pen = ((wi[None, :, :] - 1.0) * 1e30).astype(cdt)  # (1, tile, bch)
        cand = fT[:, None, :] + pen  # (cc, tile, bch)
        pooled = jnp.maximum(out_ref[0], jnp.max(cand, axis=-1))  # (cc, tile)
        out_ref[0, :, :] = pooled

    @pl.when(bc == nbc - 1)
    def _finish():
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32).reshape(1, -1)  # (1, tile)
        fixed = jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
        out_ref[0, :, :] = fixed.astype(out_ref.dtype)


def maxpool_e(s_feats, q_points, s_points, r_active, tile=128, band_width=1024):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    r2 = float(r_active) ** 2
    tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile, band, num_tiles)
    band_p = jax.vmap(lambda p: _slice_bands(p, starts, band))(s_points)
    band_pT = jnp.swapaxes(band_p, -1, -2)
    band_f = jax.vmap(lambda f: _slice_bands(f, starts, band))(s_feats)
    band_fT = jnp.swapaxes(band_f, -1, -2)  # (B, nt, C, band)

    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"
    bch = band if interpret else (128 if band % 128 == 0 else band)
    outT, _ = pl.pallas_call(
        functools.partial(_mp_e_kernel, r2=r2),
        grid=(b, num_tiles, c // cc, band // bch),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, cj, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc, bch), lambda bb, tt, cj, bc: (bb, tt, cj, bc), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cc, tile), lambda bb, tt, cj, bc: (bb, cj, tt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, m), s_feats.dtype),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_points, band_pT, band_fT)
    return jnp.swapaxes(outT, -1, -2)


# ---------------------------------------------------------------------------
# variant S: strip-mined sublane sweep (current orientation, no 3-D insert)
# ---------------------------------------------------------------------------

def _mp_s_kernel(q_ref, pT_ref, f_ref, out_ref, cnt_ref, *, r2, strips):
    cj = pl.program_id(2)
    bc = pl.program_id(3)
    nbc = pl.num_programs(3)

    @pl.when(bc == 0)
    def _init():
        out_ref[...] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)

    @pl.when((bc == 0) & (cj == 0))
    def _init_cnt():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    f = f_ref[0, 0]  # (bch, cc)
    bch = f.shape[0]
    sub = bch // strips

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    wi = (d2 <= r2).astype(jnp.float32)  # (tile, bch)

    @pl.when(cj == 0)
    def _count():
        cnt_ref[0, :, :] += jnp.sum(wi, axis=1, keepdims=True)

    @pl.when(jnp.sum(wi) > 0.0)
    def _pool():
        cdt = f.dtype
        acc = out_ref[0]
        for g in range(strips):
            wg = wi[:, g * sub : (g + 1) * sub]  # (tile, sub)
            pen = ((wg[:, :, None] - 1.0) * 1e30).astype(cdt)
            cand = f[g * sub : (g + 1) * sub][None, :, :] + pen
            acc = jnp.maximum(acc, jnp.max(cand, axis=1))
        out_ref[0, :, :] = acc

    @pl.when(bc == nbc - 1)
    def _finish():
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
        fixed = jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
        out_ref[0, :, :] = fixed.astype(out_ref.dtype)


def maxpool_s(s_feats, q_points, s_points, r_active, tile=128, band_width=1024, strips=4):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    r2 = float(r_active) ** 2
    tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile, band, num_tiles)
    band_p = jax.vmap(lambda p: _slice_bands(p, starts, band))(s_points)
    band_pT = jnp.swapaxes(band_p, -1, -2)
    band_f = jax.vmap(lambda f: _slice_bands(f, starts, band))(s_feats)

    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"
    bch = band if interpret else (128 if band % 128 == 0 else band)
    out, _ = pl.pallas_call(
        functools.partial(_mp_s_kernel, r2=r2, strips=strips),
        grid=(b, num_tiles, c // cc, band // bch),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, cj, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, c), s_feats.dtype),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_points, band_pT, band_f)
    return out


def _scene(b, n, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.concatenate(
        [rng.uniform(-40, 40, (n, 1)), rng.uniform(-2, 2, (n, 1)),
         rng.uniform(0, 80, (n, 1))], 1
    ).astype(np.float32)
    order = np.asarray(morton_order(jnp.asarray(pts), ordering="xz"))
    pts = pts[order]
    return np.broadcast_to(pts, (b, n, 3)).copy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=2560)
    ap.add_argument("--m", type=int, default=1280)
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--band", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    r = 0.425 * 8
    s = 0.2 * 8
    r_active = kernel_reach(r, s, 15)
    rng = np.random.RandomState(1)
    spts = jnp.asarray(_scene(args.b, args.n))
    qpts = spts[:, :: args.n // args.m][:, : args.m]
    feats = jnp.asarray(rng.randn(args.b, args.n, args.c).astype(np.float32))

    variants = {
        "A_current": lambda: banded_maxpool_pallas(
            feats, qpts, spts, r_active, 128, args.band
        ),
        "E_cc_tile_bch": lambda: maxpool_e(
            feats, qpts, spts, r_active, 128, args.band
        ),
        "S_strips4": lambda: maxpool_s(
            feats, qpts, spts, r_active, 128, args.band, strips=4
        ),
        "S_strips16": lambda: maxpool_s(
            feats, qpts, spts, r_active, 128, args.band, strips=16
        ),
    }

    ref = None
    for name, fn in variants.items():
        try:
            out = np.asarray(jax.jit(fn)())
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        if ref is None:
            ref = out
            exact = True
        else:
            exact = np.array_equal(ref, out)
        ms = timeit_sync(jax.jit(fn), warmup=3, iters=args.iters) * 1e3
        print(f"{name}: {ms:.2f} ms  bit-exact={exact}")


if __name__ == "__main__":
    main()
