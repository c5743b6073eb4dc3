"""Fused Pallas TPU kernel for the banded KPConv aggregation.

The XLA banded path (ops/banded.py) is compute-shaped correctly but XLA
materializes the (tile, band, K) influence chain between its fusions and the
aggregation dot — several HBM round-trips per scan step that dominate the
FPN's runtime.  This kernel keeps the whole chain in VMEM.

Key algebraic fact that makes the kernel cheap: the kernel-point cross term
is separable,

    |o_mj - kp_k|^2 = |p_j - q_m|^2 - 2 kp_k . p_j + 2 kp_k . q_m + |kp_k|^2,

so per kernel point the squared distance is d2 (computed once) plus a row
broadcast (K, band), a column broadcast (tile, K), and a constant — no
(tile, band, K, 3) geometry anywhere.

Grid: (B, num_tiles).  The caller pre-slices the per-tile support bands into
(B, nt, band, .) tensors (a cheap strided gather in XLA), so every BlockSpec
is a plain blocked index map — no in-kernel gathers, which Mosaic cannot
lower in this environment (PERF.md).

Differentiation: wrapped in jax.custom_vjp, backward also a Pallas kernel.
Gradients propagate into s_feats only — the pyramid coordinates are data,
not parameters, so their gradients are never needed.  The backward is the
transposed aggregation: grid over *support* tiles, each revisiting the
contiguous window of query blocks whose bands touch it (the band plan is
monotone, so the window is a static contiguous range), recomputing the
influence with the same separable identity and accumulating
infl^T @ g_weighted into the support tile's (stile, C) gradient block.
The forward's exact band membership is reproduced in-kernel with an
integer mask  start(tile(m)) <= j < start(tile(m)) + band.

Usage is config-gated (`kpconv_kernel='pallas'`); the XLA path remains the
default until the kernel is validated on the target TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cofii2p_tpu.ops.banded import (
    _band_geometry,
    _load_kernel_points,
    _slice_bands_dyn,
    kernel_reach,
)


_AGG_BCH = 128  # band rows per forward grid cell


def _agg_kernel(kp_ref, q_ref, pT_ref, f_ref, out_ref, cnt_ref, *, sigma, r2, cdtype):
    """One (batch, query-tile, band-chunk) cell: accumulate this chunk's
    influence-weighted features into the tile's running sums.

    The band rides the grid (not the cell) so (a) VMEM holds one small
    chunk instead of the whole band — tile stays 128 even at C=512 bf16 —
    and (b) chunks with no in-reach point skip their entire K-sweep and
    MXU dots: in-reach rows concentrate in a few chunks, the band's width
    covers rare Morton discontinuities.

    kp_ref: (K, 3)         kernel points (same block everywhere)
    q_ref:  (1, tile, 3)   query coordinates
    pT_ref: (1, 1, 3, bch) this band chunk's coordinates, transposed
    f_ref:  (1, 1, bch, C) this band chunk's features
    out_ref:(1, tile, K*C) influence-weighted sums (revisited over chunks)
    cnt_ref:(1, tile, 1)   in-radius counts (revisited over chunks)
    """
    bc = pl.program_id(2)

    @pl.when(bc == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    kpj = kp_ref[...]  # (K, 3)
    # center on the tile's first query: distances are translation-invariant,
    # but the separable cross terms are not — at KITTI coordinate scale the
    # uncentered kp.p / kp.q dots lose the precision the sqrt then amplifies
    # near dist=0 (exactly where influence peaks)
    ref = q_ref[0, 0:1, :]  # (1, 3)
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
    k_num = kpj.shape[0]

    # d2 (tile, bch)
    d2 = None
    for d in range(3):
        qd = q[:, d : d + 1]  # (tile, 1)
        pd = pT[d : d + 1, :]  # (1, bch)
        diff = qd - pd
        d2 = diff * diff if d2 is None else d2 + diff * diff

    wif = (d2 <= r2).astype(jnp.float32)  # (tile, bch)
    cnt_ref[0, :, :] += jnp.sum(wif, axis=1, keepdims=True)

    @pl.when(jnp.sum(wif) > 0.0)
    def _agg():
        f = f_ref[0, 0].astype(cdtype)  # (bch, C)
        c = f.shape[-1]
        # row terms: -2 kp . p  -> (K, bch); col terms: 2 kp . q -> (tile, K).
        # HIGHEST precision: these K x 3 dots are a rounding error of the
        # kernel's cost, but default (bf16-grade) MXU rounding here puts
        # O(4e-3) absolute error into s2k, which the sqrt turns into O(0.1)
        # influence error at small distances.
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, bch)
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (tile, K)
        kp2 = jnp.sum(kpj * kpj, axis=-1)  # (K,)

        inv_sigma = 1.0 / sigma
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * wif).astype(cdtype)
            acc = jnp.dot(infl, f, preferred_element_type=jnp.float32)  # (tile, C)
            out_ref[0, :, k * c : (k + 1) * c] += acc


def _band_starts_np(num_q: int, num_s: int, tile: int, band: int, num_tiles: int) -> np.ndarray:
    """Pure-Python twin of banded._band_start for every tile (jnp would
    trace under jit); nondecreasing in t by construction."""
    return np.asarray(
        [
            min(
                max(((2 * t * tile + tile) * num_s) // (2 * num_q) - band // 2, 0),
                num_s - band,
            )
            for t in range(num_tiles)
        ],
        dtype=np.int64,
    )


def _slice_bands(x: jax.Array, starts: np.ndarray, band: int) -> jax.Array:
    """(N, D) -> (nt, band, D) as a stack of static slices — pure DMA block
    copies at runtime (a gather, even with constant indices, would pay the
    ~8 ns/row random-access cost the banded design exists to avoid)."""
    return jnp.stack(
        [jax.lax.slice_in_dim(x, int(s), int(s) + band, axis=0) for s in starts]
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def banded_kpconv_aggregate_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    starts: jax.Array | None = None,
):
    """Fused-kernel twin of ops.banded.banded_kpconv_aggregate (batched).

    Args are batched: s_feats (B, N, C), q_points (B, M, 3), s_points
    (B, N, 3).  Returns (weighted (B, M, K, C) fp32, count (B, M) int32).

    ``starts``: optional (B, num_tiles) int32 per-tile window starts from
    dynamic_band_starts — ``band_width`` is then the full window width (the
    kernels never consume absolute indices in the forward: membership comes
    from coordinates, so only the stack slicing changes).  Differentiable
    since round 4: the backward takes the forward-geometry stack kernel +
    window scatter-add (_transpose_agg_dyn) instead of the static
    transposed plan.
    """
    return _forward(
        s_feats, q_points, s_points, radius, sigma, kernel_size, tile,
        band_width, dtype, starts,
    )


def _forward(s_feats, q_points, s_points, radius, sigma, kernel_size, tile, band_width, dtype, starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    if starts is None:
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(s_feats)
    else:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
            s_points, starts
        )
        band_f = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            s_feats, starts
        )
    band_pT = jnp.swapaxes(band_p, -1, -2)  # (B, nt, 3, band)

    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    # Chunking is for the skip guard, and only pays where chunks actually
    # skip: measured occupancy of 128-row chunks is 0.67-0.85 on the narrow
    # fine-level bands (per-cell overhead dominates, tools/kernel_bench.py)
    # vs 0.31-0.61 on the wide deep-level bands.  Narrow bands therefore
    # run as one whole-band cell; interpret mode (CPU tests) always does
    # (it pays Python per cell, and one chunk keeps fp32 sums order-exact
    # vs the XLA reference path).
    chunked = band >= 1024 and band % _AGG_BCH == 0 and not interpret
    bch = _AGG_BCH if chunked else band
    kernel = functools.partial(
        _agg_kernel, sigma=float(sigma), r2=float(r2), cdtype=jnp.dtype(dtype),
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, k_num * c), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, k_num * c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(kp), q_points, band_pT, band_f)

    weighted = out.reshape(b, m, k_num, c)
    count = jnp.maximum(cnt[..., 0], 1.0).astype(jnp.int32)
    return weighted, count


def _fwd(s_feats, q_points, s_points, radius, sigma, kernel_size, tile, band_width, dtype, starts=None):
    out = _forward(
        s_feats, q_points, s_points, radius, sigma, kernel_size, tile,
        band_width, dtype, starts,
    )
    return out, (s_feats, q_points, s_points, starts)


_BWD_STILE = 256  # support rows per backward grid cell (shrunk to divide N)


def _agg_bwd_kernel(qsb_ref, kp_ref, q_ref, bs_ref, g_ref, pT_ref, out_ref, *, sigma, r2, band, cdtype):
    """One (batch, support-tile, query-subtile) cell of the transposed
    aggregation: out[js, c] += sum_{mq, k} infl[mq, js, k] * g[mq, k*C + c].

    qsb_ref: (ns,)            scalar-prefetch query-window block starts
    kp_ref:  (K, 3)           kernel points
    q_ref:   (1, qtile, 3)    query coordinates of this window block
    bs_ref:  (qtile, 1)       each query's forward band start (absolute idx)
    g_ref:   (1, qtile, K*C)  cotangent of `weighted` for these queries
    pT_ref:  (1, 1, 3, stile) this support tile's coordinates, transposed
    out_ref: (1, stile, C)    support-feature gradient (revisited over qq)
    """
    ss = pl.program_id(1)
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    kpj = kp_ref[...]  # (K, 3)
    # same per-cell centering + HIGHEST-precision cross terms as the forward
    # kernel (see _agg_kernel) — keeps backward influence fp32-exact
    ref = q_ref[0, 0:1, :]  # (1, 3)
    q = q_ref[0] - ref  # (qtile, 3)
    bs = bs_ref[...]  # (qtile, 1) int32
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, stile)
    k_num = kpj.shape[0]
    stile = pT.shape[-1]
    c = out_ref.shape[-1]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (qtile, stile)

    # forward membership: within kernel reach AND within the query's band
    j_abs = ss * stile + jax.lax.broadcasted_iota(jnp.int32, (1, stile), 1)
    maskf = (
        (d2 <= r2) & (bs <= j_abs) & (j_abs < bs + band)
    ).astype(jnp.float32)

    # same data-dependent skip as the forward kernel: most (query-window
    # block, support-tile) cells share no in-reach pair
    @pl.when(jnp.sum(maskf) > 0.0)
    def _route():
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, stile)
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (qtile, K)
        kp2 = jnp.sum(kpj * kpj, axis=-1)  # (K,)

        inv_sigma = 1.0 / sigma
        acc = jnp.zeros((stile, c), jnp.float32)
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * maskf).astype(cdtype)
            gk = g_ref[0, :, k * c : (k + 1) * c].astype(cdtype)  # (qtile, C)
            acc = acc + jax.lax.dot_general(
                infl, gk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # contract over queries -> (stile, C)
        out_ref[0, :, :] += acc


def _agg_bwd_dyn_kernel(kp_ref, q_ref, pT_ref, g_ref, out_ref, *, sigma, r2, cdtype):
    """One (batch, query-tile, band-chunk) cell of the FORWARD-GEOMETRY
    aggregation backward (dynamic windows): out[j, c] = sum_{m, k}
    infl[m, j, k] * g[m, k*C + c] for this tile's window chunk.

    The transposed backward (`_agg_bwd_kernel`) sweeps support tiles with a
    STATIC per-support-tile query-window plan — impossible under per-tile
    data-dependent window starts.  Here the grid mirrors the forward
    (windows are per-query-tile by construction), each (tt, bc) cell owns a
    disjoint (bch, C) block of the per-tile gradient STACK, and XLA
    scatter-adds the overlapping windows back to (N, C) afterwards
    (`_scatter_band_stacks`).

    kp_ref:  (K, 3)          kernel points
    q_ref:   (1, tile, 3)    query coordinates
    pT_ref:  (1, 1, 3, bch)  this window chunk's coordinates, transposed
    g_ref:   (1, tile, K*C)  cotangent of `weighted` for this tile
    out_ref: (1, 1, bch, C)  this chunk's stack gradient (written once)
    """
    kpj = kp_ref[...]  # (K, 3)
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
    k_num = kpj.shape[0]
    c = out_ref.shape[-1]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, bch)
    wif = (d2 <= r2).astype(jnp.float32)

    # disjoint blocks are written exactly once: zero unconditionally, then
    # the guarded heavy pass overwrites occupied chunks
    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.sum(wif) > 0.0)
    def _route():
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, bch)
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (tile, K)
        kp2 = jnp.sum(kpj * kpj, axis=-1)

        inv_sigma = 1.0 / sigma
        acc = jnp.zeros((pT.shape[-1], c), jnp.float32)
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * wif).astype(cdtype)  # (tile, bch)
            gk = g_ref[0, :, k * c : (k + 1) * c].astype(cdtype)  # (tile, C)
            acc = acc + jax.lax.dot_general(
                infl, gk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # contract over queries -> (bch, C)
        out_ref[0, 0, :, :] = acc


def _scatter_band_stacks(g_stack, starts, n):
    """(B, nt, band, C) per-tile window gradients + (B, nt) starts ->
    (B, N, C) fp32: scatter-add each tile's window at its start (windows
    overlap, so the adds are sequential dynamic-slice updates — nt steps,
    each touching band*C)."""
    b, nt, band, c = g_stack.shape

    def one(gs, st):
        def body(t, acc):
            cur = jax.lax.dynamic_slice(acc, (st[t], 0), (band, c))
            return jax.lax.dynamic_update_slice(acc, cur + gs[t], (st[t], 0))

        return jax.lax.fori_loop(
            0, nt, body, jnp.zeros((n, c), jnp.float32)
        )

    return jax.vmap(one)(g_stack, starts)


def _transpose_agg_dyn(g_weighted, q_points, s_points, starts, n, c, radius,
                       sigma, kernel_size, tile, band_width, dtype):
    """Dynamic-window twin of _transpose_agg: forward-geometry Pallas
    gradient stack + XLA window scatter-add."""
    b, m = q_points.shape[:2]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    tile = min(tile, m)
    while m % tile:
        tile //= 2
    num_tiles = m // tile
    band = min(band_width, n)
    band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
        s_points, starts
    )
    band_pT = jnp.swapaxes(band_p, -1, -2)  # (B, nt, 3, band)
    g2 = g_weighted.reshape(b, m, k_num * c)

    interpret = jax.devices()[0].platform != "tpu"
    chunked = band >= 1024 and band % _AGG_BCH == 0 and not interpret
    bch = _AGG_BCH if chunked else band
    kernel = functools.partial(
        _agg_bwd_dyn_kernel, sigma=float(sigma), r2=float(r2),
        cdtype=jnp.dtype(dtype),
    )
    g_stack = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k_num * c), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles, band, c), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(kp), q_points, band_pT, g2)
    return _scatter_band_stacks(g_stack, starts, n)


def _bwd_geometry(m: int, n: int, tile_q: int, band: int, starts: np.ndarray):
    """Static plan for the transposed pass: support tile size, per-support-
    tile query-window block starts (uniform width Q, multiple of tile_q)."""
    stile = min(_BWD_STILE, n)
    while n % stile:
        stile //= 2
    ns = n // stile
    t_lo = np.zeros(ns, np.int64)
    t_hi = np.zeros(ns, np.int64)
    for s_i in range(ns):
        touch = np.nonzero(
            (starts < (s_i + 1) * stile) & (starts + band > s_i * stile)
        )[0]
        if len(touch):
            t_lo[s_i], t_hi[s_i] = touch[0], touch[-1]
    q_win = int(((t_hi - t_lo + 1) * tile_q).max())
    q_win = min(-(-q_win // tile_q) * tile_q, m)
    qstart = np.minimum(t_lo * tile_q, m - q_win)
    return stile, ns, q_win, (qstart // tile_q).astype(np.int32)


def _transpose_agg(g_weighted, q_points, s_points, n, c, radius, sigma,
                   kernel_size, tile, band_width, dtype):
    """Transposed aggregation: (B, M, K, C) cotangent of `weighted` ->
    (B, N, C) fp32 feature gradient.  Shared by the plain and fused VJPs
    (the aggregation backward never reads feature values, only geometry)."""
    b, m = q_points.shape[:2]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    tile_q, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile_q, band, num_tiles)
    stile, ns, q_win, qstart_blk = _bwd_geometry(m, n, tile_q, band, starts)
    nq_sub = q_win // tile_q

    bs_per_query = jnp.asarray(
        starts[np.arange(m) // tile_q].astype(np.int32).reshape(m, 1)
    )
    pT = jnp.swapaxes(s_points.reshape(b, ns, stile, 3), -1, -2)  # (B,ns,3,stile)
    g2 = g_weighted.reshape(b, m, k_num * c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns, nq_sub),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, ss, qq, qsb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 3), lambda bb, ss, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda bb, ss, qq, qsb: (qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k_num * c), lambda bb, ss, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, stile), lambda bb, ss, qq, qsb: (bb, ss, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, stile, c), lambda bb, ss, qq, qsb: (bb, ss, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _agg_bwd_kernel, sigma=float(sigma), r2=float(r2), band=int(band),
        cdtype=jnp.dtype(dtype),
    )
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    g_feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(qstart_blk), jnp.asarray(kp), q_points, bs_per_query, g2, pT)
    return g_feats


def _bwd(radius, sigma, kernel_size, tile, band_width, dtype, res, g):
    """Pallas backward: only s_feats receives gradient (pyramid
    coordinates are pipeline data, never parameters).  Static plans take
    the transposed kernel; dynamic window starts take the forward-geometry
    stack kernel + window scatter-add (round 4 — training can now run the
    narrow dynamic windows)."""
    s_feats, q_points, s_points, starts = res
    g_weighted, _ = g
    n, c = s_feats.shape[-2:]
    if starts is not None:
        g_feats = _transpose_agg_dyn(
            g_weighted, q_points, s_points, starts, n, c, radius, sigma,
            kernel_size, tile, band_width, dtype,
        )
    else:
        g_feats = _transpose_agg(
            g_weighted, q_points, s_points, n, c, radius, sigma, kernel_size,
            tile, band_width, dtype,
        )
    return g_feats.astype(s_feats.dtype), None, None, None


banded_kpconv_aggregate_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# tau variant: reference k-NN semantics (membership {j : d2 <= tau_m}).
# ---------------------------------------------------------------------------


def _agg_kernel_tau(kp_ref, q_ref, pT_ref, f_ref, tau_ref, out_ref, cnt_ref,
                    *, sigma, r2, cdtype):
    """Like _agg_kernel, but membership comes from each query's k-NN
    threshold: aggregation mask = (d2 <= tau) & (d2 <= r2) (influence is
    zero beyond reach anyway — the r2 term only keeps the skip guard
    effective), and the count is the reference's active-row rule
    |{j : d2 <= tau, sum_c f_j > 0}| (kpconv.py:113-116), accumulated via a
    (tile, bch) @ (bch, 1) MXU dot so the per-row activity vector never
    needs a sublane->lane relayout.

    tau_ref: (1, tile, 1) squared thresholds (banded_knn_tau).
    """
    bc = pl.program_id(2)

    @pl.when(bc == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    kpj = kp_ref[...]  # (K, 3)
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
    tau = tau_ref[0]  # (tile, 1)
    k_num = kpj.shape[0]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, bch)

    wtau = (d2 <= tau).astype(jnp.float32)  # (tile, bch)
    wif = wtau * (d2 <= r2).astype(jnp.float32)
    f_raw = f_ref[0, 0]  # (bch, C)
    active = (
        jnp.sum(f_raw.astype(jnp.float32), axis=1, keepdims=True) > 0.0
    ).astype(jnp.float32)  # (bch, 1)
    cnt_ref[0, :, :] += jnp.dot(
        wtau, active, preferred_element_type=jnp.float32
    )

    @pl.when(jnp.sum(wif) > 0.0)
    def _agg():
        f = f_raw.astype(cdtype)
        c = f.shape[-1]
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        kp2 = jnp.sum(kpj * kpj, axis=-1)

        inv_sigma = 1.0 / sigma
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * wif).astype(cdtype)
            acc = jnp.dot(infl, f, preferred_element_type=jnp.float32)
            out_ref[0, :, k * c : (k + 1) * c] += acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def banded_kpconv_aggregate_tau_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    tau: jax.Array,
    kp: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    starts: jax.Array | None = None,
):
    """Fused-kernel twin of the tau (k-NN-semantics) banded aggregation.

    s_feats (B, N, C), q_points (B, M, 3), s_points (B, N, 3),
    tau (B, M) squared k-NN thresholds, kp (K, 3) kernel points (traced —
    per-layer imported dispositions).  Returns (weighted (B, M, K, C) fp32,
    count (B, M) int32 — the reference active-row count).

    ``starts``: optional (B, num_tiles) int32 kNN window starts
    (ops.banded.dynamic_knn_starts) — ``band_width`` is then the full
    window width.  Exact whenever each tile's in-tau rows fit the window
    (kNN sets are Morton-local; coverage measured in tools/knn_window_ab).
    Forward-only: the `.t7` reproduction path never differentiates.
    """
    return _tau_forward(
        s_feats, q_points, s_points, tau, kp, radius, sigma, kernel_size,
        tile, band_width, dtype, starts,
    )


def _tau_forward(s_feats, q_points, s_points, tau, kp, radius, sigma,
                 kernel_size, tile, band_width, dtype, starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    k_num = kp.shape[0]
    # static reach mask, padded 10%: rotations preserve kp norms and the
    # reference's per-load jitter is ~0.01, so the canonical reach bounds
    # every imported disposition; influence is zero beyond each kernel
    # point's own reach, so a generous mask changes nothing
    r2 = (1.1 * kernel_reach(radius, sigma, kernel_size)) ** 2
    if starts is None:
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(s_feats)
    else:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
            s_points, starts
        )
        band_f = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            s_feats, starts
        )
    band_pT = jnp.swapaxes(band_p, -1, -2)
    tau3 = tau.reshape(b, m, 1)

    interpret = jax.devices()[0].platform != "tpu"
    chunked = band >= 1024 and band % _AGG_BCH == 0 and not interpret
    bch = _AGG_BCH if chunked else band
    kernel = functools.partial(
        _agg_kernel_tau, sigma=float(sigma), r2=float(r2),
        cdtype=jnp.dtype(dtype),
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, k_num * c), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, k_num * c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(kp.astype(jnp.float32), q_points, band_pT, band_f, tau3)

    weighted = out.reshape(b, m, k_num, c)
    count = jnp.maximum(cnt[..., 0], 1.0).astype(jnp.int32)
    return weighted, count


def _tau_fwd(s_feats, q_points, s_points, tau, kp, radius, sigma,
             kernel_size, tile, band_width, dtype, starts=None):
    if starts is not None:
        raise NotImplementedError(
            "kNN window starts are forward-only (the .t7 reproduction path "
            "never differentiates); train without kpconv_knn_window_plan"
        )
    out = _tau_forward(
        s_feats, q_points, s_points, tau, kp, radius, sigma, kernel_size,
        tile, band_width, dtype,
    )
    return out, (s_feats, q_points, s_points, tau, kp)


def _agg_bwd_kernel_tau(qsb_ref, kp_ref, q_ref, bs_ref, tau_ref, g_ref,
                        pT_ref, out_ref, *, sigma, r2, band, cdtype):
    """tau twin of _agg_bwd_kernel: forward membership reproduced as
    (d2 <= tau) & (d2 <= r2) & band-window.  tau rides per query like the
    band starts."""
    ss = pl.program_id(1)
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    kpj = kp_ref[...]
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    bs = bs_ref[...]  # (qtile, 1) int32
    tau = tau_ref[0]  # (qtile, 1) f32 — block is (1, qtile, 1), batched
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    k_num = kpj.shape[0]
    stile = pT.shape[-1]
    c = out_ref.shape[-1]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff

    j_abs = ss * stile + jax.lax.broadcasted_iota(jnp.int32, (1, stile), 1)
    maskf = (
        (d2 <= r2) & (d2 <= tau) & (bs <= j_abs) & (j_abs < bs + band)
    ).astype(jnp.float32)

    @pl.when(jnp.sum(maskf) > 0.0)
    def _route():
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        kp2 = jnp.sum(kpj * kpj, axis=-1)

        inv_sigma = 1.0 / sigma
        acc = jnp.zeros((stile, c), jnp.float32)
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * maskf).astype(cdtype)
            gk = g_ref[0, :, k * c : (k + 1) * c].astype(cdtype)
            acc = acc + jax.lax.dot_general(
                infl, gk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, :] += acc


def _transpose_agg_tau(g_weighted, q_points, s_points, tau, kp, n, c, radius,
                       sigma, kernel_size, tile, band_width, dtype):
    """tau twin of _transpose_agg (shared by plain and fused tau VJPs)."""
    b, m = q_points.shape[:2]
    k_num = kp.shape[0]
    r2 = (1.1 * kernel_reach(radius, sigma, kernel_size)) ** 2
    tile_q, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile_q, band, num_tiles)
    stile, ns, q_win, qstart_blk = _bwd_geometry(m, n, tile_q, band, starts)
    nq_sub = q_win // tile_q

    bs_per_query = jnp.asarray(
        starts[np.arange(m) // tile_q].astype(np.int32).reshape(m, 1)
    )
    pT = jnp.swapaxes(s_points.reshape(b, ns, stile, 3), -1, -2)
    g2 = g_weighted.reshape(b, m, k_num * c)
    tau2 = tau.reshape(b, m, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns, nq_sub),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, ss, qq, qsb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 3), lambda bb, ss, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda bb, ss, qq, qsb: (qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda bb, ss, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k_num * c), lambda bb, ss, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, stile), lambda bb, ss, qq, qsb: (bb, ss, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, stile, c), lambda bb, ss, qq, qsb: (bb, ss, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _agg_bwd_kernel_tau, sigma=float(sigma), r2=float(r2), band=int(band),
        cdtype=jnp.dtype(dtype),
    )
    interpret = jax.devices()[0].platform != "tpu"
    g_feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(qstart_blk), kp.astype(jnp.float32), q_points,
        bs_per_query, tau2, g2, pT,
    )
    return g_feats


def _tau_bwd(radius, sigma, kernel_size, tile, band_width, dtype, res, g):
    s_feats, q_points, s_points, tau, kp = res
    g_weighted, _ = g
    n, c = s_feats.shape[-2:]
    g_feats = _transpose_agg_tau(
        g_weighted, q_points, s_points, tau, kp, n, c, radius, sigma,
        kernel_size, tile, band_width, dtype,
    )
    return g_feats.astype(s_feats.dtype), None, None, None, None, None


banded_kpconv_aggregate_tau_pallas.defvjp(_tau_fwd, _tau_bwd)


# ---------------------------------------------------------------------------
# Fused variant: aggregation + kernel-weight contraction in one kernel.
# ---------------------------------------------------------------------------


def _agg_fused_kernel(kp_ref, q_ref, pT_ref, f_ref, w_ref, out_ref, cnt_ref,
                      acc_ref, *, sigma, r2, cdtype):
    """Like _agg_kernel, but the (tile, K*C) influence-weighted sums live in
    a VMEM scratch and the last band chunk contracts them with the reshaped
    (K*C, D) kernel weights in a single MXU dot — the (B, M, K, C) tensor
    never reaches HBM (it is ~300 MB per conv at KITTI scale; the separate
    XLA contraction einsums cost ~16 ms of the eval FPN, tools/fpn_bench).

    Extra refs vs _agg_kernel:
      w_ref:   (K*C, D)      weights, kc-major (same block everywhere)
      out_ref: (1, tile, D)  contracted output
      acc_ref: (tile, K*C)   fp32 scratch (persists across grid steps)
    """
    bc = pl.program_id(2)
    nbc = pl.num_programs(2)

    @pl.when(bc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    kpj = kp_ref[...]  # (K, 3)
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
    k_num = kpj.shape[0]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff

    wif = (d2 <= r2).astype(jnp.float32)
    cnt_ref[0, :, :] += jnp.sum(wif, axis=1, keepdims=True)

    @pl.when(jnp.sum(wif) > 0.0)
    def _agg():
        f = f_ref[0, 0].astype(cdtype)  # (bch, C)
        c = f.shape[-1]
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        kp2 = jnp.sum(kpj * kpj, axis=-1)

        inv_sigma = 1.0 / sigma
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * wif).astype(cdtype)
            acc_ref[:, k * c : (k + 1) * c] += jnp.dot(
                infl, f, preferred_element_type=jnp.float32
            )

    @pl.when(bc == nbc - 1)
    def _contract():
        out_ref[0, :, :] = jnp.dot(
            acc_ref[...].astype(cdtype), w_ref[...].astype(cdtype),
            preferred_element_type=jnp.float32,
        )


def fused_contraction_fits(kernel_size: int, cin: int, cout: int,
                           tile: int = 128, wbytes: int = 4) -> bool:
    """Whether the fused kernel's W block + scratch fit the VMEM budget
    (convs over it fall back to the unfused kernel + XLA einsum).

    ``wbytes``: bytes/element of the weight BLOCK as shipped to the kernel
    (the caller casts W to the compute dtype before the call, so bf16
    compute halves the block).  The budget is kept conservative against
    the ~16 MB scoped-vmem limit: the scratch (tile, K*Cin) accumulator is
    always fp32 and the f/out blocks add a few hundred KB on top."""
    return (
        kernel_size * cin * cout * wbytes + tile * kernel_size * cin * 4
        <= (12 if wbytes == 2 else 6) * 2**20
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def banded_kpconv_fused_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    weights: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    starts: jax.Array | None = None,
):
    """Aggregation fused with the (K, Cin, Cout) weight contraction.

    Returns (out (B, M, D) fp32 — unnormalized: divide by count and add
    bias outside — and count (B, M) int32).  When differentiated, the
    unfused forward runs instead so `weighted` is available as a residual
    for dW (training keeps today's cost; eval takes the fused kernel).
    ``starts``: see banded_kpconv_aggregate_pallas (differentiable).
    """
    return _fused_forward(
        s_feats, q_points, s_points, weights, radius, sigma, kernel_size,
        tile, band_width, dtype, starts,
    )


def _fused_forward(s_feats, q_points, s_points, weights, radius, sigma,
                   kernel_size, tile, band_width, dtype, starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    d_out = weights.shape[-1]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    if starts is None:
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(s_feats)
    else:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
            s_points, starts
        )
        band_f = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            s_feats, starts
        )
    band_pT = jnp.swapaxes(band_p, -1, -2)
    # ship W in the compute dtype: halves the VMEM weight block under bf16
    # (what lets the C=512 convs take the fused kernel, see
    # fused_contraction_fits) and is value-identical to the in-kernel cast
    # the contract step applied anyway
    w2 = weights.reshape(k_num * c, d_out).astype(jnp.dtype(dtype))

    interpret = jax.devices()[0].platform != "tpu"
    chunked = band >= 1024 and band % _AGG_BCH == 0 and not interpret
    bch = _AGG_BCH if chunked else band
    kernel = functools.partial(
        _agg_fused_kernel, sigma=float(sigma), r2=float(r2),
        cdtype=jnp.dtype(dtype),
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_num * c, d_out), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d_out), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, k_num * c), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(kp), q_points, band_pT, band_f, w2)

    count = jnp.maximum(cnt[..., 0], 1.0).astype(jnp.int32)
    return out, count


def _fused_fwd(s_feats, q_points, s_points, weights, radius, sigma,
               kernel_size, tile, band_width, dtype, starts=None):
    # differentiation path: unfused aggregation + XLA einsum, so `weighted`
    # is a residual for dW (mirrors the unfused training path exactly)
    weighted, count = _forward(
        s_feats, q_points, s_points, radius, sigma, kernel_size, tile,
        band_width, dtype, starts,
    )
    cdt = jnp.dtype(dtype)
    out = jnp.einsum(
        "bmkc,kcd->bmd", weighted.astype(cdt), weights.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (out, count), (s_feats, q_points, s_points, weights, weighted, starts)


def _fused_bwd(radius, sigma, kernel_size, tile, band_width, dtype, res, g):
    s_feats, q_points, s_points, weights, weighted, starts = res
    g_out, _ = g  # (B, M, D); count carries no gradient
    n, c = s_feats.shape[-2:]
    cdt = jnp.dtype(dtype)

    g_weighted = jnp.einsum(
        "bmd,kcd->bmkc", g_out.astype(cdt), weights.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    if starts is not None:
        g_feats = _transpose_agg_dyn(
            g_weighted, q_points, s_points, starts, n, c, radius, sigma,
            kernel_size, tile, band_width, dtype,
        )
    else:
        g_feats = _transpose_agg(
            g_weighted, q_points, s_points, n, c, radius, sigma, kernel_size,
            tile, band_width, dtype,
        )
    g_w = jnp.einsum(
        "bmkc,bmd->kcd", weighted.astype(cdt), g_out.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (
        g_feats.astype(s_feats.dtype), None, None,
        g_w.astype(weights.dtype), None,
    )


banded_kpconv_fused_pallas.defvjp(_fused_fwd, _fused_bwd)


def _agg_fused_kernel_tau(kp_ref, q_ref, pT_ref, f_ref, tau_ref, w_ref,
                          out_ref, cnt_ref, acc_ref, *, sigma, r2, cdtype):
    """tau twin of _agg_fused_kernel (see _agg_kernel_tau for the
    membership/count rules)."""
    bc = pl.program_id(2)
    nbc = pl.num_programs(2)

    @pl.when(bc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    kpj = kp_ref[...]
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    tau = tau_ref[0]  # (tile, 1)
    k_num = kpj.shape[0]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff

    wtau = (d2 <= tau).astype(jnp.float32)
    wif = wtau * (d2 <= r2).astype(jnp.float32)
    f_raw = f_ref[0, 0]
    active = (
        jnp.sum(f_raw.astype(jnp.float32), axis=1, keepdims=True) > 0.0
    ).astype(jnp.float32)
    cnt_ref[0, :, :] += jnp.dot(
        wtau, active, preferred_element_type=jnp.float32
    )

    @pl.when(jnp.sum(wif) > 0.0)
    def _agg():
        f = f_raw.astype(cdtype)
        c = f.shape[-1]
        row = -2.0 * jnp.dot(
            kpj, pT, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        col = 2.0 * jnp.dot(
            q, kpj.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        kp2 = jnp.sum(kpj * kpj, axis=-1)

        inv_sigma = 1.0 / sigma
        for k in range(k_num):
            s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
            dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
            infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
            infl = (infl * wif).astype(cdtype)
            acc_ref[:, k * c : (k + 1) * c] += jnp.dot(
                infl, f, preferred_element_type=jnp.float32
            )

    @pl.when(bc == nbc - 1)
    def _contract():
        out_ref[0, :, :] = jnp.dot(
            acc_ref[...].astype(cdtype), w_ref[...].astype(cdtype),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def banded_kpconv_fused_tau_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    weights: jax.Array,
    tau: jax.Array,
    kp: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    starts: jax.Array | None = None,
):
    """tau twin of banded_kpconv_fused_pallas: k-NN-semantics aggregation
    fused with the (K, Cin, Cout) weight contraction.  Returns
    (out (B, M, D) fp32 unnormalized, count (B, M) int32 active-row count).
    ``starts``: optional kNN window starts (see
    banded_kpconv_aggregate_tau_pallas; forward-only).
    """
    return _fused_tau_forward(
        s_feats, q_points, s_points, weights, tau, kp, radius, sigma,
        kernel_size, tile, band_width, dtype, starts,
    )


def _fused_tau_forward(s_feats, q_points, s_points, weights, tau, kp, radius,
                       sigma, kernel_size, tile, band_width, dtype,
                       starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    d_out = weights.shape[-1]
    k_num = kp.shape[0]
    r2 = (1.1 * kernel_reach(radius, sigma, kernel_size)) ** 2
    if starts is None:
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_f = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(s_feats)
    else:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
            s_points, starts
        )
        band_f = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            s_feats, starts
        )
    band_pT = jnp.swapaxes(band_p, -1, -2)
    w2 = weights.reshape(k_num * c, d_out).astype(jnp.dtype(dtype))
    tau3 = tau.reshape(b, m, 1)

    interpret = jax.devices()[0].platform != "tpu"
    chunked = band >= 1024 and band % _AGG_BCH == 0 and not interpret
    bch = _AGG_BCH if chunked else band
    kernel = functools.partial(
        _agg_fused_kernel_tau, sigma=float(sigma), r2=float(r2),
        cdtype=jnp.dtype(dtype),
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, c), lambda bb, tt, bc: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_num * c, d_out), lambda bb, tt, bc: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d_out), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, k_num * c), jnp.float32)],
        interpret=interpret,
    )(kp.astype(jnp.float32), q_points, band_pT, band_f, tau3, w2)

    count = jnp.maximum(cnt[..., 0], 1.0).astype(jnp.int32)
    return out, count


def _fused_tau_fwd(s_feats, q_points, s_points, weights, tau, kp, radius,
                   sigma, kernel_size, tile, band_width, dtype, starts=None):
    if starts is not None:
        raise NotImplementedError(
            "kNN window starts are forward-only (see _tau_fwd)"
        )
    weighted, count = _tau_forward(
        s_feats, q_points, s_points, tau, kp, radius, sigma, kernel_size,
        tile, band_width, dtype,
    )
    cdt = jnp.dtype(dtype)
    out = jnp.einsum(
        "bmkc,kcd->bmd", weighted.astype(cdt), weights.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (out, count), (s_feats, q_points, s_points, weights, tau, kp, weighted)


def _fused_tau_bwd(radius, sigma, kernel_size, tile, band_width, dtype, res, g):
    s_feats, q_points, s_points, weights, tau, kp, weighted = res
    g_out, _ = g
    n, c = s_feats.shape[-2:]
    cdt = jnp.dtype(dtype)

    g_weighted = jnp.einsum(
        "bmd,kcd->bmkc", g_out.astype(cdt), weights.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    g_feats = _transpose_agg_tau(
        g_weighted, q_points, s_points, tau, kp, n, c, radius, sigma,
        kernel_size, tile, band_width, dtype,
    )
    g_w = jnp.einsum(
        "bmkc,bmd->kcd", weighted.astype(cdt), g_out.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return (
        g_feats.astype(s_feats.dtype), None, None,
        g_w.astype(weights.dtype), None, None, None,
    )


banded_kpconv_fused_tau_pallas.defvjp(_fused_tau_fwd, _fused_tau_bwd)
