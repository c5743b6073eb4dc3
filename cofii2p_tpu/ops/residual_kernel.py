"""Fused Pallas TPU kernel for the strided ResidualBlock's band pass.

The strided bottleneck ResidualBlock (reference model/kpconv/modules.py:
162-240) runs TWO banded neighborhood sweeps over the *same* geometry:

  - the strided KPConv aggregates ``unary1(x)`` (Cmid = Cout/4 channels)
    over each query's in-reach band members, then contracts with the
    (K, Cmid, Cmid) kernel weights;
  - the shortcut maxpool (modules.py:231-233 via functional.py:53-66)
    maxes the block INPUT ``x`` (Cin channels) over the same neighborhood.

Both use membership d2 <= kernel_reach(radius, sigma)^2, the same query
tiles, the same support band (static plan or dynamic window starts).  The
round-4 stream bisect put the two kernels at 130.5 of 188 ms/batch under
static bands (~65 of 116 under the w192 serving windows) — and they pay
the band DMA + d2 + membership twice.  This kernel runs the pair in ONE
band pass:

  grid (B, num_tiles, band_chunks, cin_chunks), channel chunk innermost.
  Per band chunk, the cj==0 cell computes d2/membership once into VMEM
  scratch and runs the aggregation K-sweep (features at Cmid) plus the
  in-reach count; every cj cell reuses the stored membership for its
  (tile, bch, cc) masked-select running max (features at Cin).  The last
  band chunk contracts the (tile, K*Cmid) accumulator with the reshaped
  weights (one MXU dot — the (B, M, K, C) tensor never reaches HBM, as in
  kpconv_kernel._agg_fused_kernel) and fixes empty neighborhoods to zero.

Accuracy: the maxpool output is bit-identical to banded_maxpool_pallas
(max is order-free).  The aggregation accumulates 128-row band chunks in
the same order as the chunked aggregation kernel; at bands the unfused
kernel runs whole-band (< 1024) the fp32 partial-sum order differs by the
usual default-precision rounding class (PERF.md "aggregation rounding").
Interpret mode (CPU tests) runs one whole-band chunk and matches the
unfused pair exactly.

Differentiation: custom_vjp whose forward runs the UNFUSED pair
(banded_kpconv_fused_pallas + banded_maxpool_pallas) under jax.vjp — the
training path keeps the existing optimized transposed/dynamic backwards
and tie-even maxpool semantics; only the no-grad (eval/serving) call takes
the fused kernel.
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
from cofii2p_tpu.ops.kpconv_kernel import (
    _band_starts_np,
    _slice_bands,
    banded_kpconv_fused_pallas,
)
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas

_BCH = 128  # band rows per grid cell (shared by the select and the K-sweep)

# Test hook (see maxpool_kernel._FORCE_CHUNKS): interpret mode runs one
# whole-band chunk and non-128-multiple Cin unchunked, which would leave the
# chunked revisit paths untested off-TPU.  Tests set this to (cc, bch).
_FORCE_CHUNKS = None

# Kernel-body variant (perf experiment, tools/resfuse_micro):
#   'scratch'   — d2/membership computed once per band chunk into VMEM
#                 scratch, reused across cin chunks (SMEM wsum guard).
#                 Measured ~45% SLOWER per apply than the pair — the
#                 scratch/SMEM handoff serializes the cell pipeline.
#   'recompute' — membership recomputed per cell exactly like the unfused
#                 maxpool kernel; no scratch/SMEM mediation.  Measured at
#                 parity with the pair (slightly ahead at enc5_1, behind at
#                 enc2_1 where chunked aggregation repeats the K-sweep
#                 setup) — see PERF.md "fused residual band pass".
_VARIANT = "recompute"


def _res_kernel_recompute(kp_ref, q_ref, pT_ref, fa_ref, fm_ref, w_ref,
                          agg_ref, cnt_ref, mp_ref, acc_ref,
                          *, sigma, r2, cdtype):
    """Variant body: per-cell d2/membership recompute (no scratch handoff);
    otherwise identical semantics to _res_kernel."""
    bc = pl.program_id(2)
    cj = pl.program_id(3)
    nbc = pl.num_programs(2)

    @pl.when((bc == 0) & (cj == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    @pl.when(bc == 0)
    def _init_mp():
        mp_ref[...] = jnp.full(mp_ref.shape, -jnp.inf, mp_ref.dtype)

    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    pT = pT_ref[0, 0] - ref.reshape(3, 1)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    wif = (d2 <= r2).astype(jnp.float32)
    wsum = jnp.sum(wif)

    @pl.when(cj == 0)
    def _count():
        cnt_ref[0, :, :] += jnp.sum(wif, axis=1, keepdims=True)

    @pl.when(wsum > 0.0)
    def _pool():
        f = fm_ref[0, 0]
        pen = ((wif[:, :, None] - 1.0) * 1e30).astype(f.dtype)
        cand = f[None, :, :] + pen
        mp_ref[0, :, :] = jnp.maximum(mp_ref[0], jnp.max(cand, axis=1))

    @pl.when((cj == 0) & (wsum > 0.0))
    def _agg():
        kpj = kp_ref[...]
        k_num = kpj.shape[0]
        f = fa_ref[0, 0].astype(cdtype)
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

    @pl.when((bc == nbc - 1) & (cj == 0))
    def _contract():
        agg_ref[0, :, :] = jnp.dot(
            acc_ref[...].astype(cdtype), w_ref[...].astype(cdtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when(bc == nbc - 1)
    def _finish_mp():
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
        fixed = jnp.maximum(mp_ref[0].astype(jnp.float32), -1e30) * hasf
        mp_ref[0, :, :] = fixed.astype(mp_ref.dtype)


def _res_kernel(kp_ref, q_ref, pT_ref, fa_ref, fm_ref, w_ref,
                agg_ref, cnt_ref, mp_ref, acc_ref, wif_ref, wsum_ref,
                *, sigma, r2, cdtype):
    """One (batch, query-tile, band-chunk, cin-chunk) cell.

    kp_ref:  (K, 3)           kernel points (same block everywhere)
    q_ref:   (1, tile, 3)     query coordinates
    pT_ref:  (1, 1, 3, bch)   this band chunk's coordinates, transposed
    fa_ref:  (1, 1, bch, Cmid) conv (unary1-output) features of this chunk
    fm_ref:  (1, 1, bch, cc)  maxpool (block-input) features of this chunk
    w_ref:   (K*Cmid, Dout)   contraction weights, kc-major
    agg_ref: (1, tile, Dout)  contracted conv output (written on last chunk)
    cnt_ref: (1, tile, 1)     in-reach counts (accumulated at cj==0)
    mp_ref:  (1, tile, cc)    running max (revisited over band chunks)
    acc_ref: (tile, K*Cmid)   fp32 aggregation scratch
    wif_ref: (tile, bch)      fp32 membership scratch (written at cj==0)
    wsum_ref:(1, 1)           SMEM scalar: this chunk's in-reach total
    """
    bc = pl.program_id(2)
    cj = pl.program_id(3)
    nbc = pl.num_programs(2)

    @pl.when((bc == 0) & (cj == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    @pl.when(bc == 0)
    def _init_mp():
        mp_ref[...] = jnp.full(mp_ref.shape, -jnp.inf, mp_ref.dtype)

    @pl.when(cj == 0)
    def _geom_and_agg():
        # d2 + membership once per band chunk; cj > 0 cells reuse the
        # stored membership (the ncc-fold d2 recompute is what the separate
        # maxpool kernel pays today)
        kpj = kp_ref[...]  # (K, 3)
        # tile-first centering + HIGHEST-precision cross terms exactly as
        # kpconv_kernel._agg_kernel (see there for the precision rationale)
        ref = q_ref[0, 0:1, :]
        q = q_ref[0] - ref  # (tile, 3)
        pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, bch)
        k_num = kpj.shape[0]

        d2 = None
        for d in range(3):
            diff = q[:, d : d + 1] - pT[d : d + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        wif = (d2 <= r2).astype(jnp.float32)  # (tile, bch)
        wif_ref[...] = wif
        wsum = jnp.sum(wif)
        wsum_ref[0, 0] = wsum
        cnt_ref[0, :, :] += jnp.sum(wif, axis=1, keepdims=True)

        @pl.when(wsum > 0.0)
        def _agg():
            f = fa_ref[0, 0].astype(cdtype)  # (bch, Cmid)
            c = f.shape[-1]
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
                acc_ref[:, k * c : (k + 1) * c] += jnp.dot(
                    infl, f, preferred_element_type=jnp.float32
                )

    # the masked-select running max, in the feature dtype (see
    # maxpool_kernel._maxpool_kernel for the additive-penalty rationale)
    @pl.when(wsum_ref[0, 0] > 0.0)
    def _pool():
        f = fm_ref[0, 0]  # (bch, cc)
        pen = ((wif_ref[...][:, :, None] - 1.0) * 1e30).astype(f.dtype)
        cand = f[None, :, :] + pen
        mp_ref[0, :, :] = jnp.maximum(mp_ref[0], jnp.max(cand, axis=1))

    @pl.when((bc == nbc - 1) & (cj == 0))
    def _contract():
        agg_ref[0, :, :] = jnp.dot(
            acc_ref[...].astype(cdtype), w_ref[...].astype(cdtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when(bc == nbc - 1)
    def _finish_mp():
        # cnt is complete: this cell's own cj==0 accumulation (bc==nbc-1)
        # ran above, earlier chunks ran in prior grid steps
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
        fixed = jnp.maximum(mp_ref[0].astype(jnp.float32), -1e30) * hasf
        mp_ref[0, :, :] = fixed.astype(mp_ref.dtype)


def residual_fused_fits(kernel_size: int, cmid: int, dout: int, cin: int,
                        band: int, tile: int = 128, wbytes: int = 4,
                        fbytes: int = 4) -> bool:
    """Whether the fused residual kernel's VMEM residents fit the budget:
    weight block + fp32 aggregation scratch + membership scratch + the
    (tile, bch, cc) select temporary.  Callers fall back to the separate
    aggregation + maxpool kernels when this fails (e.g. the fp32
    static-band enc5_1 shape).

    ``wbytes``: bytes/element of the shipped weight block (compute dtype);
    ``fbytes``: bytes/element of the maxpool features (the select chain
    runs in the feature dtype)."""
    cc = 128 if cin % 128 == 0 else cin
    bch = _BCH if band % _BCH == 0 else band
    need = (
        kernel_size * cmid * dout * wbytes      # weight block
        + tile * kernel_size * cmid * 4         # acc scratch (fp32)
        + tile * bch * 4                        # membership scratch
        + tile * bch * cc * fbytes              # select temporary
        + bch * cmid * 4                        # fa chain temporaries
    )
    # leave ~5 MB of the ~16 MB VMEM for double-buffered in/out blocks
    return need <= 11 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def banded_residual_fused_pallas(
    mp_feats: jax.Array,
    agg_feats: jax.Array,
    weights: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    tie_even: bool = True,
    starts: jax.Array | None = None,
):
    """Fused strided-ResidualBlock band pass: KPConv aggregation +
    contraction AND the shortcut maxpool in one Pallas sweep.

    mp_feats (B, N, Cin): block-input features the shortcut maxpools.
    agg_feats (B, N, Cmid): unary1 output the conv aggregates.
    weights (K, Cmid, Dout): conv kernel weights.
    q_points (B, M, 3), s_points (B, N, 3); ``starts``: optional
    (B, num_tiles) dynamic window starts (band_width = window width).

    Returns (conv_out (B, M, Dout) fp32 — unnormalized: divide by count
    and add bias outside — count (B, M) int32, shortcut (B, M, Cin) in
    mp_feats' dtype).

    Membership for BOTH outputs is d2 <= kernel_reach(radius, sigma)^2 —
    exactly the pair the strided block runs today (models/kpconv.py
    ResidualBlock: r_active == kernel reach).  When differentiated, the
    unfused pair runs instead so the existing transposed/dynamic backwards
    and tie-even gradient semantics apply unchanged.
    """
    return _res_forward(
        mp_feats, agg_feats, weights, q_points, s_points, radius, sigma,
        kernel_size, tile, band_width, dtype, starts,
    )


def _res_forward(mp_feats, agg_feats, weights, q_points, s_points, radius,
                 sigma, kernel_size, tile, band_width, dtype, starts=None):
    b, m = q_points.shape[:2]
    n, cin = mp_feats.shape[-2:]
    cmid = agg_feats.shape[-1]
    d_out = weights.shape[-1]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    if starts is None:
        tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
        starts_np = _band_starts_np(m, n, tile, band, num_tiles)
        band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
        band_fa = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(agg_feats)
        band_fm = jax.vmap(lambda f: _slice_bands(f, starts_np, band))(mp_feats)
    else:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
            s_points, starts
        )
        band_fa = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            agg_feats, starts
        )
        band_fm = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
            mp_feats, starts
        )
    band_pT = jnp.swapaxes(band_p, -1, -2)  # (B, nt, 3, band)
    w2 = weights.reshape(k_num * cmid, d_out).astype(jnp.dtype(dtype))

    cc = 128 if cin % 128 == 0 else cin  # Mosaic lane-dim rule
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests interpret
    # one whole-band chunk in interpret mode (Python per cell; single-chunk
    # fp32 sums match the unfused interpret kernels exactly)
    bch = band if interpret else (_BCH if band % _BCH == 0 else band)
    if _FORCE_CHUNKS is not None:
        fc, fb = _FORCE_CHUNKS
        cc, bch = fc or cc, fb or bch
        assert cin % cc == 0 and band % bch == 0, (cin, cc, band, bch)
    body = _res_kernel if _VARIANT == "scratch" else _res_kernel_recompute
    kernel = functools.partial(
        body, sigma=float(sigma), r2=float(r2), cdtype=jnp.dtype(dtype),
    )
    scratches = [pltpu.VMEM((tile, k_num * cmid), jnp.float32)]
    if _VARIANT == "scratch":
        scratches += [
            pltpu.VMEM((tile, bch), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ]
    agg, cnt, mp = pl.pallas_call(
        kernel,
        grid=(b, num_tiles, band // bch, cin // cc),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt, bc, cj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt, bc, cj: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, bc, cj: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cmid), lambda bb, tt, bc, cj: (bb, tt, bc, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, bc, cj: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_num * cmid, d_out), lambda bb, tt, bc, cj: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d_out), lambda bb, tt, bc, cj: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, bc, cj: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cc), lambda bb, tt, bc, cj: (bb, tt, cj), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, m, cin), mp_feats.dtype),
        ],
        scratch_shapes=scratches,
        interpret=interpret,
    )(jnp.asarray(kp), q_points, band_pT, band_fa, band_fm, w2)

    count = jnp.maximum(cnt[..., 0], 1.0).astype(jnp.int32)
    return agg, count, mp


def _res_fwd(mp_feats, agg_feats, weights, q_points, s_points, radius, sigma,
             kernel_size, tile, band_width, dtype, tie_even, starts=None):
    # Differentiation path: the unfused custom_vjp pair, so training keeps
    # the optimized transposed/dynamic backwards and tie-even semantics.
    # q/s_points and starts ride the closure — they are pipeline data and
    # receive no gradient (as in the unfused ops).
    r_active = kernel_reach(radius, sigma, kernel_size)

    def unfused(mf, af, w):
        out, count = banded_kpconv_fused_pallas(
            af, q_points, s_points, w, radius, sigma, kernel_size, tile,
            band_width, dtype, starts,
        )
        mp = banded_maxpool_pallas(
            mf, q_points, s_points, r_active, tile, band_width, tie_even,
            starts,
        )
        return out, count, mp

    primal, vjp_fn = jax.vjp(unfused, mp_feats, agg_feats, weights)
    return primal, vjp_fn


def _res_bwd(radius, sigma, kernel_size, tile, band_width, dtype, tie_even,
             vjp_fn, g):
    g_mp_feats, g_agg_feats, g_weights = vjp_fn(g)
    return g_mp_feats, g_agg_feats, g_weights, None, None, None


banded_residual_fused_pallas.defvjp(_res_fwd, _res_bwd)
