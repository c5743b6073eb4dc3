"""Fused Pallas TPU kernel for the banded neighborhood maxpool.

The XLA banded maxpool (ops/banded.py::banded_maxpool) is the strided
ResidualBlock's shortcut path (reference functional.py:53-66 maxes over kNN
rows; the banded twin maxes over in-radius band members).  Measured at B=8
KITTI scale it costs 143 ms across the four strided blocks — 56% of the
whole eval pipeline — because XLA materializes the (tile, band, cchunk)
masked select in HBM for every channel chunk (tools/fpn_bench.py).  This
kernel keeps the masked running max in VMEM.

VMEM discipline: a full (tile, band, C) select is up to ~150 MB, and even
an in-kernel Python sweep fails — Mosaic stack-allocates the unrolled
iterations' temporaries concurrently (measured 54 MB at the enc5 shape).
So both sweeps ride the *grid* instead: channels and band chunks are grid
axes, the output block is revisited with a running max, and each cell
holds exactly one (tile, BCH, cc) masked-select temporary.

Masking is arithmetic, not boolean: Mosaic cannot insert minor dims on
1-bit vectors, so in-radius membership becomes an fp32 additive penalty
(in: +0, the value stays bit-exact; out: -1e30, never the max of any real
feature).  An in-radius count rides along as a second output; the final
band chunk converts empty neighborhoods to zeros (shadow-row semantics,
like the reference).

Backward (custom_vjp, also Pallas): transposed over support tiles with the
same query-window/scalar-prefetch plan as the aggregation backward
(ops/kpconv_kernel.py), the query rows swept by a fourth grid axis —
gradient is routed to every band member whose feature equals the forward
max (`f == out`).  Exact float ties are NOT measure-zero for this
pipeline: `resample_fixed` pads under-full clouds by duplicating points
(reference kitti.py:168-180 does the same via np.random.choice with
replacement), and duplicates share coordinates AND features, so routing
the full cotangent to each tie would amplify the summed gradient N-fold.
A count pass (`_match_count`, forward grid geometry) therefore divides
the cotangent by the per-(query, channel) number of ties before routing —
each tie receives g/cnt, exactly XLA autodiff's even-split semantics
(the reference's torch.max routes to a single argmax instead; the total
mass into the duplicated point is identical, see PARITY.md).
`tie_even=False` skips the count pass (full routing, the pre-round-3
behavior) for A/B measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cofii2p_tpu.ops.banded import _band_geometry, _slice_bands_dyn
from cofii2p_tpu.ops.kpconv_kernel import (
    _band_starts_np,
    _bwd_geometry,
    _slice_bands,
)

_BCH = 128  # band rows per forward grid cell
_QCH = 32  # query rows per backward grid cell

# Test hook: interpret mode (CPU) normally runs one full-band chunk (Python
# per grid cell is slow) and non-128-multiple C unchunked, which would leave
# the chunked revisit/accumulation paths — the paths production C=128/256/512
# actually takes — untested off-TPU.  Tests set this to (cc, bch) to force
# channel/band chunk sizes; None (production) keeps the rules below.
_FORCE_CHUNKS = None


def _row_chunk(total: int) -> int:
    """Grid-axis row chunk: Mosaic wants lane-dim blocks divisible by 128
    (or the full dim), and the (tile, chunk, cc) select temporary must stay
    a few MB."""
    return _BCH if total % _BCH == 0 else total


def _maxpool_kernel(q_ref, pT_ref, f_ref, out_ref, cnt_ref, *, r2):
    """One (batch, query-tile, channel-chunk, band-chunk) cell.

    q_ref:  (1, tile, 3)      query coordinates
    pT_ref: (1, 1, 3, bch)    this band chunk's coordinates, transposed
    f_ref:  (1, 1, bch, cc)   this band chunk's features
    out_ref:(1, tile, cc)     running max (revisited over band chunks)
    cnt_ref:(1, tile, 1)      running in-radius count (accumulated at cj==0)
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
    f = f_ref[0, 0]  # (bch, cc)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, bch)
    wi = (d2 <= r2).astype(jnp.float32)

    @pl.when(cj == 0)
    def _count():
        cnt_ref[0, :, :] += jnp.sum(wi, axis=1, keepdims=True)

    # data-dependent skip: in-radius rows concentrate in a few chunks of the
    # band (its width covers rare Morton discontinuities), so most cells
    # have nothing to pool — the (tile, bch, cc) select is ~98% of the cost
    # and runs only when this chunk holds at least one in-radius point
    @pl.when(jnp.sum(wi) > 0.0)
    def _pool():
        # The select chain runs in the FEATURE dtype (bf16 features give a
        # bf16 chain, exact: bf16 max of bf16 values; -1e30 is bf16-
        # representable).  The mask rides as an additive penalty — Mosaic
        # cannot relayout 1-bit vectors into minor dims.  (An 8-row
        # sub-step sweep of the band measured identical to this one-shot
        # select: the op is VPU-throughput-bound, not VMEM-bound.)
        cdt = f.dtype
        pen = ((wi[:, :, None] - 1.0) * 1e30).astype(cdt)  # (tile, bch, 1)
        cand = f[None, :, :] + pen  # (tile, bch, cc)
        pooled = jnp.maximum(out_ref[0], jnp.max(cand, axis=1))
        out_ref[0, :, :] = pooled

    @pl.when(bc == nbc - 1)
    def _finish():
        # empty neighborhoods -> zeros; cnt is complete (cj==0 sweeps first
        # under the (.., cj, bc) grid order).  Arithmetic, not `where` — the
        # (tile, 1) bool lane-broadcast trips Mosaic's 1-bit relayout.
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)  # (tile, 1)
        fixed = (
            jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
        )  # all-empty -> -1e30*0 = 0
        out_ref[0, :, :] = fixed.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def banded_maxpool_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    r_active: float,
    tile: int = 128,
    band_width: int = 1024,
    tie_even: bool = True,
    starts: jax.Array | None = None,
):
    """Fused-kernel twin of ops.banded.banded_maxpool (batched).

    s_feats (B, N, C), q_points (B, M, 3), s_points (B, N, 3) ->
    (B, M, C) in the dtype of ``s_feats``.

    ``tie_even`` (backward only): divide the routed gradient by the
    per-(query, channel) tie count so exact-duplicate support rows (the
    ``resample_fixed`` padding) split the cotangent like XLA autodiff
    instead of each receiving it in full.

    ``starts``: optional (B, num_tiles) int32 dynamic window starts
    (ops.banded.dynamic_band_starts); band_width is then the full window
    width.  Differentiable (round 4): the backward takes a forward-geometry
    stack kernel + window scatter-add instead of the static transposed plan.
    """
    return _forward(
        s_feats, q_points, s_points, r_active, tile, band_width, starts
    )


def _forward(s_feats, q_points, s_points, r_active, tile, band_width, starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    r2 = float(r_active) ** 2
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

    # Mosaic lane-dim blocks must be 128-multiples or the full dim; a
    # non-128-multiple C therefore runs unchunked
    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    # interpret mode pays Python per grid cell — one full-band chunk there
    bch = band if interpret else _row_chunk(band)
    if _FORCE_CHUNKS is not None:
        fc, fb = _FORCE_CHUNKS
        cc, bch = fc or cc, fb or bch
        assert c % cc == 0 and band % bch == 0, (c, cc, band, bch)
    out, _ = pl.pallas_call(
        functools.partial(_maxpool_kernel, r2=r2),
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


def _fwd(s_feats, q_points, s_points, r_active, tile, band_width, tie_even, starts=None):
    out = _forward(
        s_feats, q_points, s_points, r_active, tile, band_width, starts
    )
    return out, (s_feats, q_points, s_points, out, starts)


def _count_kernel(q_ref, pT_ref, f_ref, thr_ref, o_ref, cnt_ref):
    """One (batch, query-tile, channel-chunk, band-chunk) cell of the
    tie-count pass: cnt[m, c] = |{j in band, d2 <= thr_m : f[j, c] ==
    out[m, c]}| — the denominator that turns the backward's
    route-to-every-tie into XLA autodiff's even split.

    Same grid geometry and tile-first centering as the forward kernel, so
    the d2 <= thr membership is bit-identical to the forward's.  thr_ref
    (1, tile, 1) carries r2 (radius variant, broadcast) or tau (kNN).
    """
    bc = pl.program_id(3)

    @pl.when(bc == 0)
    def _init():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    f = f_ref[0, 0].astype(jnp.float32)  # (bch, cc)
    o = o_ref[0].astype(jnp.float32)  # (tile, cc)
    thr = thr_ref[0]  # (tile, 1)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    wi = (d2 <= thr).astype(jnp.float32)  # (tile, bch)

    @pl.when(jnp.sum(wi) > 0.0)
    def _count():
        # fold membership into the equality as an fp32 shift, as in the
        # routing kernel: a shifted max can never equal a finite feature
        shift = (1.0 - wi[:, :, None]) * 1e30
        eq = f[None, :, :] == (o[:, None, :] + shift)  # (tile, bch, cc)
        cnt_ref[0, :, :] += jnp.sum(
            jnp.where(eq, 1.0, 0.0), axis=1
        )


def _match_count(s_feats, q_points, s_points, thr, out, tile, band_width,
                 starts=None):
    """Per-(query, channel) count of band members tied at the forward max.

    thr: (B, M) squared-distance membership thresholds (full r2 for the
    radius variant, tau for the kNN variant).  Returns (B, M, C) fp32,
    >= 1 wherever the neighborhood is non-empty.  ``starts``: optional
    (B, num_tiles) dynamic window starts (forward geometry must match the
    forward pass exactly, so the dyn slicing mirrors _forward).
    """
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
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
    thr3 = thr.reshape(b, m, 1).astype(jnp.float32)

    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"
    bch = band if interpret else _row_chunk(band)
    if _FORCE_CHUNKS is not None:
        fc, fb = _FORCE_CHUNKS
        cc, bch = fc or cc, fb or bch
        assert c % cc == 0 and band % bch == 0, (c, cc, band, bch)
    return pl.pallas_call(
        _count_kernel,
        grid=(b, num_tiles, c // cc, band // bch),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, cj, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        interpret=interpret,
    )(q_points, band_pT, band_f, thr3, out)


def _maxpool_bwd_kernel(
    qsb_ref, q_ref, tref_ref, bs_ref, g_ref, o_ref, pT_ref, fs_ref, out_ref,
    *, r2, band
):
    """One (batch, support-tile, channel-chunk, query-chunk) cell of the
    transposed maxpool: out[j, c] += sum_m mask[m, j] * (fs[j, c] == o[m, c])
    * g[m, c].

    qsb_ref: (ns,)             scalar-prefetch query-window chunk starts
                               (in units of QCH-row blocks)
    q_ref:   (1, qch, 3)       query coordinates of this chunk
    tref_ref:(1, 1, 1, 3)      first query of this chunk's enclosing FORWARD
                               tile — centering on it makes the d2 <= r2
                               membership bit-identical to the forward's
                               (centering on the chunk's own first row can
                               flip ulp-boundary points and silently drop a
                               query's max gradient)
    bs_ref:  (qch, 1)          each query's forward band start (absolute)
    g_ref:   (1, qch, cc)      output cotangent
    o_ref:   (1, qch, cc)      forward output (max values)
    pT_ref:  (1, 1, 3, stile)  support coordinates, transposed
    fs_ref:  (1, 1, stile, cc) support features of this tile
    out_ref: (1, stile, cc)    feature gradient (revisited over qq)
    """
    ss = pl.program_id(1)
    qq = pl.program_id(3)

    @pl.when(qq == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    ref = tref_ref[0, 0]  # (1, 3)
    q = q_ref[0] - ref  # (qch, 3)
    bs = bs_ref[...]  # (qch, 1)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, stile)
    fs = fs_ref[0, 0].astype(jnp.float32)  # (stile, cc)
    o = o_ref[0].astype(jnp.float32)  # (qch, cc)
    g = g_ref[0].astype(jnp.float32)  # (qch, cc)
    stile = pT.shape[-1]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (qch, stile)
    j_abs = ss * stile + jax.lax.broadcasted_iota(jnp.int32, (1, stile), 1)
    mask = (d2 <= r2) & (bs <= j_abs) & (j_abs < bs + band)  # (qch, stile)

    maskf = mask.astype(jnp.float32)

    # same data-dependent skip as the forward kernel: most (query-chunk,
    # support-tile) cells share no in-radius pair
    @pl.when(jnp.sum(maskf) > 0.0)
    def _route():
        # fold the mask into the equality as an fp32 shift — Mosaic cannot
        # insert minor dims on 1-bit vectors, and a shifted max value can
        # never equal a real (finite) feature
        shift = (1.0 - maskf[:, :, None]) * 1e30
        eq = fs[None, :, :] == (o[:, None, :] + shift)  # (qch, stile, cc)
        out_ref[0, :, :] += jnp.sum(
            jnp.where(eq, g[:, None, :], 0.0), axis=0
        )


def _mp_bwd_dyn_kernel(q_ref, pT_ref, f_ref, g_ref, o_ref, out_ref, *, r2):
    """One (batch, query-tile, channel-chunk, band-chunk) cell of the
    FORWARD-GEOMETRY maxpool backward (dynamic windows): the per-tile
    gradient STACK chunk out[j, c] = sum_m wi[m, j] * (f[j, c] == o[m, c])
    * g[m, c] — disjoint blocks per (tt, cj, bc), scatter-added back to
    (N, C) by _scatter_band_stacks (see _agg_bwd_dyn_kernel for why the
    static transposed plan cannot serve data-dependent window starts)."""
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    f = f_ref[0, 0].astype(jnp.float32)  # (bch, cc)
    o = o_ref[0].astype(jnp.float32)  # (tile, cc)
    g = g_ref[0].astype(jnp.float32)  # (tile, cc)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, bch)
    wi = (d2 <= r2).astype(jnp.float32)

    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.sum(wi) > 0.0)
    def _route():
        shift = (1.0 - wi[:, :, None]) * 1e30
        eq = f[None, :, :] == (o[:, None, :] + shift)  # (tile, bch, cc)
        out_ref[0, 0, :, :] = jnp.sum(
            jnp.where(eq, g[:, None, :], 0.0), axis=0
        )


def _bwd_dyn(s_feats, q_points, s_points, out, starts, g, r2, tile, band_width):
    """Dynamic-window maxpool backward: forward-geometry gradient stack +
    window scatter-add."""
    from cofii2p_tpu.ops.kpconv_kernel import _scatter_band_stacks

    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    tile = min(tile, m)
    while m % tile:
        tile //= 2
    num_tiles = m // tile
    band = min(band_width, n)
    band_p = jax.vmap(lambda p, st: _slice_bands_dyn(p, st, band))(
        s_points, starts
    )
    band_pT = jnp.swapaxes(band_p, -1, -2)
    band_f = jax.vmap(lambda f, st: _slice_bands_dyn(f, st, band))(
        s_feats, starts
    )

    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"
    bch = band if interpret else _row_chunk(band)
    if _FORCE_CHUNKS is not None:
        fc, fb = _FORCE_CHUNKS
        cc, bch = fc or cc, fb or bch
        assert c % cc == 0 and band % bch == 0, (c, cc, band, bch)
    g_stack = pl.pallas_call(
        functools.partial(_mp_bwd_dyn_kernel, r2=r2),
        grid=(b, num_tiles, c // cc, band // bch),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, cj, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cc), lambda bb, tt, cj, bc: (bb, tt, cj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles, band, c), jnp.float32),
        interpret=interpret,
    )(q_points, band_pT, band_f, g.astype(jnp.float32), out.astype(jnp.float32))
    return _scatter_band_stacks(g_stack, starts, n)


def _bwd(r_active, tile, band_width, tie_even, res, g):
    """Pallas backward: only s_feats receives gradient (the pyramid
    coordinates are pipeline data, never parameters).  Static plans take
    the transposed kernel; dynamic window starts take the forward-geometry
    stack kernel + scatter-add (round 4)."""
    s_feats, q_points, s_points, out, starts = res
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    r2 = float(r_active) ** 2
    if tie_even:
        thr = jnp.full((b, m), r2, jnp.float32)
        cnt = _match_count(
            s_feats, q_points, s_points, thr, out, tile, band_width, starts
        )
        g = g / jnp.maximum(cnt, 1.0)
    if starts is not None:
        g_dyn = _bwd_dyn(
            s_feats, q_points, s_points, out, starts, g, r2, tile, band_width
        )
        return g_dyn.astype(s_feats.dtype), None, None, None
    tile_q, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile_q, band, num_tiles)
    stile, ns, q_win, qstart_blk = _bwd_geometry(m, n, tile_q, band, starts)

    # query rows are swept in QCH-row grid blocks (the full-window select
    # temporary would not fit VMEM); window starts are tile_q-aligned, so
    # re-expressing them in QCH units is exact
    qch = _QCH
    while tile_q % qch:
        qch //= 2
    sub = tile_q // qch
    nq_sub = (q_win // tile_q) * sub
    qstart_sub = (qstart_blk.astype(np.int64) * sub).astype(np.int32)

    cc = 128 if c % 128 == 0 else c  # Mosaic lane-dim rule (see _forward)
    if _FORCE_CHUNKS is not None and _FORCE_CHUNKS[0]:
        cc = _FORCE_CHUNKS[0]
        assert c % cc == 0, (c, cc)
    nc = c // cc

    bs_per_query = jnp.asarray(
        starts[np.arange(m) // tile_q].astype(np.int32).reshape(m, 1)
    )
    pT = jnp.swapaxes(s_points.reshape(b, ns, stile, 3), -1, -2)  # (B,ns,3,stile)
    fs = s_feats.reshape(b, ns, stile, c)
    # per-QCH-chunk reference row = first query of the chunk's enclosing
    # forward tile (bit-identical centering with the forward kernel)
    tref_idx = (np.arange(m // qch) * qch // tile_q) * tile_q
    # (B, m//qch, 1, 3): the trailing (1, 3) equals the block shape, which is
    # what Mosaic's last-two-dims rule requires
    tile_refs = q_points[:, tref_idx, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns, nc, nq_sub),
        in_specs=[
            pl.BlockSpec((1, qch, 3), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 3), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qch, 1), lambda bb, ss, cj, qq, qsb: (qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qch, cc), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qch, cc), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, stile), lambda bb, ss, cj, qq, qsb: (bb, ss, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, stile, cc), lambda bb, ss, cj, qq, qsb: (bb, ss, 0, cj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, stile, cc), lambda bb, ss, cj, qq, qsb: (bb, ss, cj), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_maxpool_bwd_kernel, r2=r2, band=int(band))
    interpret = jax.devices()[0].platform != "tpu"
    g_flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(qstart_sub), q_points, tile_refs, bs_per_query,
        g.astype(jnp.float32), out.astype(jnp.float32), pT, fs,
    )
    return g_flat.astype(s_feats.dtype), None, None, None


banded_maxpool_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# tau variant: reference k-NN maxpool semantics (membership {j : d2 <= tau},
# no radius mask — functional.py:53-66 maxes over all H kNN rows regardless
# of distance).
# ---------------------------------------------------------------------------


def _maxpool_kernel_tau(q_ref, pT_ref, f_ref, tau_ref, out_ref, cnt_ref):
    """tau twin of _maxpool_kernel; tau_ref (1, tile, 1) squared k-NN
    thresholds replace the static r2."""
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
    f = f_ref[0, 0]
    tau = tau_ref[0]  # (tile, 1)

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    wi = (d2 <= tau).astype(jnp.float32)

    @pl.when(cj == 0)
    def _count():
        cnt_ref[0, :, :] += jnp.sum(wi, axis=1, keepdims=True)

    @pl.when(jnp.sum(wi) > 0.0)
    def _pool():
        cdt = f.dtype
        pen = ((wi[:, :, None] - 1.0) * 1e30).astype(cdt)
        cand = f[None, :, :] + pen
        pooled = jnp.maximum(out_ref[0], jnp.max(cand, axis=1))
        out_ref[0, :, :] = pooled

    @pl.when(bc == nbc - 1)
    def _finish():
        hasf = (cnt_ref[0] > 0.0).astype(jnp.float32)
        fixed = jnp.maximum(out_ref[0].astype(jnp.float32), -1e30) * hasf
        out_ref[0, :, :] = fixed.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_maxpool_tau_pallas(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    tau: jax.Array,
    tile: int = 128,
    band_width: int = 1024,
    tie_even: bool = True,
    starts: jax.Array | None = None,
):
    """tau twin of banded_maxpool_pallas: membership from each query's
    squared k-NN threshold (banded_knn_tau).  tau (B, M).
    ``tie_even``: see banded_maxpool_pallas.  ``starts``: optional kNN
    window starts (ops.banded.dynamic_knn_starts; band_width = window
    width; forward-only — the `.t7` path never differentiates)."""
    return _tau_forward(
        s_feats, q_points, s_points, tau, tile, band_width, starts
    )


def _tau_forward(s_feats, q_points, s_points, tau, tile, band_width,
                 starts=None):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
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

    cc = 128 if c % 128 == 0 else c
    interpret = jax.devices()[0].platform != "tpu"
    bch = band if interpret else _row_chunk(band)
    if _FORCE_CHUNKS is not None:
        fc, fb = _FORCE_CHUNKS
        cc, bch = fc or cc, fb or bch
        assert c % cc == 0 and band % bch == 0, (c, cc, band, bch)
    out, _ = pl.pallas_call(
        _maxpool_kernel_tau,
        grid=(b, num_tiles, c // cc, band // bch),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bch), lambda bb, tt, cj, bc: (bb, tt, 0, bc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bch, cc), lambda bb, tt, cj, bc: (bb, tt, bc, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt, cj, bc: (bb, tt, 0), memory_space=pltpu.VMEM),
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
    )(q_points, band_pT, band_f, tau3)
    return out


def _tau_fwd(s_feats, q_points, s_points, tau, tile, band_width, tie_even,
             starts=None):
    if starts is not None:
        raise NotImplementedError(
            "kNN window starts are forward-only (the .t7 reproduction path "
            "never differentiates)"
        )
    out = _tau_forward(s_feats, q_points, s_points, tau, tile, band_width)
    return out, (s_feats, q_points, s_points, tau, out)


def _maxpool_bwd_kernel_tau(
    qsb_ref, q_ref, tref_ref, bs_ref, tau_ref, g_ref, o_ref, pT_ref, fs_ref,
    out_ref, *, band
):
    """tau twin of _maxpool_bwd_kernel: membership (d2 <= tau) & band-window
    (no radius mask)."""
    ss = pl.program_id(1)
    qq = pl.program_id(3)

    @pl.when(qq == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    ref = tref_ref[0, 0]
    q = q_ref[0] - ref
    bs = bs_ref[...]
    tau = tau_ref[0]  # (qch, 1) — block is (1, qch, 1), batched
    pT = pT_ref[0, 0] - ref.reshape(3, 1)
    fs = fs_ref[0, 0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    stile = pT.shape[-1]

    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    j_abs = ss * stile + jax.lax.broadcasted_iota(jnp.int32, (1, stile), 1)
    mask = (d2 <= tau) & (bs <= j_abs) & (j_abs < bs + band)

    maskf = mask.astype(jnp.float32)

    @pl.when(jnp.sum(maskf) > 0.0)
    def _route():
        shift = (1.0 - maskf[:, :, None]) * 1e30
        eq = fs[None, :, :] == (o[:, None, :] + shift)
        out_ref[0, :, :] += jnp.sum(
            jnp.where(eq, g[:, None, :], 0.0), axis=0
        )


def _tau_bwd(tile, band_width, tie_even, res, g):
    s_feats, q_points, s_points, tau, out = res
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    if tie_even:
        cnt = _match_count(
            s_feats, q_points, s_points, tau, out, tile, band_width
        )
        g = g / jnp.maximum(cnt, 1.0)
    tile_q, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    starts = _band_starts_np(m, n, tile_q, band, num_tiles)
    stile, ns, q_win, qstart_blk = _bwd_geometry(m, n, tile_q, band, starts)

    qch = _QCH
    while tile_q % qch:
        qch //= 2
    sub = tile_q // qch
    nq_sub = (q_win // tile_q) * sub
    qstart_sub = (qstart_blk.astype(np.int64) * sub).astype(np.int32)

    cc = 128 if c % 128 == 0 else c
    if _FORCE_CHUNKS is not None and _FORCE_CHUNKS[0]:
        cc = _FORCE_CHUNKS[0]
        assert c % cc == 0, (c, cc)
    nc = c // cc

    bs_per_query = jnp.asarray(
        starts[np.arange(m) // tile_q].astype(np.int32).reshape(m, 1)
    )
    pT = jnp.swapaxes(s_points.reshape(b, ns, stile, 3), -1, -2)
    fs = s_feats.reshape(b, ns, stile, c)
    tref_idx = (np.arange(m // qch) * qch // tile_q) * tile_q
    tile_refs = q_points[:, tref_idx, None, :]
    tau2 = tau.reshape(b, m, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns, nc, nq_sub),
        in_specs=[
            pl.BlockSpec((1, qch, 3), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 3), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qch, 1), lambda bb, ss, cj, qq, qsb: (qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qch, 1), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qch, cc), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qch, cc), lambda bb, ss, cj, qq, qsb: (bb, qsb[ss] + qq, cj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, stile), lambda bb, ss, cj, qq, qsb: (bb, ss, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, stile, cc), lambda bb, ss, cj, qq, qsb: (bb, ss, 0, cj), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, stile, cc), lambda bb, ss, cj, qq, qsb: (bb, ss, cj), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_maxpool_bwd_kernel_tau, band=int(band))
    interpret = jax.devices()[0].platform != "tpu"
    g_flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(qstart_sub), q_points, tile_refs, bs_per_query, tau2,
        g.astype(jnp.float32), out.astype(jnp.float32), pT, fs,
    )
    return g_flat.astype(s_feats.dtype), None, None, None, None


banded_maxpool_tau_pallas.defvjp(_tau_fwd, _tau_bwd)
