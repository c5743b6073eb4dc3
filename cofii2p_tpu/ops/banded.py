"""Banded radius-neighborhood aggregation — the TPU-native KPConv path.

The reference implements point convolutions as kNN(k=128) index maps built on
CPU (/root/reference/model/kpconv/preprocess_data.py:74-99) followed by
per-row neighbor gathers on GPU (kpconv.py:92/104).  On TPU the gathers are
the whole cost: random-access row gathers run at ~8 ns/row regardless of
dtype (PERF.md), and the FPN issues ~20M of them per frame.

This module removes the gathers (and the kNN maps) entirely by exploiting
two facts:

1. every pyramid level is Morton (Z-order) sorted (ops/pyramid.py), so the
   points within a convolution's influence radius of a *contiguous tile of
   queries* sit — almost surely — inside a *contiguous index band* of the
   support level;
2. KPConv's kernel-point influence is exactly zero beyond
   ``max_k |kp_k| + sigma`` (the linear correlation hits 0 at distance sigma
   from each kernel point, reference kpconv.py:97-100), so a *radius*
   neighborhood reproduces the math of the reference's kNN neighborhood for
   every neighbor that matters — the reference's k=128 is itself an
   approximation of the radius neighborhoods of the original KPConv paper.

So each query tile loads one contiguous band of support points/features with
``lax.dynamic_slice`` (a block copy, not a gather), computes the influence of
every band point on the fly from coordinates, and contracts influence x
features on the MXU.  Everything is static-shape and scan-based; there is no
index map anywhere.

Semantics (documented deviation from the reference, not silently different):
 - neighborhood = {support points within r_active of the query AND within the
   index band} instead of the 128 nearest.  Points missed by the band are
   the Morton curve's discontinuities; `band_coverage` measures the lost
   influence mass (~0 at practical band widths, tests + PERF.md).
 - the "active neighbor" normalization count (reference kpconv.py:113-116
   counts gathered rows with feature-sum > 0, i.e. nearly always all 128)
   becomes the in-radius count — a density normalization.  Models trained
   with one path should be evaluated with the same path; the gather path
   remains the default for reference-checkpoint parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _load_kernel_points(radius: float, kernel_size: int):
    # lazy import: models.kpconv imports this module (circular otherwise)
    from cofii2p_tpu.models.kernel_points import load_kernel_points

    return np.asarray(load_kernel_points(radius, kernel_size, 3))


def kernel_reach(radius: float, sigma: float, kernel_size: int = 15) -> float:
    """Max distance at which any kernel point has nonzero influence."""
    kp = _load_kernel_points(radius, kernel_size)
    return float(np.linalg.norm(kp, axis=-1).max() + sigma)


def _band_geometry(num_q: int, num_s: int, tile: int, band_width: int):
    """Static banding plan: tile size, tile count, band size.

    Returns (tile, num_tiles, band, dense).  The band is capped at the
    support size; ``dense`` (single full-band tile, no scan) is only taken
    when there is exactly one tile — even when the band spans the whole
    level, multi-tile cases keep the query scan so peak memory stays
    O(tile * band) per step (the backward of a monolithic (M, N, ...) op
    materializes tens of GB at KITTI scale).
    """
    tile = min(tile, num_q)
    while num_q % tile:  # static shapes only; levels are powers of two
        tile //= 2
    num_tiles = num_q // tile
    span = -(-tile * num_s // num_q)  # tile's span in support indices
    band = min(span + 2 * band_width, num_s)
    return tile, num_tiles, band, (num_tiles == 1 and band == num_s)


def _band_start(t, tile: int, num_q: int, num_s: int, band: int):
    """Start index of tile t's support band (centered, edge-clipped).

    Both levels follow the same Morton curve, so query index i corresponds
    to support index ~ i * num_s / num_q (levels are random subsets of a
    common ordering).
    """
    center = ((2 * t * tile + tile) * num_s) // (2 * num_q)
    return jnp.clip(center - band // 2, 0, num_s - band)


@functools.partial(
    jax.jit, static_argnames=("r_active", "tile", "width", "center", "stride")
)
def dynamic_band_starts(
    q_points: jax.Array,
    s_points: jax.Array,
    r_active: float,
    tile: int = 128,
    width: int = 256,
    center: str = "centroid",
    stride: int = 1,
):
    """Per-tile support-band starts computed from the frame's actual
    geometry (device, per forward pass).

    The static band plan centers each tile's band proportionally
    (`_band_start`) and sizes it for worst-case Morton discontinuities —
    at the deep FPN levels that makes the band cover most of the level
    (e.g. 2304 of 2560 rows at enc5_1), and the maxpool/aggregation
    kernels' per-chunk work is ~dense over it.  Here each query tile's
    in-reach rows are found on device (one masked (tile, N) distance
    block per tile — trivial next to the band scan it shrinks) and a
    narrower static ``width`` window is centered on them.

    ``center`` picks the estimator:
      - ``"best"`` (round 4): the width-W window holding the MAXIMUM
        in-reach multiplicity mass — a cumulative-sum sliding window over
        the per-row in-reach counts, exactly optimal for the kept-pairs
        metric at the given width.  Costs one cumsum + argmax over N on
        top of the d2 block every estimator already pays.
      - ``"centroid"`` (default): the multiplicity-weighted mean in-reach
        index.  In-reach rows have long asymmetric Morton tails (span p95
        is several x the dense width, tools/dyn_band_study), so this
        tracks where the influence mass actually lives.
      - ``"span"``: the (jmin+jmax)/2 span midpoint — guarantees the
        window contains EVERY in-reach row whenever width >= span, the
        exactness contract the unit tests pin, but measured much worse
        at real scale (one far row drags the midpoint off the diagonal:
        pair coverage 0.17 vs the static plan's 0.82 at L1, w=256).

    ``stride`` (``center='best'`` only): estimate the in-reach mass on
    every stride-th support row instead of all N.  The round-5 shallow-
    window sweep showed the full (tile, N) distance block COSTS MORE than
    the narrower scan saves at N >= 10240 (PERF.md); the mass profile is
    smooth at the window scale, so a subsampled estimate places the window
    within ~stride rows of the full one at ~1/stride the cost.

    Returns (num_tiles,) int32 window starts, clipped to [0, N - width].
    Falls back to the static proportional center for tiles with no
    in-reach support (their output is zero/empty either way).
    """
    m, n = q_points.shape[0], s_points.shape[0]
    tile = min(tile, m)
    while m % tile:
        tile //= 2
    num_tiles = m // tile
    width = min(width, n)
    r2 = jnp.float32(r_active * r_active) * 1.0001  # conservative boundary
    if stride > 1 and center != "best":
        raise NotImplementedError("stride>1 is implemented for center='best'")
    s_sub = s_points[::stride] if stride > 1 else s_points
    n_sub = s_sub.shape[0]
    w_sub = max(width // stride, 1)

    def span_of(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        if center == "best":
            d2 = _membership_d2(q, s_sub)  # (tile, n_sub)
            within = jnp.any(d2 <= r2, axis=0)
            has = jnp.any(within)
            wcnt = jnp.sum(d2 <= r2, axis=0).astype(jnp.float32)  # (n_sub,)
            cs = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                  jnp.cumsum(wcnt)])
            win = cs[w_sub:] - cs[: n_sub - w_sub + 1]  # mass of window at j
            dyn = (jnp.argmax(win) * stride).astype(jnp.int32)
            static = ((2 * t * tile + tile) * n) // (2 * m) - width // 2
            return jnp.clip(
                jnp.where(has, dyn, static), 0, n - width
            ).astype(jnp.int32)
        d2 = _membership_d2(q, s_points)  # (tile, N)
        within = jnp.any(d2 <= r2, axis=0)  # (N,)
        has = jnp.any(within)
        if center == "centroid":
            wcnt = jnp.sum(d2 <= r2, axis=0).astype(jnp.float32)  # (N,)
            j = jnp.arange(n, dtype=jnp.float32)
            mid = jnp.sum(j * wcnt) / jnp.maximum(jnp.sum(wcnt), 1.0)
            dyn = mid.astype(jnp.int32) - width // 2
        else:  # "span"
            jmin = jnp.argmax(within)
            jmax = n - 1 - jnp.argmax(within[::-1])
            dyn = (jmin + jmax + 1 - width) // 2
        static = ((2 * t * tile + tile) * n) // (2 * m) - width // 2
        return jnp.clip(
            jnp.where(has, dyn, static), 0, n - width
        ).astype(jnp.int32)

    return jax.lax.map(span_of, jnp.arange(num_tiles))


@functools.partial(jax.jit, static_argnames=("tile", "width", "stride"))
def dynamic_knn_starts(
    q_points: jax.Array,
    s_points: jax.Array,
    tau: jax.Array,
    tile: int = 128,
    width: int = 256,
    stride: int = 1,
):
    """Per-tile window starts for k-NN (tau) semantics.

    The kNN twin of :func:`dynamic_band_starts`: membership is per-query
    ``d2 <= tau_m`` (the banded_knn_tau thresholds) instead of a shared
    radius, and the width-W window holding maximum in-tau multiplicity mass
    is selected.  Unlike the radius windows — whose narrowing DROPS
    out-of-window neighbors — kNN windows can be *exact by construction*:
    the k nearest rows sit Morton-locally, so whenever a tile's in-tau span
    fits W the windowed scan reproduces the full-band result bit-for-bit
    (coverage measured by tools/knn_window_ab; see PERF.md round 5).

    ``stride``: estimate the in-tau mass on every stride-th support row
    (see dynamic_band_starts — the mass profile is smooth at window scale,
    and the full (tile, N) block dominated the kNN windows' cost at the
    shallow levels).

    Returns (num_tiles,) int32 window starts, clipped to [0, N - width].
    """
    m, n = q_points.shape[0], s_points.shape[0]
    tile = min(tile, m)
    while m % tile:
        tile //= 2
    num_tiles = m // tile
    width = min(width, n)
    s_sub = s_points[::stride] if stride > 1 else s_points
    n_sub = s_sub.shape[0]
    w_sub = max(width // stride, 1)

    def span_of(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        tau_t = jax.lax.dynamic_slice(tau, (t * tile,), (tile,))
        d2 = _membership_d2(q, s_sub)  # (tile, n_sub)
        within = d2 <= tau_t[:, None]
        wcnt = jnp.sum(within, axis=0).astype(jnp.float32)  # (n_sub,)
        has = jnp.any(within)
        cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(wcnt)])
        win = cs[w_sub:] - cs[: n_sub - w_sub + 1]
        dyn = (jnp.argmax(win) * stride).astype(jnp.int32)
        static = ((2 * t * tile + tile) * n) // (2 * m) - width // 2
        return jnp.clip(
            jnp.where(has, dyn, static), 0, n - width
        ).astype(jnp.int32)

    return jax.lax.map(span_of, jnp.arange(num_tiles))


def _slice_bands_dyn(x: jax.Array, starts: jax.Array, band: int) -> jax.Array:
    """(N, D), traced (nt,) starts -> (nt, band, D) via dynamic slices."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(x, s, band, axis=0)
    )(starts)


def _membership_d2(q: jax.Array, p: jax.Array):
    """Squared distances with the Pallas kernels' exact arithmetic.

    Centers both operands on the tile's first query, then accumulates the
    per-dimension products in d order — the same elementwise fp32 op
    sequence the kernels run (ops/kpconv_kernel.py, ops/maxpool_kernel.py).
    Elementwise fp32 is deterministic, so XLA and Mosaic produce
    bit-identical values; every banded op computes threshold membership
    (d2 <= tau / d2 <= r2) from THIS function so the tau producer
    (banded_knn_tau) and all consumers agree bitwise.  That is what keeps
    k-NN membership stable at zero-gap ties — duplicated points (the
    resample_fixed padding) make the k-th and (k+1)-th distances exactly
    equal, where no mid-gap/eps margin can absorb an arithmetic difference.

    q (T, 3), p (S, 3) -> (T, S) fp32.
    """
    ref = q[0:1, :]
    qc = q - ref
    pc = p - ref
    d2 = None
    for d in range(3):
        diff = qc[:, d : d + 1] - pc[None, :, d]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    return d2


def _membership_d2_rows(q: jax.Array, p_rows: jax.Array):
    """_membership_d2 for gathered per-query rows: q (T, 3),
    p_rows (T, S, 3) -> (T, S).  Same centering and per-dimension op order,
    so a gathered recompute is bit-identical to the full-band d2 at the
    gathered positions."""
    ref = q[0:1, :]
    qc = q - ref
    pc = p_rows - ref[None]
    d2 = None
    for d in range(3):
        diff = qc[:, None, d] - pc[:, :, d]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    return d2


def _influence(offsets: jax.Array, kp: jax.Array, sigma: float):
    """Linear-correlation influence of each kernel point at each offset.

    offsets: (..., 3); returns (..., K) plus the squared distance (...,).
    Same math as the reference kpconv.py:95-100 / models.kpconv.kernel_influence,
    with the (..., K, 3) difference tensor avoided via the matmul identity.
    """
    d2 = jnp.sum(offsets * offsets, axis=-1)
    cross = jnp.einsum(
        "...d,kd->...k", offsets, kp, precision=jax.lax.Precision.HIGHEST
    )
    sqk = d2[..., None] - 2.0 * cross + jnp.sum(kp * kp, axis=-1)
    infl = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sqk, 0.0)) / sigma, 0.0)
    return infl, d2


@functools.partial(
    jax.jit, static_argnames=("radius", "sigma", "kernel_size", "tile", "band_width", "dtype")
)
def banded_kpconv_aggregate(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    tau: jax.Array | None = None,
    kp: jax.Array | None = None,
    starts: jax.Array | None = None,
):
    """Influence-weighted neighbor aggregation without gathers.

    Computes, for each query m and kernel point k:
        weighted[m, k, c] = sum_j infl_k(q_m, s_j) * s_feats[j, c]
    over support points j within the index band and within kernel reach,
    plus count[m] = |{j in band : d(q_m, s_j) <= r_active}| (>=1).

    Args:
      s_feats: (N, C) support features (any float dtype).
      q_points / s_points: (M, 3) / (N, 3) Morton-ordered coordinates.
      radius, sigma, kernel_size: KPConv geometry (sets kernel reach).
      tile: queries per band window (static).
      band_width: support half-band beyond the tile's own span (static).
      dtype: einsum compute dtype (bf16 halves the influence-tensor traffic;
        accumulation stays fp32).
      tau: optional (M,) squared-distance thresholds (from banded_knn_tau).
        When given, the neighborhood becomes {j in band : d2 <= tau_m} —
        i.e. the reference's k-NN semantics (kpconv.py:92-116) instead of
        the radius semantics — and count becomes the reference's exact
        active-row rule |{j : d2 <= tau_m and sum_c feats[j] > 0}|
        (kpconv.py:113-116 counts gathered rows with feature-sum > 0; on
        wide post-LeakyReLU activations that is ~always k, but on the 4-dim
        input features it is genuinely data-dependent).
      kp: optional explicit (K, 3) kernel points (a traced array is fine) —
        per-layer dispositions imported from a reference checkpoint.  The
        reach mask stays at the canonical disposition's radius padded 10%
        (rotations preserve kp norms; the import jitter is ~0.01): influence
        is mathematically zero beyond each kernel point's own reach, so a
        slightly generous static mask changes nothing.

    Returns:
      weighted (M, K, C) fp32, count (M,) int32.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    c = s_feats.shape[-1]
    if kp is None:
        kp = jnp.asarray(_load_kernel_points(radius, kernel_size), jnp.float32)
        r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    else:
        kp = jnp.asarray(kp, jnp.float32)
        r2 = (1.1 * kernel_reach(radius, sigma, kernel_size)) ** 2
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)

    def aggregate(q, p, f, tau_t):
        # q (T,3), p (band,3), f (band,C), tau_t (T,) or None
        offs = p[None, :, :] - q[:, None, :]  # (T, band, 3)
        infl, _ = _influence(offs, kp, sigma)  # (T, band, K)
        # membership from the kernels' exact d2 arithmetic (bit-stable
        # thresholds across XLA/Mosaic); influence keeps the matmul identity
        d2 = _membership_d2(q, p)
        if tau_t is None:
            within = d2 <= r2
            count = jnp.sum(within, axis=-1)
        else:
            within_tau = d2 <= tau_t[:, None]
            within = within_tau & (d2 <= r2)
            active = jnp.sum(f, axis=-1) > 0.0  # (band,)
            count = jnp.sum(within_tau & active[None, :], axis=-1)
        infl = jnp.where(within[..., None], infl, 0.0)
        count = jnp.maximum(count, 1)  # (T,)
        weighted = jnp.einsum(
            "tbk,bc->tkc",
            infl.astype(dtype),
            f.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return weighted, count.astype(jnp.int32)

    if dense and starts is None:
        # checkpoint for the same reason as the banded scan below: the
        # (M, N, K) influence tensor must not be saved for the backward
        return jax.checkpoint(aggregate)(q_points, s_points, s_feats, tau)

    if starts is not None:
        # dynamic per-tile window starts (dynamic_band_starts): band_width
        # is the full window width here, not the half-band margin
        band = min(band_width, n)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = (
            _band_start(t, tile, m, n, band) if starts is None else starts[t]
        )
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        f = jax.lax.dynamic_slice(s_feats, (start, 0), (band, c))
        tau_t = (
            None if tau is None
            else jax.lax.dynamic_slice(tau, (t * tile,), (tile,))
        )
        return aggregate(q, p, f, tau_t)

    # checkpoint: without it, differentiating through the scan saves the
    # (tile, band, K) influence tensor of every step — tens of GB at KITTI
    # scale; recomputing it in the backward is ~free (VPU-bound op)
    weighted, count = jax.lax.map(jax.checkpoint(tile_fn), jnp.arange(num_tiles))
    return weighted.reshape(m, kp.shape[0], c), count.reshape(m)


@functools.partial(
    jax.jit, static_argnames=("r_active", "tile", "band_width")
)
def banded_maxpool(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    r_active: float,
    tile: int = 128,
    band_width: int = 1024,
    tau: jax.Array | None = None,
    starts: jax.Array | None = None,
):
    """Max over in-radius band features (banded twin of neighbor_maxpool;
    reference functional.py:53-66 maxes over the kNN rows instead).

    With ``tau`` (the (M,) squared k-NN thresholds from banded_knn_tau) the
    membership becomes {j in band : d2 <= tau_m} — the reference's k-NN
    maxpool semantics exactly (its kNN maxpool has NO radius mask: it maxes
    over all H rows regardless of distance), and ``r_active`` is ignored.

    Empty neighborhoods yield zeros, like the reference's shadow rows.
    Returns (M, C) in the dtype of ``s_feats``.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    c = s_feats.shape[-1]
    r2 = r_active * r_active
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)
    neg = jnp.asarray(-jnp.inf, s_feats.dtype)
    # chunk channels so the (tile, band, chunk) select mask stays small in
    # both the forward fusion and the max-grad recompute
    cchunk = c if c <= 128 else 128
    while c % cchunk:
        cchunk //= 2

    def pool(q, p, f, tau_t):
        d2 = _membership_d2(q, p)  # (T, band), kernel-exact arithmetic
        within = d2 <= (r2 if tau_t is None else tau_t[:, None])
        any_within = jnp.any(within, axis=-1)[..., None]

        if c == cchunk:
            out = jnp.max(jnp.where(within[..., None], f[None], neg), axis=1)
            return jnp.where(any_within, out, 0.0)

        def chunk_fn(j):
            fc = jax.lax.dynamic_slice(f, (0, j * cchunk), (f.shape[0], cchunk))
            return jnp.max(jnp.where(within[..., None], fc[None], neg), axis=1)

        out = jax.lax.map(chunk_fn, jnp.arange(c // cchunk))  # (nc, T, cchunk)
        out = jnp.moveaxis(out, 0, 1).reshape(q.shape[0], c)
        return jnp.where(any_within, out, 0.0)

    if dense and starts is None:
        return jax.checkpoint(pool)(q_points, s_points, s_feats, tau)

    if starts is not None:
        band = min(band_width, n)  # full window width (dynamic_band_starts)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = (
            _band_start(t, tile, m, n, band) if starts is None else starts[t]
        )
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        f = jax.lax.dynamic_slice(s_feats, (start, 0), (band, c))
        tau_t = (
            None if tau is None
            else jax.lax.dynamic_slice(tau, (t * tile,), (tile,))
        )
        return pool(q, p, f, tau_t)

    # checkpoint: don't save the (tile, band, C) max masks across the scan
    out = jax.lax.map(jax.checkpoint(tile_fn), jnp.arange(num_tiles))
    return out.reshape(m, c)


def _nearest_k(d2: jax.Array, kk: int, approx: bool):
    """Indices (and negated d2) of the kk nearest rows along the last axis.

    approx=True uses lax.approx_max_k — the TPU-optimized partial-reduce
    selection (recall ~0.95 per partition) instead of top_k's full sort.
    For radius semantics the member set is {d2 <= r2} capped at kk, so a
    rare miss swaps one near-boundary member for another — the XLA CPU
    lowering is exact, keeping CPU tests deterministic."""
    if approx:
        return jax.lax.approx_max_k(-d2, kk, recall_target=0.95)
    return jax.lax.top_k(-d2, kk)


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "band_width", "approx")
)
def banded_knn_select(
    q_points: jax.Array,
    s_points: jax.Array,
    k: int = 128,
    tile: int = 128,
    band_width: int = 1024,
    approx: bool = False,
):
    """Band-LOCAL indices (M, kk) of each query's k nearest in-band rows,
    nearest first.

    The selection (top_k / approx_max_k over the banded d2) is the
    per-conv overhead of the compacted formulations; every sibling conv at
    a (query level, support level) pair shares the same point sets, so the
    FPN computes this once per pair and passes it down — the compacted
    twin of the shared tau tensor (banded_knn_tau).  Because rows come
    nearest-first, the first j columns are exactly the j-nearest selection:
    consumers with smaller k just slice ``rel[:, :j]``.

    Indices are relative to each 128-query tile's band start (the consumer
    re-derives the same _band_start), int32.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)
    kk = min(k, band)

    def select(q, p):
        d2 = _membership_d2(q, p)
        _, rel = _nearest_k(d2, kk, approx)
        return rel.astype(jnp.int32)

    if dense:
        return select(q_points, s_points)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = _band_start(t, tile, m, n, band)
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        return select(q, p)

    rel = jax.lax.map(tile_fn, jnp.arange(num_tiles))
    return rel.reshape(m, kk)


@functools.partial(
    jax.jit,
    static_argnames=("r_active", "k", "tile", "band_width", "knn", "approx"),
)
def banded_compact_maxpool(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    r_active: float,
    k: int = 128,
    tile: int = 128,
    band_width: int = 1024,
    knn: bool = False,
    approx: bool = False,
    rel: jax.Array | None = None,
):
    """Compacted banded maxpool: max over the <=k NEAREST members.

    The select formulation (banded_maxpool / the Pallas kernel) rescans the
    whole band per query tile — O(tile * band * C) element ops even though
    only <=~k rows are in reach of any query.  This variant first SELECTS
    each query's k nearest band rows (lax.top_k over the banded d2), then
    GATHERS those k rows and maxes — O(tile * k * C) ops plus a k-row
    gather, a large win where band >> k (the deep levels).

    knn=False (radius semantics): members = in-reach rows, CAPPED at the k
      nearest.  Queries with more than k in-reach rows pool over the k
      nearest only — strictly closer to the reference's own kNN(k=128)
      maxpool (functional.py:53-66) than the uncapped banded radius
      semantics, and identical to banded_maxpool whenever the in-reach
      count <= k (the common case under the shipped band plan).
    knn=True (reference kNN semantics): members = the k nearest in-band
      rows, no radius mask — exactly the banded_knn maxpool, with top-k
      index selection instead of the tau threshold (ties at the k-th
      distance break by band order instead of admitting both; the tau path
      admits all ties — an equivalence-class difference only).

    ``rel`` (optional, (M, j<=k) int32 band-local indices from
    banded_knn_select with the same tile/band geometry) skips the per-call
    selection entirely — membership d2 is recomputed from the gathered
    coordinates (bit-identical to the selection's own d2: same formula on
    the same slices).

    s_feats (N, C), q_points (M, 3), s_points (N, 3) -> (M, C).
    """
    m, n = q_points.shape[0], s_points.shape[0]
    c = s_feats.shape[-1]
    r2 = r_active * r_active
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)
    kk = min(k, band) if rel is None else rel.shape[-1]
    neg = jnp.asarray(-jnp.inf, s_feats.dtype)

    def pool(q, p, f, rel_t):
        if rel_t is None:
            d2 = _membership_d2(q, p)
            negk, idx = _nearest_k(d2, kk, approx)  # nearest first
            d2k = -negk  # (T, kk)
        else:
            idx = rel_t
            d2k = None
        rows = jnp.take(f, idx, axis=0)  # (T, kk, C)
        if knn:
            out = jnp.max(rows, axis=1)
            return out if kk else jnp.zeros((q.shape[0], c), f.dtype)
        if d2k is None:
            p_rows = jnp.take(p, idx, axis=0)  # (T, kk, 3)
            d2k = _membership_d2_rows(q, p_rows)
        member = d2k <= r2  # (T, kk)
        out = jnp.max(jnp.where(member[..., None], rows, neg), axis=1)
        return jnp.where(member.any(-1)[:, None], out, 0.0)

    if dense:
        return jax.checkpoint(pool)(q_points, s_points, s_feats, rel)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = _band_start(t, tile, m, n, band)
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        f = jax.lax.dynamic_slice(s_feats, (start, 0), (band, c))
        rel_t = (
            None if rel is None
            else jax.lax.dynamic_slice(rel, (t * tile, 0), (tile, kk))
        )
        return pool(q, p, f, rel_t)

    out = jax.lax.map(jax.checkpoint(tile_fn), jnp.arange(num_tiles))
    return out.reshape(m, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "sigma", "kernel_size", "k", "tile", "band_width",
        "dtype", "knn", "approx",
    ),
)
def banded_compact_aggregate(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    k: int = 128,
    tile: int = 128,
    band_width: int = 1024,
    dtype=jnp.float32,
    knn: bool = False,
    kp: jax.Array | None = None,
    approx: bool = False,
    rel: jax.Array | None = None,
):
    """Compacted banded KPConv aggregation over the <=k NEAREST members.

    ``rel`` (optional, (M, j<=k) int32 band-local indices from
    banded_knn_select, same tile/band geometry) skips the per-call top_k;
    in radius mode the full-band d2 is still computed for the uncapped
    in-reach count (O(T*band), no K factor, no sort).

    banded_kpconv_aggregate computes influence for every (query, band row)
    pair — O(tile * band * K) VPU work plus a (tile*K, band)@(band, C) MXU
    dot — though at the deep levels only <=~k of each query's band rows are
    within kernel reach.  This variant first SELECTS each query's k nearest
    band rows (lax.top_k over the banded d2 — the same compaction as
    banded_compact_maxpool), GATHERS those rows, and runs the influence +
    contraction on the compacted (tile, k) neighborhood: O(tile * k * K)
    VPU work and a T-batched (K, k)@(k, C) MXU dot.

    knn=False (radius semantics): members = in-reach rows (d2 <= reach^2),
      CAPPED at the k nearest.  ``count`` stays the UNCAPPED full-band
      in-reach count, so the density normalization is identical to
      banded_kpconv_aggregate; dropped rows (in-reach rank > k) sit near
      the reach boundary where influence is smallest.  Identical to the
      banded path whenever the in-reach count <= k.
    knn=True (reference kNN semantics, kpconv.py:92-116): members = the k
      nearest in-band rows, ``count`` = the reference's active-row rule
      |{gathered rows : sum_c feats > 0}|.  Equivalent to the tau path
      (banded_kpconv_aggregate(tau=banded_knn_tau(k))) — top-k index
      selection replaces the distance threshold; ties at the k-th distance
      break by band order instead of admitting both (equivalence-class
      difference only, as in banded_compact_maxpool).

    Returns (weighted (M, K, C) fp32, count (M,) int32) — the same contract
    as banded_kpconv_aggregate; the caller contracts with the (K, C, Cout)
    weights and divides by count.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    c = s_feats.shape[-1]
    if kp is None:
        kp = jnp.asarray(_load_kernel_points(radius, kernel_size), jnp.float32)
        r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    else:
        # imported per-layer dispositions: rotations preserve kp norms, the
        # import jitter is ~0.01 — a 10%-padded static reach changes nothing
        # (influence is mathematically zero beyond each point's own reach)
        kp = jnp.asarray(kp, jnp.float32)
        r2 = (1.1 * kernel_reach(radius, sigma, kernel_size)) ** 2
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)
    kk = min(k, band) if rel is None else rel.shape[-1]

    def aggregate(q, p, f, rel_t):
        # q (T,3), p (band,3), f (band,C), rel_t (T,kk) or None
        if rel_t is None or not knn:
            d2full = _membership_d2(q, p)
        if rel_t is None:
            _, idx = _nearest_k(d2full, kk, approx)  # (T, kk), nearest first
        else:
            idx = rel_t
        p_rows = jnp.take(p, idx, axis=0)  # (T, kk, 3)
        f_rows = jnp.take(f, idx, axis=0)  # (T, kk, C)
        offs = p_rows - q[:, None, :]
        infl, _ = _influence(offs, kp, sigma)  # (T, kk, K)
        if knn:
            active = jnp.sum(f_rows, axis=-1) > 0.0  # (T, kk)
            count = jnp.sum(active, axis=-1)
        else:
            within = _membership_d2_rows(q, p_rows) <= r2
            infl = jnp.where(within[..., None], infl, 0.0)
            count = jnp.sum(d2full <= r2, axis=-1)  # uncapped, as banded
        count = jnp.maximum(count, 1)
        weighted = jnp.einsum(
            "tqk,tqc->tkc",
            infl.astype(dtype),
            f_rows.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return weighted, count.astype(jnp.int32)

    if dense:
        return jax.checkpoint(aggregate)(q_points, s_points, s_feats, rel)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = _band_start(t, tile, m, n, band)
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        f = jax.lax.dynamic_slice(s_feats, (start, 0), (band, c))
        rel_t = (
            None if rel is None
            else jax.lax.dynamic_slice(rel, (t * tile, 0), (tile, kk))
        )
        return aggregate(q, p, f, rel_t)

    # checkpoint: recompute the gather + influence in the backward instead
    # of saving (tile, kk, K) influence and (tile, kk, C) rows per step
    weighted, count = jax.lax.map(jax.checkpoint(tile_fn), jnp.arange(num_tiles))
    return weighted.reshape(m, kp.shape[0], c), count.reshape(m)


@functools.partial(jax.jit, static_argnames=("k", "tile", "band_width"))
def banded_knn_tau(
    q_points: jax.Array,
    s_points: jax.Array,
    k: int = 128,
    tile: int = 128,
    band_width: int = 1024,
    starts: jax.Array | None = None,
):
    """Squared distance to each query's k-th nearest *in-band* support point.

    ``starts``: optional (num_tiles,) window starts — the k-NN threshold is
    then computed over each tile's width-``band_width`` window instead of
    the static band (the round-5 windowed-tau chain: a subsampled proxy tau
    places the window, this computes the exact in-WINDOW k-th distance, and
    the kernels scan the same window — the full-band top_k was 95.7 ms/batch
    of the .t7 path, PERF.md).  Membership deviates from the full-band tau
    only where the window misses in-band k-nearest rows (drift-gated,
    tools/window_drift --knn).

    This is the whole interface the reference's k-NN neighbor maps reduce to
    under banding: the neighborhood {j : d2(m, j) <= tau_m} within the band
    IS the k-NN set (the reference builds explicit (M, k) index maps on CPU,
    preprocess_data.py:74-99, then gathers rows; here membership is decided
    on the fly from coordinates, so no index tensor and no gathers exist).
    Exact whenever the true k-NN lie inside the band — the same Morton-
    locality assumption the banded radius path rests on, measured ~98-99%+
    of pairs at the shipped band plan (band_coverage / PERF.md).

    Returns (M,) float32.  tau is placed at the MIDPOINT between the k-th
    and (k+1)-th squared distances, not at the k-th itself: the consumers
    (the Pallas kernels) compute d2 with tile-centered arithmetic that can
    differ from this producer's by ~1e-3 at raw-LiDAR coordinate
    magnitudes, far more than any eps-pad of the k-th distance can absorb.
    A mid-gap threshold keeps membership stable under any arithmetic whose
    error is below half the k/k+1 distance gap (typically >=1e-2 on
    voxel-downsampled clouds).  When the k-th and (k+1)-th distances tie
    (duplicate points), both are admitted — the reference's kNN breaks such
    ties arbitrarily, so either set is equally faithful.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    if starts is not None:
        tile = min(tile, m)
        while m % tile:
            tile //= 2
        num_tiles = m // tile
        band = min(band_width, n)
        dense = False
        kk = min(k, band)
    else:
        kk = min(k, n)
        tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)

    def tau_of(q, p):
        d2 = _membership_d2(q, p)
        if kk < d2.shape[-1]:
            top = -jax.lax.top_k(-d2, kk + 1)[0]  # (T, kk+1) ascending
            kth, nxt = top[:, -2], top[:, -1]
        else:
            kth = -jax.lax.top_k(-d2, kk)[0][:, -1]
            nxt = kth * (1.0 + 2e-6) + 2e-12  # no (k+1)-th: eps-pad fallback
        # An exact k/(k+1) tie (duplicated points) puts the midpoint AT the
        # tied distance, where consumer-vs-producer ulp noise (XLA may fuse
        # the d2 accumulation into FMAs; Mosaic schedules it differently)
        # flips membership and with it the maxpool/aggregation outputs.  So
        # tau is at least a hair (rel 1e-5 >> few-ulp noise, << real k/k+1
        # gaps on voxel-downsampled clouds) above the k-th distance: exact
        # ties are admitted under ANY fp32 arithmetic, and near-ties within
        # rel 1e-5 admit the (k+1)-th too — a documented approximation the
        # reference's arbitrary kNN tie-breaking makes equally valid.
        return jnp.maximum(0.5 * (kth + nxt), kth * (1.0 + 1e-5) + 1e-12)

    if dense:
        return tau_of(q_points, s_points)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = (
            _band_start(t, tile, m, n, band) if starts is None else starts[t]
        )
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        return tau_of(q, p)

    out = jax.lax.map(tile_fn, jnp.arange(num_tiles))
    return out.reshape(m)


@functools.partial(jax.jit, static_argnames=("tile", "band_width"))
def banded_nearest_index(
    q_points: jax.Array,
    s_points: jax.Array,
    tile: int = 128,
    band_width: int = 1024,
):
    """Index of each query's nearest support point, searched within the band.

    Banded twin of the 1-NN ``upsampling`` map consumed by nearest_upsample
    (reference functional.py:5-21, preprocess_data.py:97): the true nearest
    neighbor is at ~point-spacing distance, which Morton order keeps inside
    any practical band.  Returns (M,) int32 absolute indices into s_points.
    """
    m, n = q_points.shape[0], s_points.shape[0]
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)

    def nearest(q, p, start):
        d2 = _membership_d2(q, p)
        return (jnp.argmin(d2, axis=-1) + start).astype(jnp.int32)

    if dense:
        return nearest(q_points, s_points, 0)

    def tile_fn(t):
        q = jax.lax.dynamic_slice(q_points, (t * tile, 0), (tile, 3))
        start = _band_start(t, tile, m, n, band)
        p = jax.lax.dynamic_slice(s_points, (start, 0), (band, 3))
        return nearest(q, p, start)

    out = jax.lax.map(tile_fn, jnp.arange(num_tiles))
    return out.reshape(m)


def band_coverage(
    q_points: np.ndarray,
    s_points: np.ndarray,
    radius: float,
    sigma: float,
    kernel_size: int = 15,
    tile: int = 128,
    band_width: int = 1024,
) -> dict:
    """Diagnostic (NumPy, host): how much in-radius influence mass the band
    captures.  Returns fractions in [0, 1]; 1.0 means the banded op is exactly
    the full radius-neighborhood op on this cloud."""
    q = np.asarray(q_points, np.float64)
    s = np.asarray(s_points, np.float64)
    m, n = len(q), len(s)
    r = kernel_reach(radius, sigma, kernel_size)
    tile, num_tiles, band, dense = _band_geometry(m, n, tile, band_width)
    if dense:
        return {"pair_coverage": 1.0, "mass_coverage": 1.0, "band": band}

    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)  # (M, N)
    within = d2 <= r * r
    kp = _load_kernel_points(radius, kernel_size)
    dk = np.sqrt(
        np.maximum(
            d2[..., None]
            - 2.0 * (q[:, None, :] - s[None, :, :]) @ kp.T
            + (kp**2).sum(-1),
            0.0,
        )
    )
    mass = np.maximum(1.0 - dk / sigma, 0.0).sum(-1) * within  # (M, N)

    t_idx = np.arange(m) // tile
    centers = ((2 * t_idx * tile + tile) * n) // (2 * m)
    starts = np.clip(centers - band // 2, 0, n - band)
    j = np.arange(n)[None, :]
    in_band = (j >= starts[:, None]) & (j < starts[:, None] + band)

    pairs = within.sum()
    return {
        "pair_coverage": float((within & in_band).sum() / max(pairs, 1)),
        "mass_coverage": float((mass * in_band).sum() / max(mass.sum(), 1e-12)),
        "band": band,
    }
