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

Differentiation: wrapped in jax.custom_vjp.  The backward recomputes the
influence with the XLA path and propagates into s_feats only — the pyramid
coordinates are data, not parameters, so their gradients are never needed.

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
    kernel_reach,
)


def _agg_kernel(kp_ref, q_ref, pT_ref, f_ref, out_ref, cnt_ref, *, sigma, r2, cdtype):
    """One (batch, query-tile) cell: aggregate the tile's band.

    kp_ref: (K, 3)         kernel points (same block everywhere)
    q_ref:  (1, tile, 3)   query coordinates
    pT_ref: (1, 1, 3, band) support coordinates, transposed
    f_ref:  (1, 1, band, C) support features
    out_ref:(1, tile, K*C) influence-weighted sums
    cnt_ref:(1, tile, 1)   in-radius counts
    """
    kpj = kp_ref[...]  # (K, 3)
    q = q_ref[0]  # (tile, 3)
    pT = pT_ref[0, 0]  # (3, band)
    f = f_ref[0, 0].astype(cdtype)  # (band, C)
    k_num = kpj.shape[0]
    c = f.shape[-1]

    # d2 (tile, band) and the separable cross terms
    d2 = None
    for d in range(3):
        qd = q[:, d : d + 1]  # (tile, 1)
        pd = pT[d : d + 1, :]  # (1, band)
        diff = qd - pd
        d2 = diff * diff if d2 is None else d2 + diff * diff

    within = d2 <= r2
    cnt_ref[0, :, :] = jnp.sum(within.astype(jnp.float32), axis=1, keepdims=True)

    # row terms: -2 kp . p  -> (K, band); col terms: 2 kp . q -> (tile, K)
    row = -2.0 * jnp.dot(kpj, pT, preferred_element_type=jnp.float32)  # (K, band)
    col = 2.0 * jnp.dot(q, kpj.T, preferred_element_type=jnp.float32)  # (tile, K)
    kp2 = jnp.sum(kpj * kpj, axis=-1)  # (K,)

    inv_sigma = 1.0 / sigma
    for k in range(k_num):
        s2k = d2 + row[k : k + 1, :] + (col[:, k : k + 1] + kp2[k])
        dist = jnp.sqrt(jnp.maximum(s2k, 0.0))
        infl = jnp.maximum(1.0 - dist * inv_sigma, 0.0)
        infl = jnp.where(within, infl, 0.0).astype(cdtype)
        acc = jnp.dot(infl, f, preferred_element_type=jnp.float32)  # (tile, C)
        out_ref[0, :, k * c : (k + 1) * c] = acc


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
):
    """Fused-kernel twin of ops.banded.banded_kpconv_aggregate (batched).

    Args are batched: s_feats (B, N, C), q_points (B, M, 3), s_points
    (B, N, 3).  Returns (weighted (B, M, K, C) fp32, count (B, M) int32).
    """
    return _forward(
        s_feats, q_points, s_points, radius, sigma, kernel_size, tile,
        band_width, dtype,
    )


def _forward(s_feats, q_points, s_points, radius, sigma, kernel_size, tile, band_width, dtype):
    b, m = q_points.shape[:2]
    n, c = s_feats.shape[-2:]
    kp = _load_kernel_points(radius, kernel_size).astype(np.float32)
    k_num = kp.shape[0]
    r2 = kernel_reach(radius, sigma, kernel_size) ** 2
    tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)

    # pure-Python twin of banded._band_start (jnp would trace under jit)
    starts = np.asarray(
        [
            min(max(((2 * t * tile + tile) * n) // (2 * m) - band // 2, 0), n - band)
            for t in range(num_tiles)
        ]
    )
    band_p = jax.vmap(lambda p: _slice_bands(p, starts, band))(s_points)
    band_pT = jnp.swapaxes(band_p, -1, -2)  # (B, nt, 3, band)
    band_f = jax.vmap(lambda f: _slice_bands(f, starts, band))(s_feats)

    kernel = functools.partial(
        _agg_kernel, sigma=float(sigma), r2=float(r2), cdtype=jnp.dtype(dtype),
    )
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests run interpreted
    out, cnt = pl.pallas_call(
        kernel,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((k_num, 3), lambda bb, tt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, band), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, band, c), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, k_num * c), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
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


def _fwd(s_feats, q_points, s_points, radius, sigma, kernel_size, tile, band_width, dtype):
    out = _forward(
        s_feats, q_points, s_points, radius, sigma, kernel_size, tile,
        band_width, dtype,
    )
    return out, (s_feats, q_points, s_points)


def _bwd(radius, sigma, kernel_size, tile, band_width, dtype, res, g):
    """Backward via the XLA banded path: only s_feats receives gradient
    (pyramid coordinates are pipeline data, never parameters)."""
    from cofii2p_tpu.ops.banded import banded_kpconv_aggregate

    s_feats, q_points, s_points = res
    g_weighted, _ = g

    def f_only(f):
        w, _ = jax.vmap(
            lambda ff, q, s: banded_kpconv_aggregate(
                ff, q, s, radius, sigma, kernel_size, tile, band_width, dtype
            )
        )(f, q_points, s_points)
        return w

    _, vjp = jax.vjp(f_only, s_feats)
    (g_feats,) = vjp(g_weighted)
    return g_feats, None, None


banded_kpconv_aggregate_pallas.defvjp(_fwd, _bwd)
