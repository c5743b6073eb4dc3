"""Pallas bisection kernel for the banded k-NN threshold (tau producer).

`banded_knn_tau`'s `lax.top_k` over (tile, band) was measured at 95.7
ms/batch of the `.t7` reproduction path (PERF.md round-5 .t7 bisection) —
XLA's top_k is a full sort of every band row set.  The k-th smallest
DISTANCE is all tau needs, and a count-guided bisection finds it exactly:
count(d2 <= t) is monotone in t with its jump at the k-th value, so ~48
float bisection steps over a VMEM-resident d2 block converge onto it, and
two masked-reduction pull-down steps recover the exact lattice value even
if the bisection stalls one ulp high.  The (k+1)-th value (for the
mid-gap tau rule) follows from one masked min + the tie rule.

Exactness contract: d2 uses the kernels' tile-centered per-dimension
arithmetic (ops/banded._membership_d2 — elementwise fp32, bit-identical
across XLA/Mosaic), and kth/nxt are recovered as exact data values, so
the produced tau is BIT-IDENTICAL to banded_knn_tau's (asserted by
tests/test_banded_knn.py::test_tau_pallas_bitexact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cofii2p_tpu.ops.banded import _band_geometry
from cofii2p_tpu.ops.kpconv_kernel import _band_starts_np, _slice_bands

_ITERS = 48  # fp32 bisection steps (full exponent range + mantissa)


def _tau_bisect_kernel(q_ref, pT_ref, tau_ref, *, kk):
    ref = q_ref[0, 0:1, :]
    q = q_ref[0] - ref  # (tile, 3)
    pT = pT_ref[0, 0] - ref.reshape(3, 1)  # (3, band)

    # the kernels' exact d2 arithmetic (see ops/banded._membership_d2)
    d2 = None
    for d in range(3):
        diff = q[:, d : d + 1] - pT[d : d + 1, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff  # (tile, band)

    fkk = jnp.float32(kk)
    hi0 = jnp.max(d2, axis=1, keepdims=True)  # (tile, 1)
    lo0 = jnp.zeros_like(hi0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid).astype(jnp.float32), axis=1, keepdims=True)
        ge = (cnt >= fkk).astype(jnp.float32)
        # ge: the k-th value is <= mid -> shrink hi; else raise lo
        return (lo * ge + mid * (1.0 - ge), mid * ge + hi * (1.0 - ge))

    lo, hi = jax.lax.fori_loop(0, _ITERS, body, (lo0, hi0))

    def masked_max(limit, strict_below=None):
        keep = (d2 <= limit).astype(jnp.float32)
        if strict_below is not None:
            keep = keep * (d2 < strict_below).astype(jnp.float32)
        return jnp.max(d2 * keep - 1e30 * (1.0 - keep), axis=1, keepdims=True)

    # pull-down: hi >= kth and hi < kth + ~ulp, so at most one data value
    # sits in (kth, hi]; v is kth or that neighbor — one strict step decides
    v = masked_max(hi)
    v2 = masked_max(hi, strict_below=v)
    c2 = jnp.sum((d2 <= v2).astype(jnp.float32), axis=1, keepdims=True)
    take2 = (c2 >= fkk).astype(jnp.float32)
    kth = v2 * take2 + v * (1.0 - take2)

    # (k+1)-th: the tie rule first (count(<= kth) > kk -> nxt == kth), else
    # the smallest strictly-greater value, else the no-(k+1) eps fallback
    cnt_at = jnp.sum((d2 <= kth).astype(jnp.float32), axis=1, keepdims=True)
    gt = (d2 > kth).astype(jnp.float32)
    nxt_min = jnp.min(d2 * gt + 1e30 * (1.0 - gt), axis=1, keepdims=True)
    has_next = (nxt_min < 1e29).astype(jnp.float32)
    fallback = kth * (1.0 + 2e-6) + 2e-12
    nxt_plain = nxt_min * has_next + fallback * (1.0 - has_next)
    tie = (cnt_at > fkk).astype(jnp.float32)
    nxt = kth * tie + nxt_plain * (1.0 - tie)

    tau = jnp.maximum(0.5 * (kth + nxt), kth * (1.0 + 1e-5) + 1e-12)
    tau_ref[0, :, :] = tau  # (tile, 1) — no sublane->lane relayout


@functools.partial(jax.jit, static_argnames=("k", "tile", "band_width"))
def banded_knn_tau_pallas(
    q_points: jax.Array,
    s_points: jax.Array,
    k: int = 128,
    tile: int = 128,
    band_width: int = 1024,
):
    """Batched Pallas twin of ops.banded.banded_knn_tau (bit-identical tau).

    q_points (B, M, 3), s_points (B, N, 3) -> (B, M) float32.
    """
    b, m = q_points.shape[:2]
    n = s_points.shape[1]
    tile, num_tiles, band, _ = _band_geometry(m, n, tile, band_width)
    kk = min(k, band)
    starts_np = _band_starts_np(m, n, tile, band, num_tiles)
    band_p = jax.vmap(lambda p: _slice_bands(p, starts_np, band))(s_points)
    band_pT = jnp.swapaxes(band_p, -1, -2)  # (B, nt, 3, band)

    interpret = jax.devices()[0].platform != "tpu"
    tau = pl.pallas_call(
        functools.partial(_tau_bisect_kernel, kk=kk),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, band), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 1), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        interpret=interpret,
    )(q_points, band_pT)
    return tau[..., 0]
