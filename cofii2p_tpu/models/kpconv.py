"""Kernel-point convolution branch (batched, static shapes, MXU-shaped).

Capability match for the reference point branch
(/root/reference/model/kpconv/kpconv.py, modules.py, kp_backbone.py,
functional.py), re-designed batch-first for TPU:

- every tensor carries a leading batch axis so data parallelism is a
  sharding annotation, not a code change (the reference is hardwired to
  one stacked cloud, batch 1);
- the conv is two einsums — neighbor-influence aggregation
  (B,M,K,H)x(B,M,H,C) and the kernel-weight contraction (B,M,K,C)x(K,C,D) —
  both of which XLA tiles onto the MXU;
- shadow neighbors (index == N) are handled by zero-fill gathers + masks
  instead of materialized shadow rows (reference kpconv.py:91/103).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.models.kernel_points import load_kernel_points
from cofii2p_tpu.models.layers import Linear, leaky_relu, norm_factory
from cofii2p_tpu.ops.banded import (
    banded_compact_aggregate,
    banded_compact_maxpool,
    banded_knn_select,
    banded_knn_tau,
    banded_kpconv_aggregate,
    banded_maxpool,
    banded_nearest_index,
    dynamic_band_starts,
    dynamic_knn_starts,
    kernel_reach,
)
from cofii2p_tpu.ops.geometry import gather_neighbors


def neighbor_maxpool(feats: jax.Array, neighbor_indices: jax.Array) -> jax.Array:
    """Max over neighbor features, shadow rows contributing zeros
    (reference functional.py:53-66)."""
    nbr = gather_neighbors(feats, neighbor_indices)  # (B, M, H, C)
    return jnp.max(nbr, axis=-2)


def nearest_upsample(feats: jax.Array, upsample_indices: jax.Array) -> jax.Array:
    """Copy the nearest (first-column) coarse feature to each fine point
    (reference functional.py:5-21)."""
    idx = upsample_indices[..., 0]
    return jnp.take_along_axis(
        feats, idx[..., None].astype(jnp.int32), axis=-2
    )


def kernel_influence(q_points, s_points, neighbor_indices, radius, sigma,
                     kernel_size=15, kp=None):
    """Linear-correlation influence of each kernel point on each neighbor
    (reference kpconv.py:95-100), computed once per (level, radius) and
    shared by all sibling conv blocks — the neighbor-coordinate gather and
    the (B,M,H,K) influence tensor are among the branch's dominant memory
    costs, and recomputing them per block (as the reference does) is waste.

    ``kp`` overrides the canonical cached disposition with an explicit (K, 3)
    kernel-point array — used for per-layer dispositions imported from a
    reference checkpoint (each reference KPConv registers its own randomly
    rotated/jittered buffer, /root/reference/model/kpconv/kpconv.py:64-65,
    kernel_points.py:429-453, and ``load_state_dict`` restores them).

    Returns (B, M, H, K) with shadow neighbors zeroed.
    """
    n = s_points.shape[-2]
    if kp is None:
        kp = jnp.asarray(load_kernel_points(radius, kernel_size, 3))  # (K, 3)
    valid = neighbor_indices < n  # (B, M, H)
    nbr_pts = gather_neighbors(s_points, neighbor_indices)  # (B, M, H, 3)
    offsets = nbr_pts - q_points[..., None, :]  # (B, M, H, 3)

    # squared dist to each kernel point via the matmul identity: keeps the
    # (B,M,H,K,3) difference tensor out of HBM (it would be ~0.5 GB at
    # KITTI scale if materialized like the reference's kpconv.py:97).
    cross = jnp.einsum(
        "bmhd,kd->bmhk", offsets, kp, precision=jax.lax.Precision.HIGHEST
    )
    sq = (
        jnp.sum(offsets**2, axis=-1, keepdims=True)
        + jnp.sum(kp**2, axis=-1)[None, None, None, :]
        - 2.0 * cross
    )
    influence = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sq, 0.0)) / sigma, 0.0)
    return jnp.where(valid[..., None], influence, 0.0)  # (B, M, H, K)


class KPConv(nn.Module):
    """Rigid kernel-point convolution (reference kpconv.py:79-122).

    Inputs:
      s_feats: (B, N, Cin), q_points: (B, M, 3), s_points: (B, N, 3),
      neighbor_indices: (B, M, H) with N meaning "no neighbor";
      optionally a precomputed ``influence`` from :func:`kernel_influence`.
    Output: (B, M, out_channels).

    ``impl='banded'`` switches the neighbor aggregation to the gather-free
    banded radius path (ops/banded.py): neighbor_indices/influence are
    ignored (may be None) and the neighborhood becomes "in-band points
    within kernel reach" with in-radius count normalization.  Parameters are
    identical between the two paths.

    ``impl='banded_knn'`` keeps the banded machinery but reproduces the
    reference's k-NN semantics: membership is {j in band : d2 <= tau_m}
    where ``tau`` holds each query's k-th-NN squared distance
    (ops/banded.banded_knn_tau), and normalization uses the within-tau
    count (== k up to ties — the reference's active-row count,
    kpconv.py:113-116, is likewise always H on real data).  Uses this
    layer's own ``kernel_points`` parameter, so imported per-layer
    reference dispositions are honored.  This is the fast path for
    reference-checkpoint evaluation: exact whenever the true k-NN sit
    inside the band (~98-99%+ of pairs, PERF.md).
    """

    out_channels: int
    kernel_size: int = 15
    radius: float = 0.425
    sigma: float = 0.2
    use_bias: bool = True
    dtype: Any = jnp.float32
    impl: str = "gather"
    tile: int = 128
    band_width: int = 1024
    kernel: str = "xla"  # 'xla' | 'pallas' banded aggregation backend
    knn_k: int = 128  # tau width when impl='banded_knn' and tau not given
    # 0 = full-band aggregation (XLA scan or Pallas kernel); k > 0 = compacted
    # top-k aggregation (ops/banded.banded_compact_aggregate).  In
    # impl='banded_knn' the cap is knn_k (exact kNN semantics) and this
    # field only gates the formulation.
    aggregate_compact: int = 0

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices=None, influence=None, tau=None, rel=None, starts=None, mp_feats=None):
        """``mp_feats`` (B, N, C_in_block): when given (the strided
        ResidualBlock's banded-pallas path), the call ALSO computes the
        block's shortcut maxpool of ``mp_feats`` over the same in-reach
        neighborhood in one fused band pass (ops/residual_kernel.py) and
        returns ``(out, shortcut)`` — ``shortcut`` is None when the fused
        kernel does not apply (caller falls back to the separate maxpool).
        """
        cin = s_feats.shape[-1]
        k = self.kernel_size

        # torch kaiming_uniform(a=sqrt(5)) on a (K, Cin, Cout) tensor
        fan_in = cin * self.out_channels
        bound = 1.0 / np.sqrt(fan_in)
        weights = self.param(
            "weights",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (k, cin, self.out_channels),
        )

        # Per-layer kernel disposition, as a frozen parameter (stop_gradient
        # keeps Adam updates exactly zero).  Default init is the canonical
        # deterministic disposition, so all layers share it and the FPN's
        # shared-influence fast path stays valid; import_t7 fills each layer
        # with the reference checkpoint's own buffer (the reference rotates +
        # jitters the disposition per KPConv construction and load_state_dict
        # restores the trained buffers — kpconv.py:64-65).
        kp_default = np.asarray(load_kernel_points(self.radius, k, 3), np.float32)
        kernel_points = jax.lax.stop_gradient(
            self.param("kernel_points", lambda key, shape: jnp.asarray(kp_default), (k, 3))
        )

        def _ret(out, shortcut=None):
            # keep the plain-out contract unless the caller asked for the
            # fused shortcut (mp_feats is not None)
            return (out, shortcut) if mp_feats is not None else out

        if self.aggregate_compact > 0 and self.impl in ("banded", "banded_knn"):
            # compacted top-k formulation (XLA): select each query's k
            # nearest band rows, gather, and aggregate over (tile, k) instead
            # of (tile, band).  knn mode passes the imported per-layer
            # disposition (count ignores its padded reach); radius mode keeps
            # kp=None so the in-reach count uses the exact canonical reach,
            # matching banded_kpconv_aggregate bit-for-bit when counts <= k.
            knn_mode = self.impl == "banded_knn"
            kk = self.knn_k if knn_mode else self.aggregate_compact
            if rel is not None:
                # shared selection (banded_knn_select, nearest-first): the
                # first kk columns ARE the kk-nearest selection
                weighted, count = jax.vmap(
                    lambda f, q, s, r_: banded_compact_aggregate(
                        f, q, s, self.radius, self.sigma, k, kk, self.tile,
                        self.band_width, self.dtype, knn=knn_mode,
                        kp=kernel_points if knn_mode else None, rel=r_,
                    )
                )(s_feats, q_points, s_points, rel[..., :kk])
            else:
                weighted, count = jax.vmap(
                    lambda f, q, s: banded_compact_aggregate(
                        f, q, s, self.radius, self.sigma, k, kk, self.tile,
                        self.band_width, self.dtype, knn=knn_mode,
                        kp=kernel_points if knn_mode else None,
                    )
                )(s_feats, q_points, s_points)
            out = jnp.einsum(
                "bmkc,kcd->bmd",
                weighted.astype(self.dtype),
                weights.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out / count[..., None].astype(out.dtype)
            if self.use_bias:
                bias = self.param(
                    "bias",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -bound, bound
                    ),
                    (self.out_channels,),
                )
                out = out + bias
            return _ret(out)

        if self.impl == "banded_knn":
            if tau is None:
                tau = jax.vmap(
                    lambda q, s: banded_knn_tau(
                        q, s, self.knn_k, self.tile, self.band_width
                    )
                )(q_points, s_points)
            use_pallas = self.kernel == "pallas" or (
                self.kernel == "auto" and jax.default_backend() == "tpu"
            )
            if use_pallas:
                from cofii2p_tpu.ops.kpconv_kernel import (
                    banded_kpconv_aggregate_tau_pallas,
                    banded_kpconv_fused_tau_pallas,
                    fused_contraction_fits,
                )

                if fused_contraction_fits(
                    k, cin, self.out_channels, self.tile,
                    wbytes=jnp.dtype(self.dtype).itemsize,
                ):
                    out, count = banded_kpconv_fused_tau_pallas(
                        s_feats, q_points, s_points, weights, tau,
                        kernel_points, self.radius, self.sigma, k, self.tile,
                        self.band_width, self.dtype, starts,
                    )
                    out = out / count[..., None].astype(out.dtype)
                    if self.use_bias:
                        bias = self.param(
                            "bias",
                            lambda key, shape: jax.random.uniform(
                                key, shape, jnp.float32, -bound, bound
                            ),
                            (self.out_channels,),
                        )
                        out = out + bias
                    return _ret(out)

                weighted, count = banded_kpconv_aggregate_tau_pallas(
                    s_feats, q_points, s_points, tau, kernel_points,
                    self.radius, self.sigma, k, self.tile, self.band_width,
                    self.dtype, starts,
                )
            elif starts is not None:
                weighted, count = jax.vmap(
                    lambda f, q, s, t, st: banded_kpconv_aggregate(
                        f, q, s, self.radius, self.sigma, k,
                        self.tile, self.band_width, self.dtype,
                        tau=t, kp=kernel_points, starts=st,
                    )
                )(s_feats, q_points, s_points, tau, starts)
            else:
                weighted, count = jax.vmap(
                    lambda f, q, s, t: banded_kpconv_aggregate(
                        f, q, s, self.radius, self.sigma, k,
                        self.tile, self.band_width, self.dtype,
                        tau=t, kp=kernel_points,
                    )
                )(s_feats, q_points, s_points, tau)
            out = jnp.einsum(
                "bmkc,kcd->bmd",
                weighted.astype(self.dtype),
                weights.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out / count[..., None].astype(out.dtype)
            if self.use_bias:
                bias = self.param(
                    "bias",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -bound, bound
                    ),
                    (self.out_channels,),
                )
                out = out + bias
            return _ret(out)

        if self.impl == "banded":
            use_pallas = self.kernel == "pallas" or (
                self.kernel == "auto" and jax.default_backend() == "tpu"
            )
            if use_pallas:
                from cofii2p_tpu.ops.kpconv_kernel import (
                    banded_kpconv_aggregate_pallas,
                    banded_kpconv_fused_pallas,
                    fused_contraction_fits,
                )

                if mp_feats is not None:
                    # strided ResidualBlock: fold the shortcut maxpool of
                    # mp_feats into this conv's band pass — same membership
                    # (kernel reach), same tiles/bands/starts, one shared
                    # d2 + band DMA (ops/residual_kernel.py)
                    from cofii2p_tpu.ops.banded import _band_geometry
                    from cofii2p_tpu.ops.residual_kernel import (
                        banded_residual_fused_pallas,
                        residual_fused_fits,
                    )

                    if starts is not None:
                        band = min(self.band_width, s_points.shape[1])
                    else:
                        band = _band_geometry(
                            q_points.shape[1], s_points.shape[1], self.tile,
                            self.band_width,
                        )[2]
                    wb = jnp.dtype(self.dtype).itemsize
                    if fused_contraction_fits(
                        k, cin, self.out_channels, self.tile, wbytes=wb
                    ) and residual_fused_fits(
                        k, cin, self.out_channels, mp_feats.shape[-1], band,
                        self.tile, wbytes=wb,
                        fbytes=jnp.dtype(mp_feats.dtype).itemsize,
                    ):
                        out, count, shortcut = banded_residual_fused_pallas(
                            mp_feats, s_feats, weights, q_points, s_points,
                            self.radius, self.sigma, k, self.tile,
                            self.band_width, self.dtype, True, starts,
                        )
                        out = out / count[..., None].astype(out.dtype)
                        if self.use_bias:
                            bias = self.param(
                                "bias",
                                lambda key, shape: jax.random.uniform(
                                    key, shape, jnp.float32, -bound, bound
                                ),
                                (self.out_channels,),
                            )
                            out = out + bias
                        return _ret(out, shortcut)

                if fused_contraction_fits(
                    k, cin, self.out_channels, self.tile,
                    wbytes=jnp.dtype(self.dtype).itemsize,
                ):
                    # fused kernel: the (B, M, K, C) weighted tensor never
                    # reaches HBM in eval; when differentiated the VJP falls
                    # back to the unfused structure (weighted as residual)
                    out, count = banded_kpconv_fused_pallas(
                        s_feats, q_points, s_points, weights, self.radius,
                        self.sigma, k, self.tile, self.band_width, self.dtype,
                        starts,
                    )
                    out = out / count[..., None].astype(out.dtype)
                    if self.use_bias:
                        bias = self.param(
                            "bias",
                            lambda key, shape: jax.random.uniform(
                                key, shape, jnp.float32, -bound, bound
                            ),
                            (self.out_channels,),
                        )
                        out = out + bias
                    return _ret(out)

                weighted, count = banded_kpconv_aggregate_pallas(
                    s_feats, q_points, s_points, self.radius, self.sigma, k,
                    self.tile, self.band_width, self.dtype, starts,
                )
            elif starts is not None:
                weighted, count = jax.vmap(
                    lambda f, q, s, st: banded_kpconv_aggregate(
                        f, q, s, self.radius, self.sigma, k,
                        self.tile, self.band_width, self.dtype, starts=st,
                    )
                )(s_feats, q_points, s_points, starts)
            else:
                weighted, count = jax.vmap(
                    lambda f, q, s: banded_kpconv_aggregate(
                        f, q, s, self.radius, self.sigma, k,
                        self.tile, self.band_width, self.dtype,
                    )
                )(s_feats, q_points, s_points)
            out = jnp.einsum(
                "bmkc,kcd->bmd",
                weighted.astype(self.dtype),
                weights.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out / count[..., None].astype(out.dtype)
            if self.use_bias:
                bias = self.param(
                    "bias",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -bound, bound
                    ),
                    (self.out_channels,),
                )
                out = out + bias
            return _ret(out)

        if influence is None:
            influence = kernel_influence(
                q_points, s_points, neighbor_indices, self.radius, self.sigma, k,
                kp=kernel_points,
            )

        # bf16 path: casting the gathered features halves the dominant HBM
        # traffic of the whole branch (the (B,M,H,C) neighbor tensor), and
        # both einsums accumulate in fp32 on the MXU.
        nbr_feats = gather_neighbors(
            s_feats.astype(self.dtype), neighbor_indices
        )  # (B, M, H, C)
        weighted = jnp.einsum(
            "bmhk,bmhc->bmkc",
            influence.astype(self.dtype),
            nbr_feats,
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum(
            "bmkc,kcd->bmd",
            weighted.astype(self.dtype),
            weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )

        # normalize by the number of "active" neighbors — the reference counts
        # neighbors whose feature sum is > 0 (kpconv.py:113-116), a quirk we
        # keep for numerical parity.
        active = jnp.sum(nbr_feats, axis=-1) > 0.0  # (B, M, H)
        count = jnp.maximum(jnp.sum(active, axis=-1), 1)  # (B, M)
        out = out / count[..., None].astype(out.dtype)

        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.out_channels,),
            )
            out = out + bias
        return _ret(out)


class UnaryBlock(nn.Module):
    """Linear -> norm -> LeakyReLU(0.1) (reference modules.py:63-94)."""

    out_channels: int
    norm: str = "gn"
    group_norm: int = 32
    has_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(self.out_channels, dtype=self.dtype, name="mlp")(x)
        x = norm_factory(self.norm, self.group_norm)(x)
        if self.has_relu:
            x = leaky_relu(x)
        return x


class ConvBlock(nn.Module):
    """KPConv -> norm -> LeakyReLU (reference modules.py:115-159)."""

    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    norm: str = "gn"
    group_norm: int = 32
    dtype: Any = jnp.float32
    impl: str = "gather"
    tile: int = 128
    band_width: int = 1024
    kernel: str = "xla"
    knn_k: int = 128
    aggregate_compact: int = 0

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices=None, influence=None, tau=None, rel=None, starts=None):
        x = KPConv(
            self.out_channels, self.kernel_size, self.radius, self.sigma,
            dtype=self.dtype, impl=self.impl, tile=self.tile,
            band_width=self.band_width, kernel=self.kernel,
            knn_k=self.knn_k, aggregate_compact=self.aggregate_compact,
            name="KPConv",
        )(s_feats, q_points, s_points, neighbor_indices, influence, tau, rel, starts)
        x = norm_factory(self.norm, self.group_norm)(x)
        return leaky_relu(x)


class ResidualBlock(nn.Module):
    """Bottleneck residual KPConv block (reference modules.py:162-240)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    norm: str = "gn"
    group_norm: int = 32
    strided: bool = False
    dtype: Any = jnp.float32
    impl: str = "gather"
    tile: int = 128
    band_width: int = 1024
    kernel: str = "xla"
    knn_k: int = 128
    # 0 = banded select maxpool; k > 0 = compacted top-k maxpool
    # (ops/banded.banded_compact_maxpool) for the strided shortcut
    maxpool_compact: int = 0
    aggregate_compact: int = 0
    # fold the shortcut maxpool into the conv's Pallas band pass
    # (config.kpconv_residual_fused; measured a wash — PERF.md round 5)
    residual_fused: bool = False

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices=None, influence=None, tau=None, rel=None, starts=None):
        mid = self.out_channels // 4

        x = s_feats
        if self.in_channels != mid:
            x = UnaryBlock(mid, self.norm, self.group_norm, dtype=self.dtype, name="unary1")(x)
        # strided banded-pallas blocks fold the shortcut maxpool into the
        # conv's band pass (ops/residual_kernel.py) — request it by passing
        # the block input as mp_feats; KPConv returns (out, shortcut) then,
        # with shortcut None when the fused kernel's VMEM check rejects
        fused_mp = None
        if (
            self.residual_fused
            and self.strided
            and self.impl == "banded"
            and self.maxpool_compact == 0
            and self.aggregate_compact == 0
            and (
                self.kernel == "pallas"
                or (self.kernel == "auto" and jax.default_backend() == "tpu")
            )
        ):
            fused_mp = s_feats
        x = KPConv(
            mid, self.kernel_size, self.radius, self.sigma, dtype=self.dtype,
            impl=self.impl, tile=self.tile, band_width=self.band_width,
            kernel=self.kernel, knn_k=self.knn_k,
            aggregate_compact=self.aggregate_compact, name="KPConv",
        )(x, q_points, s_points, neighbor_indices, influence, tau, rel, starts,
          mp_feats=fused_mp)
        fused_shortcut = None
        if fused_mp is not None:
            x, fused_shortcut = x
        x = norm_factory(self.norm, self.group_norm)(x)
        x = leaky_relu(x)
        x = UnaryBlock(
            self.out_channels, self.norm, self.group_norm, has_relu=False,
            dtype=self.dtype, name="unary2",
        )(x)

        if self.strided:
            if fused_shortcut is not None:
                shortcut = fused_shortcut
            elif self.maxpool_compact > 0 and self.impl in ("banded", "banded_knn"):
                # compacted top-k formulation (XLA): select each query's
                # k nearest band rows, gather, max — no band rescan
                knn_mode = self.impl == "banded_knn"
                mp_k = self.knn_k if knn_mode else self.maxpool_compact
                r_active = (
                    0.0 if knn_mode
                    else kernel_reach(self.radius, self.sigma, self.kernel_size)
                )
                if rel is not None:
                    shortcut = jax.vmap(
                        lambda f, q, s, r_: banded_compact_maxpool(
                            f, q, s, r_active, mp_k, self.tile,
                            self.band_width, knn=knn_mode, rel=r_,
                        )
                    )(s_feats, q_points, s_points, rel[..., :mp_k])
                else:
                    shortcut = jax.vmap(
                        lambda f, q, s: banded_compact_maxpool(
                            f, q, s, r_active, mp_k, self.tile,
                            self.band_width, knn=knn_mode,
                        )
                    )(s_feats, q_points, s_points)
            elif self.impl == "banded_knn":
                # reference kNN maxpool semantics: max over the k nearest,
                # no radius mask (functional.py:53-66)
                if tau is None:
                    tau = jax.vmap(
                        lambda q, s: banded_knn_tau(
                            q, s, self.knn_k, self.tile, self.band_width
                        )
                    )(q_points, s_points)
                use_pallas = self.kernel == "pallas" or (
                    self.kernel == "auto" and jax.default_backend() == "tpu"
                )
                if use_pallas:
                    from cofii2p_tpu.ops.maxpool_kernel import (
                        banded_maxpool_tau_pallas,
                    )

                    shortcut = banded_maxpool_tau_pallas(
                        s_feats, q_points, s_points, tau, self.tile,
                        self.band_width, True, starts,
                    )
                elif starts is not None:
                    shortcut = jax.vmap(
                        lambda f, q, s, t, st: banded_maxpool(
                            f, q, s, 0.0, self.tile, self.band_width, tau=t,
                            starts=st,
                        )
                    )(s_feats, q_points, s_points, tau, starts)
                else:
                    shortcut = jax.vmap(
                        lambda f, q, s, t: banded_maxpool(
                            f, q, s, 0.0, self.tile, self.band_width, tau=t
                        )
                    )(s_feats, q_points, s_points, tau)
            elif self.impl == "banded":
                r_active = kernel_reach(self.radius, self.sigma, self.kernel_size)
                use_pallas = self.kernel == "pallas" or (
                    self.kernel == "auto" and jax.default_backend() == "tpu"
                )
                if use_pallas:
                    from cofii2p_tpu.ops.maxpool_kernel import (
                        banded_maxpool_pallas,
                    )

                    shortcut = banded_maxpool_pallas(
                        s_feats, q_points, s_points, r_active, self.tile,
                        self.band_width, True, starts,
                    )
                elif starts is not None:
                    shortcut = jax.vmap(
                        lambda f, q, s, st: banded_maxpool(
                            f, q, s, r_active, self.tile, self.band_width,
                            starts=st,
                        )
                    )(s_feats, q_points, s_points, starts)
                else:
                    shortcut = jax.vmap(
                        lambda f, q, s: banded_maxpool(
                            f, q, s, r_active, self.tile, self.band_width
                        )
                    )(s_feats, q_points, s_points)
            else:
                shortcut = neighbor_maxpool(s_feats, neighbor_indices)
        else:
            shortcut = s_feats
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(
                self.out_channels,
                self.norm,
                self.group_norm,
                has_relu=False,
                dtype=self.dtype,
                name="unary_shortcut",
            )(shortcut)
        return leaky_relu(x + shortcut)


class KPConvFPN(nn.Module):
    """5-stage KPConv encoder + 3-step decoder
    (reference kp_backbone.py:7-128; channels 64..2048, radius x2 per stage).

    Input: the batched pyramid dict (points/neighbors/subsampling/upsampling)
    plus feats (B, N0, input_dim).
    Returns [fine (B,N1,output_dim), (B,N2,512), (B,N3,1024), latent (B,N4,2048)]
    — finest first, like the reference's reversed feats_list.
    """

    input_dim: int = 4
    output_dim: int = 64
    init_dim: int = 64
    kernel_size: int = 15
    init_radius: float = 0.425
    init_sigma: float = 0.2
    norm: str = "gn"
    group_norm: int = 32
    dtype: Any = jnp.float32
    impl: str = "gather"
    tile: int = 128
    band_width: int = 1024
    band_plan: Any = None  # per-support-level widths; None = doubling rule
    kernel: str = "xla"
    knn_k: int = 128  # tau width for impl='banded_knn'
    # per-support-level compacted-maxpool ks (None entries = select kernel)
    maxpool_compact_plan: Any = None
    # per-support-level compacted-aggregation ks (None/0 = full-band path)
    aggregate_compact_plan: Any = None
    # per-support-level dynamic window widths (config.kpconv_dynamic_plan):
    # 0/None = static band plan; W > 0 = per-tile device-measured starts
    # with a W-wide window (ops/banded.dynamic_band_starts; radius-banded
    # impl only, differentiable).  ``dynamic_plan`` applies to the CROSS
    # (strided, query level != support level) pairs; ``dynamic_plan_self``
    # to the self pairs, falling back to ``dynamic_plan`` when None (see
    # config.kpconv_dynamic_plan_self for the measured rationale)
    dynamic_plan: Any = None
    dynamic_plan_self: Any = None
    # window placement estimator for dynamic starts (ops/banded.py::
    # dynamic_band_starts): 'best' = max-kept-mass sliding window
    dynamic_center: str = "best"
    # fold strided shortcut maxpools into the conv band pass (see
    # ResidualBlock.residual_fused)
    residual_fused: bool = False
    # per-support-level kNN window widths (impl='banded_knn' only; see
    # config.kpconv_knn_window_plan — exact wherever the k-nearest fit)
    knn_window_plan: Any = None
    # share one influence tensor per (level, radius) across sibling blocks —
    # valid only while every KPConv uses the canonical kernel disposition.
    # Set False after import_t7 (per-layer reference dispositions) so each
    # block computes influence from its own kernel_points parameter.
    shared_influence: bool = True

    @nn.compact
    def __call__(self, feats, points, neighbors=None, subsampling=None, upsampling=None):
        d, ks = self.init_dim, self.kernel_size
        r, s = self.init_radius, self.init_sigma
        knn_mode = self.impl == "banded_knn"
        mapless = self.impl in ("banded", "banded_knn")
        banded = mapless  # gates the no-neighbor-map plumbing below
        shared = self.shared_influence

        def bw(support_lvl: int) -> int:
            # The band width needed for ~99% influence-mass coverage roughly
            # doubles per level (radius doubles while per-index density only
            # halves; tools/band_study.py), so without an explicit plan
            # ``band_width`` is the level-0 width scaled by the *support*
            # level.  ``band_plan`` gives exact per-level widths instead
            # (config default: measured 128-multiples under 'xz' ordering,
            # tools/order_study.py).
            if self.band_plan is not None:
                if support_lvl < len(self.band_plan):
                    return int(self.band_plan[support_lvl])
                # past the plan's end (e.g. num_stages raised without
                # re-tuning): continue with the doubling rule from the last
                # planned width
                return int(self.band_plan[-1]) * (
                    2 ** (support_lvl - len(self.band_plan) + 1)
                )
            return self.band_width * (2**support_lvl)

        def mp_compact(support_lvl: int) -> int:
            if self.maxpool_compact_plan is None:
                return 0
            if support_lvl < len(self.maxpool_compact_plan):
                return int(self.maxpool_compact_plan[support_lvl] or 0)
            return 0

        def agg_compact(support_lvl: int) -> int:
            if self.aggregate_compact_plan is None:
                return 0
            if support_lvl < len(self.aggregate_compact_plan):
                return int(self.aggregate_compact_plan[support_lvl] or 0)
            return 0

        def dyn_w(support_lvl: int, is_self: bool) -> int:
            # dynamic starts are radius-banded only (knn membership is
            # tau-based and the parity path keeps the static plan).
            plan = self.dynamic_plan
            if is_self and self.dynamic_plan_self is not None:
                plan = self.dynamic_plan_self
            if plan is None or self.impl != "banded":
                return 0
            w = int(plan[support_lvl] or 0) if support_lvl < len(plan) else 0
            # Mutually exclusive with the compacted formulations: the compact
            # branches take no `starts`, and kw() would silently reinterpret
            # the dynamic window width W as the half-band margin
            # (band = span + 2W) — a quiet geometry/accuracy change.  Fail
            # loudly like the dynamic backwards do (ADVICE r3 #1).
            if w and (mp_compact(support_lvl) or agg_compact(support_lvl)):
                raise NotImplementedError(
                    "kpconv_dynamic_plan cannot be combined with "
                    "maxpool_compact_plan/aggregate_compact_plan on the same "
                    f"support level ({support_lvl}): the compacted branches "
                    "ignore dynamic starts"
                )
            return w

        def knn_w(support_lvl: int) -> int:
            # kNN window width (impl='banded_knn'): windows the tau kernels'
            # scan to the max-in-tau-mass span; exact wherever the k-nearest
            # fit the width (ops/banded.dynamic_knn_starts)
            if not knn_mode or self.knn_window_plan is None:
                return 0
            plan = self.knn_window_plan
            return int(plan[support_lvl] or 0) if support_lvl < len(plan) else 0

        def kw(support_lvl: int, is_self: bool = True) -> dict:
            w = dyn_w(support_lvl, is_self) or knn_w(support_lvl)
            return dict(
                norm=self.norm, group_norm=self.group_norm, dtype=self.dtype,
                impl=self.impl, tile=self.tile,
                band_width=(w if w else bw(support_lvl)),
                kernel=self.kernel, knn_k=self.knn_k,
                aggregate_compact=agg_compact(support_lvl),
            )

        def starts_for(q_pts, s_pts, support_lvl, radius_scale, is_self):
            # one starts tensor per (query level, support level) pair,
            # shared by every sibling block on it (the blocks at a pair all
            # run the same radius, so one in-reach span serves them all).
            # knn mode is handled by knn_tau_starts (the tau and its window
            # are produced together there).
            w = dyn_w(support_lvl, is_self)
            if w == 0:
                return None
            r_act = kernel_reach(
                r * radius_scale, s * radius_scale, ks
            )
            # subsampled occupancy estimate at the big levels: the full
            # (tile, N) distance block costs more than the windows save at
            # N >= 10240 (PERF.md round-5 shallow sweep); the mass profile
            # is smooth at window scale, so stride-N/2560 sampling places
            # the window within ~stride rows at ~1/stride the cost
            stride = (
                max(1, s_pts.shape[-2] // 2560)
                if self.dynamic_center == "best" else 1
            )
            return jax.vmap(
                lambda q, sp: dynamic_band_starts(
                    q, sp, r_act, self.tile, w, self.dynamic_center, stride
                )
            )(q_pts, s_pts)

        def pair_aux(q_pts, s_pts, support_lvl, radius_scale, is_self):
            """(tau, starts) for a (query, support) pair under the impl."""
            if knn_mode:
                return knn_tau_starts(q_pts, s_pts, support_lvl)
            return None, starts_for(
                q_pts, s_pts, support_lvl, radius_scale, is_self
            )

        def kw_res(support_lvl: int, is_self: bool = True) -> dict:
            return dict(
                kw(support_lvl, is_self),
                maxpool_compact=mp_compact(support_lvl),
                residual_fused=self.residual_fused,
            )

        def tau_for(q_pts, s_pts, support_lvl):
            # one tau per (query level, support level) pair, shared by all
            # sibling blocks — the banded_knn twin of the shared influence
            # tensor below.  The Pallas bisection producer (bit-identical
            # tau, ops/tau_kernel.py) replaces the lax.top_k band sort on
            # TPU — the sort was 95.7 ms/batch of the .t7 path (PERF.md).
            if not knn_mode:
                return None
            use_pallas = self.kernel == "pallas" or (
                self.kernel == "auto" and jax.default_backend() == "tpu"
            )
            if use_pallas:
                from cofii2p_tpu.ops.tau_kernel import banded_knn_tau_pallas

                return banded_knn_tau_pallas(
                    q_pts, s_pts, self.knn_k, self.tile, bw(support_lvl)
                )
            return jax.vmap(
                lambda q, sp: banded_knn_tau(
                    q, sp, self.knn_k, self.tile, bw(support_lvl)
                )
            )(q_pts, s_pts)

        def knn_tau_starts(q_pts, s_pts, support_lvl):
            """(tau, starts) for a knn pair.  With a window plan width, the
            round-5 windowed-tau chain: a subsampled proxy tau places the
            max-in-tau-mass window, then the EXACT in-window k-th distance
            is computed over just the window — the full-band top_k was
            95.7 ms/batch of the .t7 path (PERF.md).  Without a width, the
            full-band tau (round-4 behavior)."""
            w = knn_w(support_lvl)
            if w == 0:
                return tau_for(q_pts, s_pts, support_lvl), None
            k = self.knn_k
            stride = max(1, s_pts.shape[-2] // 2560)
            proxy = jax.vmap(
                lambda q, sp: banded_knn_tau(
                    q, sp[::stride], max(k // stride, 1), self.tile,
                    max(bw(support_lvl) // stride, 32),
                )
            )(q_pts, s_pts)
            starts = jax.vmap(
                lambda q, sp, t: dynamic_knn_starts(
                    q, sp, t, self.tile, w, stride
                )
            )(q_pts, s_pts, proxy)
            tau = jax.vmap(
                lambda q, sp, st: banded_knn_tau(
                    q, sp, k, self.tile, w, starts=st
                )
            )(q_pts, s_pts, starts)
            return tau, starts

        def rel_for(q_pts, s_pts, support_lvl, agg_k, mp_k=0):
            # one nearest-first selection per (query level, support level)
            # pair, shared by every compacted consumer on it (convs slice
            # the first agg_k columns, the shortcut maxpool the first mp_k)
            # — amortizes the top_k across sibling blocks, like tau above
            ks = [x for x in (agg_k, mp_k) if x > 0]
            if not ks:
                return None
            kmax = self.knn_k if knn_mode else max(ks)
            return jax.vmap(
                lambda q, sp: banded_knn_select(
                    q, sp, kmax, self.tile, bw(support_lvl)
                )
            )(q_pts, s_pts)

        enc = {}
        nbr0 = None if banded else neighbors[0]
        inf0 = (
            None
            if banded or not shared
            else kernel_influence(points[0], points[0], nbr0, r, s, ks)
        )
        rel0 = rel_for(points[0], points[0], 0, agg_compact(0))
        tau0, starts0 = pair_aux(points[0], points[0], 0, 1, is_self=True)
        x = ConvBlock(d, ks, r, s, name="encoder1_1", **kw(0))(
            feats, points[0], points[0], nbr0, inf0, tau0, rel0, starts0
        )
        x = ResidualBlock(d, d * 2, ks, r, s, name="encoder1_2", **kw(0))(
            x, points[0], points[0], nbr0, inf0, tau0, rel0, starts0
        )
        enc[1] = x

        stage_specs = [
            # (stage, channels at entry, channels at exit)
            (2, d * 2, d * 4),
            (3, d * 4, d * 8),
            (4, d * 8, d * 16),
            (5, d * 16, d * 32),
        ]
        for stage, cin, cout in stage_specs:
            lvl = stage - 1
            nbr = None if banded else neighbors[lvl]
            sub = None if banded else subsampling[lvl - 1]
            inf_self = (
                None
                if banded or not shared
                else kernel_influence(
                    points[lvl], points[lvl], nbr,
                    r * 2 ** (stage - 1), s * 2 ** (stage - 1), ks,
                )
            )

            rel_cross = rel_for(
                points[lvl], points[lvl - 1], lvl - 1,
                agg_compact(lvl - 1), mp_compact(lvl - 1),
            )
            rel_self = rel_for(points[lvl], points[lvl], lvl, agg_compact(lvl))
            tau_cross, starts_cross = pair_aux(
                points[lvl], points[lvl - 1], lvl - 1, 2 ** (stage - 2),
                is_self=False,
            )
            tau_self, starts_self = pair_aux(
                points[lvl], points[lvl], lvl, 2 ** (stage - 1), is_self=True,
            )
            x = ResidualBlock(
                cin,
                cin,
                ks,
                r * 2 ** (stage - 2),
                s * 2 ** (stage - 2),
                strided=True,
                name=f"encoder{stage}_1",
                **kw_res(lvl - 1, is_self=False),
            )(x, points[lvl], points[lvl - 1], sub, None, tau_cross, rel_cross,
              starts_cross)
            x = ResidualBlock(
                cin,
                cout,
                ks,
                r * 2 ** (stage - 1),
                s * 2 ** (stage - 1),
                name=f"encoder{stage}_2",
                **kw(lvl),
            )(x, points[lvl], points[lvl], nbr, inf_self, tau_self, rel_self,
              starts_self)
            x = ResidualBlock(
                cout,
                cout,
                ks,
                r * 2 ** (stage - 1),
                s * 2 ** (stage - 1),
                name=f"encoder{stage}_3",
                **kw(lvl),
            )(x, points[lvl], points[lvl], nbr, inf_self, tau_self, rel_self,
              starts_self)
            enc[stage] = x

        def upsample(feats_coarse, lvl):
            # fine queries at level lvl, support at level lvl+1
            if banded:
                idx = jax.vmap(
                    lambda q, sp: banded_nearest_index(
                        q, sp, self.tile, bw(lvl + 1)
                    )
                )(points[lvl], points[lvl + 1])
                return jnp.take_along_axis(feats_coarse, idx[..., None], axis=-2)
            return nearest_upsample(feats_coarse, upsampling[lvl])

        kw2 = dict(norm=self.norm, group_norm=self.group_norm, dtype=self.dtype)
        latent = enc[5]
        up4 = upsample(latent, 3)
        up4 = UnaryBlock(d * 16, name="decoder4", **kw2)(
            jnp.concatenate([up4, enc[4]], axis=-1)
        )
        up3 = upsample(up4, 2)
        up3 = UnaryBlock(d * 8, name="decoder3", **kw2)(
            jnp.concatenate([up3, enc[3]], axis=-1)
        )
        up2 = upsample(up3, 1)
        up2 = Linear(self.output_dim, dtype=self.dtype, name="decoder2")(
            jnp.concatenate([up2, enc[2]], axis=-1)
        )
        return [up2, up3, up4, latent]
