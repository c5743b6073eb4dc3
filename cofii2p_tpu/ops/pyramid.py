"""On-device multi-level point pyramid construction.

Reproduces the contract of the reference preprocessor
(/root/reference/model/kpconv/preprocess_data.py:36-107): 5 levels of points
(N, N/2, ..., N/16), per-level k=128 self-neighbors, plus cross-level
``subsampling`` (fine->coarse queries) and ``upsampling`` (coarse->fine
queries) kNN index maps.

The reference runs this on CPU in DataLoader workers (15 kNN searches per
sample).  Here the pyramid is a pure jittable function of the perturbed cloud
and an rng key, so it runs on the TPU inside the training/eval step and
vmaps over the batch.

Deviation from the reference (documented): the reference random-halves each
level with replacement (np.random.choice default, preprocess_data.py:58),
which duplicates points; we subsample *without* replacement via
jax.random.permutation.  The distribution of retained geometry is the same
in expectation and eval metrics are statistical anyway (the reference
randomizes the kernel disposition per load, kernel_points.py:429-453).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.knn import knn


def morton_order(
    points: jax.Array, voxel: float = 0.4, ordering: str = "xyz"
) -> jax.Array:
    """Permutation sorting points along a Z-order (Morton) curve.

    Spatially local points get nearby indices, so the kNN index maps become
    near-diagonal and the banded KPConv path's radius neighborhoods fit in
    narrow contiguous index bands.  Any permutation of a level is
    semantically equivalent (downstream consumers go through index maps or
    radius bands built afterwards).

    ordering='xyz': 3-D Z-order (10 bits/axis).
    ordering='xz':  2-D Z-order on the camera-frame ground plane (x lateral,
      z depth; 15 bits/axis), ignoring height.  LiDAR scenes are
      ground-plane-dominated, so spending index locality on y wastes band
      width: at equal influence-mass coverage the 'xz' curve needs ~1.8x
      narrower bands than 'xyz' (tools/order_study.py; Hilbert variants
      measured no better).  All points in a vertical column are contiguous,
      so tall structures only dilute — never break — band locality.
    """
    lo = jnp.min(points, axis=0)

    if ordering == "xz":
        q = jnp.clip(((points - lo) / voxel).astype(jnp.int32), 0, (1 << 15) - 1)

        def spread2(v):  # interleave 15 bits with 1-bit gaps (fits int32)
            v = (v | (v << 8)) & 0x00FF00FF
            v = (v | (v << 4)) & 0x0F0F0F0F
            v = (v | (v << 2)) & 0x33333333
            v = (v | (v << 1)) & 0x55555555
            return v

        code = spread2(q[:, 0]) | (spread2(q[:, 2]) << 1)
        return jnp.argsort(code)

    assert ordering == "xyz", ordering
    q = jnp.clip(((points - lo) / voxel).astype(jnp.int32), 0, (1 << 10) - 1)

    def spread(v):  # interleave 10 bits with 2-bit gaps
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.argsort(code)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sizes", "neighbor_num", "approx", "upsample_k", "need_maps", "ordering",
    ),
)
def build_pyramid(
    points: jax.Array,
    rng: jax.Array,
    sizes: Sequence[int],
    neighbor_num: int = 128,
    approx: bool = True,
    upsample_k: int = 8,
    need_maps: bool = True,
    ordering: str = "xyz",
) -> dict:
    """Build the point pyramid + neighbor maps for one sample.

    Args:
      points: (N0, 3) with N0 == sizes[0].
      rng: PRNG key driving the random per-level subsampling.
      sizes: static per-level point counts, halving per level.
      neighbor_num: static k for all three kNN map families.

    Returns:
      dict with keys (matching the reference data contract,
      preprocess_data.py:101-107):
        'points':      list of (N_l, 3)
        'lengths':     list of int
        'neighbors':   list of (N_l, k) self-kNN indices
        'subsampling': list of (N_{l+1}, k) indices into level l
        'upsampling':  list of (N_l, k) indices into level l+1
    """
    assert points.shape[0] == sizes[0], (points.shape, sizes)
    num_stages = len(sizes)

    perm0 = morton_order(points, ordering=ordering)
    points_list = [jnp.take(points, perm0, axis=0)]
    for lvl in range(1, num_stages):
        rng, sub = jax.random.split(rng)
        prev = points_list[-1]
        perm = jax.random.permutation(sub, prev.shape[0])[: sizes[lvl]]
        sub_pts = jnp.take(prev, perm, axis=0)
        points_list.append(
            jnp.take(sub_pts, morton_order(sub_pts, ordering=ordering), axis=0)
        )

    out = {
        "points": points_list,
        "lengths": list(sizes),
        # level-0 Morton permutation: callers must realign per-point
        # attributes (feats) with jnp.take(attrs, perm0, axis=0)
        "perm0": perm0,
    }
    if not need_maps:
        # banded KPConv (ops/banded.py) needs no index maps at all — the
        # pyramid is just Morton-sorted levels; every neighbor search the
        # reference runs on CPU workers (preprocess_data.py:74-99) vanishes.
        return out

    neighbors_list = []
    subsampling_list = []
    upsampling_list = []
    for lvl in range(num_stages):
        cur = points_list[lvl]
        # KPConv's neighbor aggregation and the maxpool shortcut are
        # order-invariant, so the self/subsampling maps are re-sorted by
        # *index* (ascending): with Morton-ordered levels this makes the
        # gather access pattern monotone and band-local.  The upsampling
        # maps keep distance order — their consumers (nearest_upsample,
        # knn_interpolate) rely on column 0 being the nearest.
        neighbors_list.append(jnp.sort(knn(cur, cur, neighbor_num, approx=approx), axis=-1))
        if lvl < num_stages - 1:
            sub = points_list[lvl + 1]
            # queries at the coarse level, database at the fine level
            subsampling_list.append(
                jnp.sort(knn(sub, cur, neighbor_num, approx=approx), axis=-1)
            )
            # queries at the fine level, database at the coarse level; the
            # consumers (nearest_upsample col 0, knn_interpolate first 3)
            # never read past a few columns, so k is small here (the
            # reference computes 128, preprocess_data.py:97 — pure waste)
            upsampling_list.append(knn(cur, sub, upsample_k, approx=approx))

    out["neighbors"] = neighbors_list
    out["subsampling"] = subsampling_list
    out["upsampling"] = upsampling_list
    return out


def build_pyramid_batched(
    points: jax.Array,
    rng: jax.Array,
    sizes,
    neighbor_num=128,
    need_maps: bool = True,
    ordering: str = "xyz",
):
    """vmap of :func:`build_pyramid` over a leading batch dim.

    points: (B, N0, 3); rng is split into B keys.  ``ordering`` must match
    the band plan of any banded consumer (config pairs 'xz' with the
    xz-tuned kpconv_band_plan).
    """
    keys = jax.random.split(rng, points.shape[0])
    return jax.vmap(
        lambda p, k: build_pyramid(
            p, k, tuple(sizes), neighbor_num,
            need_maps=need_maps, ordering=ordering,
        )
    )(points, keys)
