"""Fixed-shape voxel-grid subsampling and radius search (pure JAX).

Capability parity with the reference's native dependencies:
- Open3D C++ ``voxel_down_sample`` (data/kitti.py:159, averaged attributes per
  voxel) — here a jittable scatter-mean over hashed voxel ids with a static
  output size + validity mask;
- geotransformer.ext C++ ``grid_subsampling`` / ``radius_neighbors``
  (model/kpconv/ops/grid_subsample.py, radius_search.py — vestigial in the
  reference but part of its public op surface).

The host data pipeline also has a NumPy twin (cofii2p_tpu/data/voxel.py) for
use before shapes are fixed; this module is the on-device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.knn import knn_with_distances


@functools.partial(jax.jit, static_argnames=("max_points",))
def grid_subsample(
    points: jax.Array,
    voxel_size: float,
    max_points: int,
    valid_mask: jax.Array | None = None,
    attributes: jax.Array | None = None,
):
    """Voxel-grid downsample with per-voxel averaging, fixed output shape.

    Args:
      points: (N, 3).
      voxel_size: grid pitch.
      max_points: static output capacity; voxels beyond capacity are dropped
        (sorted by voxel hash, i.e. effectively arbitrary, like hash-map
        iteration order in the native implementations).
      valid_mask: optional (N,) bool; False rows are ignored.
      attributes: optional (N, A) extra channels averaged alongside xyz
        (the reference averages intensity/normals through Open3D's
        colors/normals channels, kitti.py:148-166).

    Returns:
      (out_points (max_points, 3), out_attrs (max_points, A) or None,
       out_valid (max_points,) bool)
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    # invalid rows sort last (int32-safe lexicographic key, no 64-bit packing)
    big = jnp.int32(2**31 - 1)
    coords = jnp.where(valid_mask[:, None], coords, big)

    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    key_s = coords[order]
    pts_s = points[order]
    valid_s = valid_mask[order]

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(key_s[1:] != key_s[:-1], axis=-1)]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # (N,)
    # segments past capacity (or invalid) scatter into a trash slot
    slot = jnp.where(valid_s & (seg_id < max_points), seg_id, max_points)

    sums = jnp.zeros((max_points + 1, 3), points.dtype).at[slot].add(pts_s)
    cnts = jnp.zeros((max_points + 1,), points.dtype).at[slot].add(1.0)
    denom = jnp.maximum(cnts[:max_points, None], 1.0)
    out_points = sums[:max_points] / denom
    out_valid = cnts[:max_points] > 0

    out_attrs = None
    if attributes is not None:
        attrs_s = attributes[order]
        asums = (
            jnp.zeros((max_points + 1, attributes.shape[-1]), attributes.dtype)
            .at[slot]
            .add(attrs_s)
        )
        out_attrs = asums[:max_points] / denom
    return out_points, out_attrs, out_valid


@functools.partial(jax.jit, static_argnames=("max_neighbors",))
def radius_search(
    queries: jax.Array,
    database: jax.Array,
    radius: float,
    max_neighbors: int,
) -> jax.Array:
    """Fixed-size radius neighborhoods.

    Returns (Nq, max_neighbors) int32 indices into ``database``; entries
    beyond the radius are set to len(database) (the shadow-point convention
    consumed by KPConv masking, reference kpconv.py:91/103).
    """
    idx, sq = knn_with_distances(queries, database, max_neighbors)
    return jnp.where(sq <= radius * radius, idx, database.shape[0]).astype(jnp.int32)
