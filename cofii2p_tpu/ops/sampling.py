"""Point sampling ops: farthest point sampling + kNN feature interpolation.

Covers the remaining reference op surface:
- FarthestSampler (data/kitti.py:68-87, NumPy loop) as a jittable
  ``lax.fori_loop`` with static output size;
- knn_interpolate / global_avgpool (model/kpconv/functional.py:24-89).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.geometry import gather_neighbors


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling(points: jax.Array, k: int, rng: jax.Array) -> jax.Array:
    """Indices of k farthest-point samples (greedy max-min).

    Args:
      points: (N, 3).
      k: static number of samples.
      rng: key for the random initial point (the reference starts at a random
        index, kitti.py:78).

    Returns:
      (k,) int32 indices.
    """
    n = points.shape[0]
    first = jax.random.randint(rng, (), 0, n)

    d0 = jnp.sum((points - points[first]) ** 2, axis=-1)

    def body(i, carry):
        dists, idxs = carry
        nxt = jnp.argmax(dists)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        nd = jnp.sum((points - points[nxt]) ** 2, axis=-1)
        return jnp.minimum(dists, nd), idxs

    idxs = jnp.zeros((k,), jnp.int32).at[0].set(first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, k, body, (d0, idxs))
    return idxs


def knn_interpolate(
    s_feats: jax.Array,
    q_points: jax.Array,
    s_points: jax.Array,
    neighbor_indices: jax.Array,
    k: int,
    eps: float = 1e-8,
) -> jax.Array:
    """Inverse-squared-distance kNN feature interpolation
    (reference functional.py:24-50).  Shadow indices (== len(s_points))
    contribute zero weight.

    Shapes: s_feats (..., M, C), q_points (..., N, 3), s_points (..., M, 3),
    neighbor_indices (..., N, >=k) -> (..., N, C).
    """
    m = s_feats.shape[-2]
    idx = neighbor_indices[..., :k]
    knn_pts = gather_neighbors(s_points, idx)  # (..., N, k, 3)
    knn_feats = gather_neighbors(s_feats, idx)  # (..., N, k, C)
    sq = jnp.sum((q_points[..., :, None, :] - knn_pts) ** 2, axis=-1)
    mask = (idx < m).astype(s_feats.dtype)
    w = mask / (sq + eps)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    return jnp.sum(knn_feats * w[..., None], axis=-2)


def global_avgpool(feats: jax.Array, valid_mask: jax.Array | None = None) -> jax.Array:
    """Mean over points, optionally masked (the reference's ragged
    batch_lengths loop, functional.py:69-89, becomes a mask at fixed shape).

    feats (..., N, C) -> (..., C).
    """
    if valid_mask is None:
        return jnp.mean(feats, axis=-2)
    w = valid_mask.astype(feats.dtype)
    return jnp.sum(feats * w[..., None], axis=-2) / jnp.maximum(
        jnp.sum(w, axis=-1, keepdims=True), 1.0
    )
