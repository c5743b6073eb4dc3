"""On-device k-nearest-neighbor search with static shapes.

Replaces the reference's CPU Open3D-ML ``KNNSearch`` calls
(/root/reference/model/kpconv/preprocess_data.py:74-99) — the single biggest
host-side cost of the reference pipeline (15 kNN searches per sample in
DataLoader workers) — with a blocked brute-force search that runs inside the
jitted step.

Design notes (TPU):
- the full 20480^2 fp32 distance matrix would be 1.6 GB; we tile the query
  axis with ``lax.map`` so peak memory is one (chunk, Nd) tile while the
  (chunk,3)x(3,Nd) inner product still lands on the MXU;
- ``jax.lax.top_k`` gives the sorted k smallest per row (static k=128);
- exactness is what the reference computes (its own fallback is the same
  brute-force math, preprocess_data.py:131-143), so no approximation error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.geometry import pairwise_sq_dist


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k", "query_chunk", "approx"))
def knn(
    queries: jax.Array,
    database: jax.Array,
    k: int,
    query_chunk: int = 2048,
    approx: bool = False,
) -> jax.Array:
    """Indices of the k nearest database points for each query point.

    Args:
      queries: (Nq, 3)
      database: (Nd, 3)
      k: number of neighbors (static).
      query_chunk: query tile size (static); bounds peak memory at
        query_chunk * Nd * 4 bytes.
      approx: use the TPU-native ``lax.approx_min_k`` partial-reduction
        (recall ~0.95 per row, exact on CPU) instead of the full sort-based
        top-k — the op TPUs provide for exactly this workload.  The nearest
        neighbor itself is found with near-certainty; only far-tail
        neighbors can differ, which the KPConv influence radius down-weights
        anyway.

    Returns:
      (Nq, k) int32 indices into ``database``, sorted by ascending distance.
      A query point contained in the database returns itself first (distance
      0), matching the reference's self-neighbor convention
      (preprocess_data.py:82-88 uses the same cloud as query and database).
    """
    nq = queries.shape[0]
    chunk = min(query_chunk, _ceil_to(nq, 8))
    padded = _ceil_to(nq, chunk)
    q = jnp.pad(queries, ((0, padded - nq), (0, 0)))
    q = q.reshape(padded // chunk, chunk, queries.shape[-1])

    def one_chunk(qc):
        sq = pairwise_sq_dist(qc, database, clamp=False)  # (chunk, Nd)
        if approx:
            _, idx = jax.lax.approx_min_k(sq, k, recall_target=0.95)
        else:
            _, idx = jax.lax.top_k(-sq, k)
        return idx.astype(jnp.int32)

    idx = jax.lax.map(one_chunk, q)
    return idx.reshape(padded, k)[:nq]


def knn_with_distances(
    queries: jax.Array, database: jax.Array, k: int, query_chunk: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`knn` but also returns the squared distances (Nq, k)."""
    idx = knn(queries, database, k, query_chunk)
    nbr = jnp.take(database, idx, axis=0)
    sq = jnp.sum((queries[:, None, :] - nbr) ** 2, axis=-1)
    return idx, sq
