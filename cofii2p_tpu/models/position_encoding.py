"""Sine positional encoding over continuous 2-D/3-D coordinates.

Capability match for the reference PositionEmbeddingCoordsSine
(/root/reference/model/transformer/position_encoding.py:7-50): d_model is
split evenly over the input dims (rounded to even), each coordinate is
scaled by 2*pi and expanded with the interleaved sin/cos frequency ladder,
and any remainder channels are zero-padded.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def position_embedding_sine(
    coords: jax.Array, d_model: int, temperature: float = 10000.0
) -> jax.Array:
    """coords (..., n_dim) -> (..., d_model)."""
    n_dim = coords.shape[-1]
    num_feats = d_model // n_dim // 2 * 2
    padding = d_model - num_feats * n_dim

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    x = coords.astype(jnp.float32) * (2.0 * math.pi)
    divided = x[..., None] / dim_t  # (..., n_dim, num_feats)
    sin = jnp.sin(divided[..., 0::2])
    cos = jnp.cos(divided[..., 1::2])
    emb = jnp.stack([sin, cos], axis=-1).reshape(*coords.shape[:-1], -1)
    if padding:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, padding)])
    return emb


def image_grid_coords(h: int, w: int) -> jax.Array:
    """(h*w, 2) integer (row, col) grid in row-major order — the token order
    the reference uses for the /8 image map (network.py:104-105: meshgrid of
    arange(pe_H), arange(pe_W), concatenated as (x=row, y=col))."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([ys, xs], axis=-1).reshape(h * w, 2)
