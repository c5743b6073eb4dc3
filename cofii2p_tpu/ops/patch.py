"""Vectorized fine-patch extraction.

The reference extracts 4x4 feature patches around projected keypoints with a
Python loop of tensor slices (model/network.py:206-226) — a host-bound,
shape-dynamic pattern.  Here it is a single batched gather with static
shapes, so it jits, vmaps, and differentiates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches(
    feature_map: jax.Array, centers_xy: jax.Array, size: int = 4
) -> jax.Array:
    """Extract size x size patches around pixel centers.

    Matches the reference window convention (network.py:213-221): the patch
    rows are floor(center - size/2) ... floor(center + size/2) - 1 in both
    axes, with ``centers_xy`` ordered (x, y) = (col, row).

    Args:
      feature_map: (H, W, C).
      centers_xy: (N, 2) integer or float pixel coordinates (x, y).
      size: static patch edge.

    Returns:
      (N, size, size, C) patches. Out-of-bounds rows/cols are clamped to the
      border (the reference instead asserts in-bounds, network.py:222; the
      active data path guarantees in-bounds via its border masks).
    """
    h, w, _ = feature_map.shape
    top_left = jnp.floor(centers_xy.astype(jnp.float32) - size / 2).astype(jnp.int32)
    offs = jnp.arange(size, dtype=jnp.int32)
    cols = jnp.clip(top_left[:, 0][:, None] + offs[None, :], 0, w - 1)  # (N, size)
    rows = jnp.clip(top_left[:, 1][:, None] + offs[None, :], 0, h - 1)  # (N, size)
    # (N, size_rows, size_cols, C)
    return feature_map[rows[:, :, None], cols[:, None, :]]
