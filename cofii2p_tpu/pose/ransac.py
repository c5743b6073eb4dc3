"""Vmapped RANSAC over EPnP hypotheses — the TPU-native replacement for
cv2.solvePnPRansac (reference evaluation/eval_all.py:107).

All hypotheses are solved *in parallel* with vmap (the MXU eats the batched
12x12 eigenproblems), so 1024 parallel hypotheses replace OpenCV's 10000
sequential iterations.  Masked correspondences are handled by weights, never
by dynamic shapes, so the whole search jits and can itself be vmapped over a
batch of frames (BASELINE config 4: batched streaming inference with zero
host sync).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofii2p_tpu.pose.epnp import (
    epnp,
    refine_pose_gauss_newton,
    reprojection_errors,
)


class RansacResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    inlier_mask: jax.Array  # (N,) bool
    num_inliers: jax.Array  # () int32
    success: jax.Array  # () bool


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "sample_size", "refine_iters")
)
def ransac_pnp(
    rng: jax.Array,
    object_points: jax.Array,
    image_points: jax.Array,
    K: jax.Array,
    mask: jax.Array,
    inlier_threshold: float = 8.0,
    num_hypotheses: int = 1024,
    sample_size: int = 6,
    refine_iters: int = 2,
) -> RansacResult:
    """Robust PnP over a fixed-size masked correspondence set.

    Args:
      rng: PRNG key.
      object_points: (N, 3).
      image_points: (N, 2).
      K: (3, 3).
      mask: (N,) validity (bool or float); invalid rows never participate.
      inlier_threshold: reprojection px threshold (OpenCV default 8.0).
      num_hypotheses: parallel minimal-sample hypotheses.
      sample_size: points per hypothesis.  6 rather than OpenCV's 4: EPnP's
        kernel is better conditioned at >=6 points, and on TPU the extra rows
        are free; accuracy is what's compared, not the sampler.
      refine_iters: re-weighted EPnP passes on the consensus set.

    Returns:
      RansacResult; success mirrors the reference's >=4-point requirement
      (network.py:148-149).
    """
    n = object_points.shape[0]
    m = mask.astype(jnp.float32)

    # masked sampling without replacement per hypothesis: Gumbel top-k over
    # log(mask) keeps invalid rows out as long as >= sample_size are valid
    g = jax.random.gumbel(rng, (num_hypotheses, n))
    scores = jnp.where(m > 0, g, -jnp.inf)
    _, samples = jax.lax.top_k(scores, sample_size)  # (H, k)

    def solve(idx):
        pts = object_points[idx]
        uv = image_points[idx]
        R, t, _ = epnp(pts, uv, K, jnp.ones((sample_size,)))
        err = reprojection_errors(R, t, object_points, image_points, K)
        inl = (err < inlier_threshold) & (m > 0)
        return R, t, jnp.sum(inl)

    Rs, ts, counts = jax.vmap(solve)(samples)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]

    def refine(carry, _):
        R, t = carry
        err = reprojection_errors(R, t, object_points, image_points, K)
        inl = ((err < inlier_threshold) & (m > 0)).astype(jnp.float32)
        # guard: if the consensus collapses, fall back to all valid points
        w = jnp.where(jnp.sum(inl) >= 4, inl, m)
        R2, t2, _ = epnp(object_points, image_points, K, w)
        R2, t2 = refine_pose_gauss_newton(
            R2, t2, object_points, image_points, K, w, iters=5
        )
        return (R2, t2), None

    (R, t), _ = jax.lax.scan(refine, (R, t), None, length=refine_iters)

    err = reprojection_errors(R, t, object_points, image_points, K)
    inlier_mask = (err < inlier_threshold) & (m > 0)
    num = jnp.sum(inlier_mask).astype(jnp.int32)
    return RansacResult(R, t, inlier_mask, num, num >= 4)
