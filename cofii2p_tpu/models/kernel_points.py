"""Deterministic kernel-point disposition generator.

Implements the standard KPConv disposition scheme (Thomas et al., "KPConv:
Flexible and Deformable Convolution for Point Clouds", arXiv:1904.08889):
K points in a unit ball arranged by simulating pairwise electrostatic
repulsion plus a central attraction, with point 0 pinned to the center,
then rescaled so the mean non-center radius is ``ratio``.

Intentional difference from the reference (kernel_points.py:426-453): the
reference applies a *fresh random rotation and N(0, 0.01) jitter on every
load*, which makes training/eval non-reproducible (flagged in SURVEY.md §7
as a hazard).  This generator is fully deterministic: fixed seed, in-process
cache, optional on-disk .npy cache.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_SEED = 1337


def _simulate(num_points: int, dimension: int, seed: int, iters: int = 10000):
    rng = np.random.RandomState(seed)
    # rejection-sample initial points inside the ball of radius sqrt(0.5)
    pts = np.empty((0, dimension))
    while pts.shape[0] < num_points:
        cand = rng.uniform(-1.0, 1.0, size=(4 * num_points, dimension))
        cand = cand[np.sum(cand**2, axis=1) < 0.5]
        pts = np.concatenate([pts, cand], axis=0)
    pts = pts[:num_points]
    pts[0] = 0.0  # pinned center

    step = 1e-2
    decay = 0.9995
    clip = 0.05
    prev_norms = np.zeros(num_points)
    for _ in range(iters):
        diff = pts[:, None, :] - pts[None, :, :]
        sq = np.sum(diff**2, axis=-1)
        # repulsion ~ 1/d^2 directed along diff, plus central spring
        grad = np.sum(diff / (sq[..., None] ** 1.5 + 1e-6), axis=1) + 10.0 * pts
        norms = np.linalg.norm(grad, axis=-1)
        if np.max(np.abs(norms[1:] - prev_norms[1:])) < 1e-5:
            break
        prev_norms = norms
        move = np.minimum(step * norms, clip)
        move[0] = 0.0
        pts = pts - move[:, None] * grad / (norms[:, None] + 1e-6)
        step *= decay
    return pts


@functools.lru_cache(maxsize=None)
def kernel_dispositions(
    num_points: int = 15,
    dimension: int = 3,
    ratio: float = 0.66,
) -> np.ndarray:
    """Unit-scale disposition (num_points, dimension), point 0 at the origin."""
    cache_dir = os.path.join(os.path.dirname(__file__), "dispositions")
    cache = os.path.join(cache_dir, f"k_{num_points:03d}_{dimension}d.npy")
    if os.path.exists(cache):
        return np.load(cache)
    pts = _simulate(num_points, dimension, _SEED)
    radii = np.linalg.norm(pts, axis=-1)
    pts = pts * (ratio / np.mean(radii[1:]))
    pts = pts.astype(np.float32)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache, pts)
    except OSError:
        pass
    return pts


def load_kernel_points(radius: float, num_points: int = 15, dimension: int = 3) -> np.ndarray:
    """Disposition scaled to the conv radius (reference load_kernels scaling,
    kernel_points.py:451, minus the random rotation/jitter)."""
    return kernel_dispositions(num_points, dimension) * radius
