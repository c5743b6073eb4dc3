"""Dense-tensor geometry primitives (pure JAX, static shapes).

Functional re-design of the reference geometry library:
- pairwise distances via the matmul identity (MXU-friendly), reference
  model/kpconv/ops/pairwise_distance.py:4-31 and network.py:228-247;
- point->node assignment (network.py:250-264);
- SE(3) apply/invert + Rodrigues (model/kpconv/ops/transformation.py:7-253);
- broadcasted gather (model/kpconv/ops/index_select.py:4-31).

All functions are batch-agnostic: they operate on the trailing dims and
broadcast over leading dims, so they vmap/jit/shard cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_DIST = 1e-12


def pairwise_sq_dist(a: jax.Array, b: jax.Array, clamp: bool = True) -> jax.Array:
    """Squared Euclidean distances between two point sets.

    Uses ||a-b||^2 = ||a||^2 + ||b||^2 - 2<a,b> so the dominant cost is a
    single (N,D)x(D,M) matmul on the MXU.

    The inner product runs at Precision.HIGHEST: TPU default matmul precision
    is bf16-grade, which breaks nearest-neighbor exactness (a self-query must
    rank itself first for the pyramid neighbor maps to match the reference
    contract, preprocess_data.py:82-88).  D=3 makes the extra passes free.

    Args:
      a: (..., N, D)
      b: (..., M, D)
      clamp: clamp to a tiny positive floor (matches the reference
        square_distance clamp at network.py:246 so sqrt never sees <0).

    Returns:
      (..., N, M) squared distances.
    """
    inner = jnp.einsum(
        "...nd,...md->...nm",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sq = (
        jnp.sum(a * a, axis=-1)[..., :, None]
        + jnp.sum(b * b, axis=-1)[..., None, :]
        - 2.0 * inner
    )
    if clamp:
        sq = jnp.maximum(sq, _EPS_DIST)
    return sq


def point2node(nodes: jax.Array, points: jax.Array) -> jax.Array:
    """Assign each point to its nearest node.

    Args:
      nodes: (..., M, 3)
      points: (..., N, 3)

    Returns:
      (..., N) int32 index of the nearest node per point.
      (reference: network.py:250-264, used at data time kitti.py:373 and at
      test-mode inference network.py:153)
    """
    sq = pairwise_sq_dist(points, nodes)
    return jnp.argmin(sq, axis=-1).astype(jnp.int32)


def index_select(values: jax.Array, indices: jax.Array, axis: int = 0) -> jax.Array:
    """Gather rows of ``values`` by an arbitrarily-shaped index tensor.

    Equivalent capability to the reference broadcasted gather
    (ops/index_select.py:4-31): output shape is
    values.shape[:axis] + indices.shape + values.shape[axis+1:].
    """
    return jnp.take(values, indices, axis=axis)


def gather_neighbors(values: jax.Array, indices: jax.Array) -> jax.Array:
    """Batched neighbor gather: values (..., N, C), indices (..., M, H) -> (..., M, H, C).

    Indices equal to N address an implicit shadow row of zeros (the reference
    appends an explicit shadow row, kpconv.py:91/103; we gather with
    mode='fill' which is XLA-native and allocation-free).
    """
    n = values.shape[-2]
    flat_idx = indices.reshape(*indices.shape[:-2], -1)  # (..., M*H)
    out = jnp.take_along_axis(
        values,
        jnp.clip(flat_idx, 0, n - 1)[..., None].astype(jnp.int32),
        axis=-2,
    )
    out = jnp.where((flat_idx >= n)[..., None], 0.0, out)
    return out.reshape(*indices.shape, values.shape[-1])


# ----------------------------------------------------------------------------
# SE(3)
# ----------------------------------------------------------------------------


def se3_from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build (...,4,4) from (...,3,3) rotation and (...,3) translation."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def apply_se3(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (...,4,4) SE(3) to (...,N,3) points.

    (reference: ops/transformation.py apply_transform)
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def inverse_se3(T: jax.Array) -> jax.Array:
    """Invert (...,4,4) SE(3) transforms analytically (R^T, -R^T t)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle vector (...,3) -> rotation matrix (...,3,3).

    (capability of ops/transformation.py:187-253 / cv2.Rodrigues)
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    k = rvec / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)
    # theta ~ 0 -> identity
    return jnp.where(th > 1e-12, R, eye)


def rotation_to_rodrigues(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> axis-angle vector (...,3)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    axis_unnorm = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(sin_t > 1e-7, theta / (2.0 * jnp.maximum(sin_t, 1e-12)), 0.5)
    return axis_unnorm * scale[..., None]


def euler_to_rotation(angles: jax.Array) -> jax.Array:
    """Euler angles (rx, ry, rz) -> R = Rz @ Ry @ Rx.

    Matches the augmentation convention of the reference
    (data/kitti.py:204-215 angles2rotation_matrix).
    """
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    Rz = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    return Rz @ Ry @ Rx


def project_points(K: jax.Array, points_cam: jax.Array) -> jax.Array:
    """Pinhole projection: (...,3,3) intrinsics x (...,N,3) camera-frame points
    -> (...,N,2) pixel coordinates (x, y).

    (reference projection math: train.py:247-249, kitti.py:334-336)
    """
    uvw = jnp.einsum("...ij,...nj->...ni", K, points_cam)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)
