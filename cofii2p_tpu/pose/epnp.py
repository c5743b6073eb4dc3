"""Weighted EPnP and Gauss-Newton pose refinement, fully jittable/vmappable.

Replaces the reference's host-side OpenCV call
(cv2.solvePnPRansac(..., iterationsCount=10000), /root/reference/evaluation/
eval_all.py:107) with an on-device solver so pose estimation never leaves
the TPU (the BASELINE north-star's zero-host-sync requirement).

EPnP follows Lepetit, Moreno-Noguer & Fua, "EPnP: An Accurate O(n) Solution
to the PnP Problem" (IJCV 2009): 4 control points from the weighted PCA
frame, barycentric coordinates, the 2n x 12 projection system solved via the
eigenvectors of the 12x12 normal matrix, beta recovery for the N=1 and N=2
kernel cases, and absolute orientation (Umeyama/Horn) to extract R, t.

Correspondence *weights* replace dynamic point counts: every array is a
fixed (N, ...) block and excluded points simply carry weight 0, which is
what makes the solver vmap across RANSAC hypotheses and batch frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.geometry import rodrigues
from cofii2p_tpu.ops.small_linalg import (
    eigh3x3,
    rigid_align_weighted,
    smallest_eigvecs,
    solve3x3,
    solve_psd,
)

_EPS = 1e-9


def _control_points(points: jax.Array, w: jax.Array):
    """Weighted centroid + principal-axis control points (EPnP sec. 3.1)."""
    wn = w / jnp.maximum(jnp.sum(w), _EPS)
    c0 = jnp.sum(wn[:, None] * points, axis=0)
    centered = points - c0
    cov = jnp.einsum("n,ni,nj->ij", wn, centered, centered)
    # closed-form symmetric 3x3 eigendecomposition (ops/small_linalg.py):
    # jnp.linalg.eigh lowers to LAPACK-style loops that serialize under the
    # 4096-wide RANSAC vmap
    eigval, eigvec = eigh3x3(cov)  # ascending
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-8))
    ctrl = c0 + (eigvec * scale[None, :]).T  # (3, 3): rows are c1..c3
    return jnp.concatenate([c0[None], ctrl], axis=0), eigvec, scale, c0  # (4,3)


def _barycentric(points: jax.Array, eigvec, scale, c0):
    """alphas (N, 4) with sum 1: p = a0*c0 + sum_j a_j*c_j."""
    # basis vectors c_j - c0 are scale_j * eigvec[:, j]
    local = (points - c0) @ eigvec  # (N, 3) coords in eigenbasis
    a123 = local / jnp.maximum(scale, 1e-8)[None, :]
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _solve_betas_case1(v: jax.Array, ctrl_w: jax.Array):
    """Scale a single kernel vector so control-point distances match."""
    cc = v.reshape(4, 3)
    iu, ju = jnp.triu_indices(4, k=1)
    dc = jnp.linalg.norm(cc[iu] - cc[ju], axis=-1)
    dw = jnp.linalg.norm(ctrl_w[iu] - ctrl_w[ju], axis=-1)
    beta = jnp.sum(dc * dw) / jnp.maximum(jnp.sum(dc * dc), _EPS)
    return beta * cc


def _solve_betas_case2(v1: jax.Array, v2: jax.Array, ctrl_w: jax.Array):
    """Two-vector kernel case: least-squares on the 6 pairwise distances."""
    a = v1.reshape(4, 3)
    b = v2.reshape(4, 3)
    iu, ju = jnp.triu_indices(4, k=1)
    da = a[iu] - a[ju]
    db = b[iu] - b[ju]
    dw2 = jnp.sum((ctrl_w[iu] - ctrl_w[ju]) ** 2, axis=-1)  # (6,)
    # [b11, b12, b22] . [|da|^2, 2 da.db, |db|^2] = dw2
    L = jnp.stack(
        [jnp.sum(da * da, -1), 2.0 * jnp.sum(da * db, -1), jnp.sum(db * db, -1)],
        axis=-1,
    )  # (6, 3)
    # least squares via the 3x3 normal equations in closed form
    ltl = L.T @ L + 1e-9 * jnp.eye(3)
    sol = solve3x3(ltl, L.T @ dw2)
    b11, b12, b22 = sol[0], sol[1], sol[2]
    beta1 = jnp.sqrt(jnp.maximum(b11, _EPS))
    beta2 = jnp.sqrt(jnp.maximum(b22, _EPS)) * jnp.sign(b12)
    cc = beta1 * a + beta2 * b
    # global rescale like case 1 to absorb residual scale error
    dc = jnp.linalg.norm(cc[iu] - cc[ju], axis=-1)
    dw = jnp.sqrt(dw2)
    s = jnp.sum(dc * dw) / jnp.maximum(jnp.sum(dc * dc), _EPS)
    return s * cc


def _umeyama(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted rigid alignment: finds R, t with dst ~= R @ src + t.

    Horn quaternion method (ops/small_linalg.rigid_align_weighted) instead
    of the SVD form: no LAPACK loops under vmap, and always a proper
    rotation (no reflection sign fix needed)."""
    return rigid_align_weighted(src, dst, w)


def reprojection_errors(R, t, object_points, image_points, K):
    """Pixel reprojection error per correspondence; points behind the camera
    get +inf so they can never count as inliers."""
    cam = object_points @ R.T + t
    z = cam[:, 2]
    uv = (cam @ K.T)
    uv = uv[:, :2] / jnp.maximum(uv[:, 2:3], _EPS)
    err = jnp.linalg.norm(uv - image_points, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)


def _pose_from_cc(cc, alphas, object_points, image_points, K, w):
    """Camera control points -> (R, t, mean weighted reproj error)."""
    cam_pts = alphas @ cc  # (N, 3)
    # depth sign fix: the weighted mean depth must be positive
    sign = jnp.where(jnp.sum(w * cam_pts[:, 2]) < 0, -1.0, 1.0)
    cam_pts = cam_pts * sign
    R, t = _umeyama(object_points, cam_pts, w)
    err = reprojection_errors(R, t, object_points, image_points, K)
    mean_err = jnp.sum(w * jnp.where(jnp.isfinite(err), err, 1e6)) / jnp.maximum(
        jnp.sum(w), _EPS
    )
    return R, t, mean_err


def epnp(object_points, image_points, K, weights):
    """Weighted EPnP.

    Args:
      object_points: (N, 3) world points.
      image_points: (N, 2) pixels.
      K: (3, 3) intrinsics.
      weights: (N,) nonnegative weights (0 excludes a correspondence).

    Returns:
      (R (3,3), t (3,), mean weighted reprojection error).
    """
    w = weights.astype(jnp.float32)
    ctrl_w, eigvec, scale, c0 = _control_points(object_points, w)
    alphas = _barycentric(object_points, eigvec, scale, c0)  # (N, 4)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u, v = image_points[:, 0], image_points[:, 1]

    # M rows (EPnP eq. 7), scaled by sqrt(weight) so MtM is weighted
    sw = jnp.sqrt(w)[:, None]
    r1 = jnp.concatenate(
        [
            alphas * fx,
            jnp.zeros_like(alphas),
            alphas * (cx - u)[:, None],
        ],
        axis=-1,
    )
    r2 = jnp.concatenate(
        [
            jnp.zeros_like(alphas),
            alphas * fy,
            alphas * (cy - v)[:, None],
        ],
        axis=-1,
    )
    # column order above is (x-coeffs for 4 ctrl, y-coeffs, z-coeffs); put it
    # in the interleaved (ctrl-major) order expected by reshape(4, 3):
    perm = jnp.asarray([0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7, 11])
    M = jnp.concatenate([r1 * sw, r2 * sw], axis=0)[:, perm]  # (2N, 12)

    mtm = M.T @ M
    # the two near-null directions via shifted inverse iteration with an
    # unrolled 12x12 Cholesky (ops/small_linalg.py) — jnp.linalg.eigh's
    # iterative decomposition dominates RANSAC cost under vmap on TPU
    vecs = smallest_eigvecs(mtm, num=2)
    v1 = vecs[:, 0]
    v2 = vecs[:, 1]

    cc1 = _solve_betas_case1(v1, ctrl_w)
    cc2 = _solve_betas_case2(v1, v2, ctrl_w)
    R1, t1, e1 = _pose_from_cc(cc1, alphas, object_points, image_points, K, w)
    R2, t2, e2 = _pose_from_cc(cc2, alphas, object_points, image_points, K, w)

    pick1 = e1 <= e2
    R = jnp.where(pick1, R1, R2)
    t = jnp.where(pick1, t1, t2)
    return R, t, jnp.where(pick1, e1, e2)


def refine_pose_gauss_newton(R, t, object_points, image_points, K, weights, iters=10):
    """Weighted Gauss-Newton on the reprojection residuals over (omega, t)
    — the role of OpenCV's iterative refinement after RANSAC."""
    w = weights.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]

    def step(carry, _):
        R, t = carry
        cam = object_points @ R.T + t  # (N, 3)
        x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
        z = jnp.maximum(z, 1e-6)
        u = fx * x / z + K[0, 2]
        v = fy * y / z + K[1, 2]
        r = jnp.stack([u - image_points[:, 0], v - image_points[:, 1]], -1)  # (N,2)

        # d(u,v)/d(cam): (N, 2, 3)
        zero = jnp.zeros_like(z)
        J_cam = jnp.stack(
            [
                jnp.stack([fx / z, zero, -fx * x / z**2], -1),
                jnp.stack([zero, fy / z, -fy * y / z**2], -1),
            ],
            axis=-2,
        )
        # d(cam)/d(omega) = -[cam]_x (left perturbation R <- exp(w) R),
        # d(cam)/d(t) = I
        def skew(p):
            px, py, pz = p[..., 0], p[..., 1], p[..., 2]
            o = jnp.zeros_like(px)
            return jnp.stack(
                [
                    jnp.stack([o, -pz, py], -1),
                    jnp.stack([pz, o, -px], -1),
                    jnp.stack([-py, px, o], -1),
                ],
                -2,
            )

        J_pose = jnp.concatenate([-skew(cam), jnp.broadcast_to(jnp.eye(3), cam.shape[:-1] + (3, 3))], axis=-1)  # (N,3,6)
        J = jnp.einsum("nij,njk->nik", J_cam, J_pose)  # (N, 2, 6)

        wn = w[:, None, None]
        H = jnp.einsum("nik,nil->kl", J * wn, J) + 1e-6 * jnp.eye(6)
        g = jnp.einsum("nik,ni->k", J * wn, r)
        delta = -solve_psd(H, g)
        R_new = rodrigues(delta[:3]) @ R
        t_new = t + delta[3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t
