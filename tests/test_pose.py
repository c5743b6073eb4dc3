"""EPnP / RANSAC verified against synthetic ground truth and OpenCV."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cofii2p_tpu.pose import epnp, ransac_pnp, refine_pose_gauss_newton
from cofii2p_tpu.pose.epnp import reprojection_errors

K = np.array([[718.0, 0.0, 256.0], [0.0, 718.0, 80.0], [0.0, 0.0, 1.0]], np.float32)


def make_scene(rng, n, noise_px=0.0, outlier_frac=0.0, depth=(4.0, 40.0)):
    R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    t = rng.uniform(-5, 5, 3).astype(np.float32)
    t[2] = abs(t[2]) + 10.0
    # points in front of the camera: sample in camera frame, move to world
    cam = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-3, 3, n),
            rng.uniform(*depth, n),
        ],
        -1,
    ).astype(np.float32)
    world = (cam - t) @ R  # inverse transform
    uv = cam @ K.T
    uv = uv[:, :2] / uv[:, 2:]
    uv += rng.randn(n, 2).astype(np.float32) * noise_px
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] = rng.uniform(0, 512, (n_out, 2))
    return world.astype(np.float32), uv.astype(np.float32), R, t


def pose_errors(R_est, t_est, R_gt, t_gt):
    dR = Rotation.from_matrix(np.asarray(R_est) @ R_gt.T)
    return np.linalg.norm(np.asarray(t_est) - t_gt), np.degrees(
        np.linalg.norm(dR.as_rotvec())
    )


def test_epnp_exact_recovery():
    rng = np.random.RandomState(0)
    world, uv, R, t = make_scene(rng, 32)
    R_est, t_est, err = epnp(
        jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K), jnp.ones(32)
    )
    t_err, r_err = pose_errors(R_est, t_est, R, t)
    assert float(err) < 0.5
    assert r_err < 0.5 and t_err < 0.2


def test_epnp_weights_exclude_outliers():
    rng = np.random.RandomState(1)
    world, uv, R, t = make_scene(rng, 40, outlier_frac=0.25)
    w = np.ones(40, np.float32)
    w[:10] = 0.0  # the outliers
    R_est, t_est, _ = epnp(jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K), jnp.asarray(w))
    t_err, r_err = pose_errors(R_est, t_est, R, t)
    assert r_err < 0.5 and t_err < 0.2


def test_epnp_minimal_six_points():
    rng = np.random.RandomState(2)
    world, uv, R, t = make_scene(rng, 6)
    R_est, t_est, _ = epnp(jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K), jnp.ones(6))
    R_est, t_est = refine_pose_gauss_newton(
        R_est, t_est, jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K), jnp.ones(6)
    )
    t_err, r_err = pose_errors(R_est, t_est, R, t)
    assert r_err < 1.0 and t_err < 0.5


def test_gauss_newton_improves_noisy_start():
    rng = np.random.RandomState(3)
    world, uv, R, t = make_scene(rng, 64, noise_px=0.5)
    # perturbed start
    R0 = Rotation.from_rotvec([0.05, -0.03, 0.02]).as_matrix().astype(np.float32) @ R
    t0 = t + np.array([0.3, -0.2, 0.4], np.float32)
    e0 = np.asarray(
        reprojection_errors(jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K))
    ).mean()
    R1, t1 = refine_pose_gauss_newton(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K), jnp.ones(64)
    )
    e1 = np.asarray(
        reprojection_errors(R1, t1, jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K))
    ).mean()
    assert e1 < e0 * 0.1


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.6])
def test_ransac_robust_to_outliers(outlier_frac):
    rng = np.random.RandomState(4)
    world, uv, R, t = make_scene(rng, 128, noise_px=0.3, outlier_frac=outlier_frac)
    res = ransac_pnp(
        jax.random.PRNGKey(0),
        jnp.asarray(world),
        jnp.asarray(uv),
        jnp.asarray(K),
        jnp.ones(128),
        inlier_threshold=3.0,
        num_hypotheses=256,
    )
    assert bool(res.success)
    t_err, r_err = pose_errors(res.R, res.t, R, t)
    assert r_err < 0.5 and t_err < 0.3
    assert int(res.num_inliers) >= 128 * (1 - outlier_frac) * 0.9


def test_ransac_respects_mask():
    rng = np.random.RandomState(5)
    world, uv, R, t = make_scene(rng, 64, outlier_frac=0.5)
    mask = np.ones(64, np.float32)
    mask[:32] = 0.0  # mask out exactly the outliers
    res = ransac_pnp(
        jax.random.PRNGKey(1),
        jnp.asarray(world),
        jnp.asarray(uv),
        jnp.asarray(K),
        jnp.asarray(mask),
        inlier_threshold=3.0,
        num_hypotheses=128,
    )
    t_err, r_err = pose_errors(res.R, res.t, R, t)
    assert r_err < 0.5 and t_err < 0.3
    assert not bool(np.asarray(res.inlier_mask)[:32].any())


def test_matches_opencv_accuracy():
    """Accuracy parity with cv2.solvePnPRansac on the same noisy scene."""
    rng = np.random.RandomState(6)
    world, uv, R, t = make_scene(rng, 256, noise_px=1.0, outlier_frac=0.2)
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        objectPoints=world.astype(np.float64),
        imagePoints=uv.astype(np.float64),
        cameraMatrix=K.astype(np.float64),
        distCoeffs=None,
        iterationsCount=10000,
    )
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    t_cv_err, r_cv_err = pose_errors(R_cv, tvec[:, 0], R, t)

    res = ransac_pnp(
        jax.random.PRNGKey(2),
        jnp.asarray(world),
        jnp.asarray(uv),
        jnp.asarray(K),
        jnp.ones(256),
        num_hypotheses=512,
    )
    t_err, r_err = pose_errors(res.R, res.t, R, t)
    # within 2x of OpenCV (both tiny); absolute bounds too
    assert r_err < max(2 * r_cv_err, 0.2)
    assert t_err < max(2 * t_cv_err, 0.2)
