"""Result-aggregation tools (calc_result / ir_rmse) on fabricated dumps."""

import numpy as np

from cofii2p_tpu.evaluation.calc_result import report
from cofii2p_tpu.evaluation.ir_rmse import frame_residuals


def test_report_success_rates():
    r = np.array([1.0, 5.0, 20.0, 60.0])
    t = np.array([0.1, 2.0, 8.0, 30.0])
    assert report(r, t, 1e5, 1e5) == 100.0
    assert report(r, t, 45.0, 10.0) == 75.0
    assert report(r, t, 10.0, 5.0) == 50.0


def test_report_empty_success_bucket():
    r = np.array([90.0])
    t = np.array([90.0])
    assert report(r, t, 10.0, 5.0) == 0.0


def test_frame_residuals_zero_for_exact_projection():
    # object points projected with the GT pose must reproduce fine_xy
    rng = np.random.default_rng(0)
    K = np.array([[100.0, 0, 64], [0, 100.0, 32], [0, 0, 1]], np.float32)
    # GT_P maps cam->cloud (the eval dump convention: P = inv(GT_P) projects)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, -0.2, 0.3], np.float32)
    GT_P = np.eye(4, dtype=np.float32)
    GT_P[:3, :3] = R
    GT_P[:3, 3] = t

    obj = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    obj[:, 2] += 5.0  # in front of the camera
    P = np.linalg.inv(GT_P)
    Rinv = np.linalg.inv(P[:3, :3])
    cam = (Rinv @ obj.T) - (Rinv @ P[:3, 3:])
    uvw = K @ cam
    fine_xy = uvw[:2] / uvw[2:]

    res = frame_residuals(
        {"GT_P": GT_P, "K": K, "object_points": obj, "fine_xy": fine_xy}
    )
    assert res.shape == (32,)
    np.testing.assert_allclose(res, 0.0, atol=1e-4)


def test_frame_residuals_respects_corr_mask():
    K = np.eye(3, dtype=np.float32) * 100.0
    K[2, 2] = 1.0
    GT_P = np.eye(4, dtype=np.float32)
    obj = np.tile(np.array([[0.0, 0.0, 5.0]], np.float32), (4, 1))
    fine_xy = np.zeros((2, 4), np.float32)
    mask = np.array([1, 1, 0, 0], np.float32)
    res = frame_residuals(
        {"GT_P": GT_P, "K": K, "object_points": obj, "fine_xy": fine_xy,
         "corr_mask": mask}
    )
    assert res.shape == (2,)


def test_reference_ckpt_auto_config():
    """.t7/.pth evaluation auto-selects the reference-exact configuration
    (kNN kernels, per-layer dispositions, SWAPPED fine decode — the one the
    published RRE/RTE were measured with); explicit overrides win."""
    from cofii2p_tpu.config import get_config
    from cofii2p_tpu.evaluation.eval_all import reference_ckpt_config

    cfg = reference_ckpt_config(get_config("kitti"), [])
    assert cfg.kpconv_impl == "banded_knn"
    assert cfg.kpconv_shared_influence is False
    assert cfg.fine_decode == "reference"

    from cofii2p_tpu.config import apply_overrides

    overrides = ["fine_decode=label", "kpconv_impl=gather"]
    cfg = reference_ckpt_config(
        apply_overrides(get_config("kitti"), overrides), overrides
    )
    assert cfg.kpconv_impl == "gather"  # explicit override wins
    assert cfg.fine_decode == "label"
    assert cfg.kpconv_shared_influence is False
