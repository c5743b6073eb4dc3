"""The fused inference pipeline: sample prep -> network (test mode) ->
fine matching -> on-device EPnP-RANSAC, one jitted program.

This is what the reference runs as model forward + host-side fine argmax +
cv2.solvePnPRansac (/root/reference/evaluation/eval_all.py:94-110), with
every stage on device and batched over frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofii2p_tpu.config import Config
from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.models.network import fine_match_xy
from cofii2p_tpu.pose.ransac import ransac_pnp


class EvalOutput(NamedTuple):
    R: jax.Array  # (B, 3, 3) predicted rotation
    t: jax.Array  # (B, 3) predicted translation
    success: jax.Array  # (B,) bool
    num_inliers: jax.Array  # (B,)
    P_gt: jax.Array  # (B, 4, 4)
    fine_xy: jax.Array  # (B, S, 2) predicted pixels (/2 scale)
    corr_mask: jax.Array  # (B, S) correspondence validity
    object_points: jax.Array  # (B, S, 3)
    pc_score: jax.Array  # (B, S)


def make_eval_body(cfg: Config, model: CoFiI2P, has_normals: bool = True):
    """Unjitted pipeline body — compose into larger programs (bench.py scans
    it over a stream of batches so one dispatch covers many frames)."""

    def run(params, batch_stats, host_batch, rng):
        prep_rng, ransac_rng = jax.random.split(rng)
        batch = prepare_samples(
            host_batch["pc"],
            host_batch["attrs"],
            host_batch["P"],
            host_batch["K"],
            prep_rng,
            host_batch["img"],
            cfg,
            has_normals=has_normals,
        )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            mode="test",
            train=False,
        )
        fine_xy = fine_match_xy(
            out["fine_img_patch"], out["fine_pc_feature"], out["fine_center_xy"],
            decode=cfg.fine_decode,
        )  # (B, S, 2) on the /2 image
        mask = out["inlier_mask"].astype(jnp.float32)

        b = fine_xy.shape[0]
        res = jax.vmap(
            functools.partial(
                ransac_pnp,
                inlier_threshold=cfg.ransac_inlier_px,
                num_hypotheses=cfg.ransac_hypotheses,
                refine_iters=cfg.ransac_refine_iters,
            )
        )(
            jax.random.split(ransac_rng, b),
            out["coarse_pc_points"],
            fine_xy,
            batch["K"],
            mask,
        )
        return EvalOutput(
            R=res.R,
            t=res.t,
            success=res.success,
            num_inliers=res.num_inliers,
            P_gt=batch["P"],
            fine_xy=fine_xy,
            corr_mask=out["inlier_mask"],
            object_points=out["coarse_pc_points"],
            pc_score=out["coarse_pc_score"],
        )

    return run


def make_eval_pipeline(cfg: Config, model: CoFiI2P, has_normals: bool = True):
    return jax.jit(make_eval_body(cfg, model, has_normals))


def pose_errors_np(T_pred, P_gt):
    """Reference error metric (eval_all.py:16-22): P_diff = inv(T_pred) @ P_gt,
    RTE = |t_diff|, RRE = sum |euler('xzy')| in degrees."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    P_diff = np.linalg.inv(T_pred) @ P_gt
    t_diff = np.linalg.norm(P_diff[:3, 3])
    r_diff = Rotation.from_matrix(P_diff[:3, :3])
    angles = np.sum(np.abs(r_diff.as_euler("xzy", degrees=True)))
    return t_diff, angles
