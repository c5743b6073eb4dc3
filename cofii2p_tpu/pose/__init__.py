"""On-device pose estimation: batched EPnP + RANSAC with zero host sync."""

from cofii2p_tpu.pose.epnp import epnp, refine_pose_gauss_newton, reprojection_errors
from cofii2p_tpu.pose.ransac import ransac_pnp

__all__ = ["epnp", "refine_pose_gauss_newton", "reprojection_errors", "ransac_pnp"]
