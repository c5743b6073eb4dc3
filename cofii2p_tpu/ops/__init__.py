"""TPU-native geometry op library.

Covers the capability surface of the reference op collection
(/root/reference/model/kpconv/ops/*.py, model/network.py:228-264 and the
vestigial geotransformer.ext wrappers) as pure-JAX, static-shape functions.
"""

from cofii2p_tpu.ops.geometry import (
    apply_se3,
    euler_to_rotation,
    index_select,
    inverse_se3,
    pairwise_sq_dist,
    point2node,
    rodrigues,
    rotation_to_rodrigues,
    se3_from_rt,
)
from cofii2p_tpu.ops.knn import knn
from cofii2p_tpu.ops.pyramid import build_pyramid
from cofii2p_tpu.ops.subsample import grid_subsample, radius_search
from cofii2p_tpu.ops.patch import extract_patches

__all__ = [
    "apply_se3",
    "euler_to_rotation",
    "index_select",
    "inverse_se3",
    "pairwise_sq_dist",
    "point2node",
    "rodrigues",
    "rotation_to_rodrigues",
    "se3_from_rt",
    "knn",
    "build_pyramid",
    "grid_subsample",
    "radius_search",
    "extract_patches",
]
