"""On-device sample preparation: perturbation, pyramid, correspondence GT.

The reference computes all of this on CPU inside DataLoader workers
(/root/reference/data/kitti.py:286-373): apply the random SE(3), build the
5-level pyramid with 13 kNN searches, project superpoints to pick in-view /
out-of-view keypoints, and derive the fine-level supervision.  Every one of
those steps is a pure function of (cloud, P, K, rng) with static shapes, so
here it is a single jitted, vmapped function that runs on the TPU as part of
the training/eval step — the host only does file IO and image decoding.

Dynamic-count selections (random 64 of the in-view superpoints, kitti.py:
341-348) become masked Gumbel-top-k draws: invalid slots carry a validity
flag instead of changing shape.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from cofii2p_tpu.config import Config
from cofii2p_tpu.ops.geometry import apply_se3, point2node, project_points
from cofii2p_tpu.ops.pyramid import build_pyramid


def masked_choice(rng: jax.Array, mask: jax.Array, k: int):
    """Draw k distinct indices uniformly from {i : mask[i]} (Gumbel top-k).

    Returns (indices (k,), valid (k,) bool); when fewer than k entries are
    valid the tail indices are drawn from invalid entries and flagged False
    (the nuScenes loader's valid_kpt capability, nuscenes.py:263-272).
    """
    g = jax.random.gumbel(rng, mask.shape)
    scores = jnp.where(mask, g, g - 1e9)
    _, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32), mask[idx]


def _prepare_one(
    pc: jax.Array,
    attrs: jax.Array,
    has_normals: bool,
    P: jax.Array,
    K: jax.Array,
    rng: jax.Array,
    cfg: Config,
) -> Dict[str, jax.Array]:
    """Single-sample pipeline. pc (N,3) in camera frame, attrs (N,A) raw
    attributes — [intensity, normals] for KITTI (normals rotated by P here,
    kitti.py:288,293) or [intensity] for nuScenes (features become
    intensity+perturbed xyz, nuscenes.py:207-213) — P (4,4) the random
    perturbation, K (3,3) the cropped half-res intrinsics."""
    r_pyr, r_kpt, r_out, r_imgout = jax.random.split(rng, 4)

    pc_w = apply_se3(P[None], pc[None])[0]  # perturbed cloud (reference kitti.py:287)
    if has_normals:
        n_w = jnp.einsum("ij,nj->ni", P[:3, :3], attrs[:, 1:4])
        feats = jnp.concatenate([attrs[:, :1], n_w], axis=-1)
    else:
        feats = jnp.concatenate([attrs[:, :1], pc_w], axis=-1)

    pyr = build_pyramid(
        pc_w,
        r_pyr,
        cfg.pyramid_sizes,
        cfg.neighbor_num,
        need_maps=cfg.kpconv_impl not in ("banded", "banded_knn"),
        ordering=cfg.pyramid_ordering,
    )
    feats = jnp.take(feats, pyr["perm0"], axis=0)  # realign to Morton order
    superpoints = pyr["points"][-1]  # (S, 3)

    # ground-truth projection back to the camera: x_cam = P^-1 x_w
    # (reference kitti.py:334: K_4 (R^-1 x - R^-1 t))
    Pinv_R = P[:3, :3].T
    cam_sp = jnp.einsum("ij,nj->ni", Pinv_R, superpoints) - (Pinv_R @ P[:3, 3])
    K4 = K * 0.125
    K4 = K4.at[2, 2].set(1.0)
    K2 = K * 0.5
    K2 = K2.at[2, 2].set(1.0)

    h8, w8 = cfg.pe_H, cfg.pe_W
    uv8 = project_points(K4[None], cam_sp[None])[0]  # (S, 2)
    xy8 = jnp.floor(uv8 + 0.5)
    z = cam_sp[:, 2]
    in_view = (
        (xy8[:, 0] >= 1)
        & (xy8[:, 0] <= w8 - 3)
        & (xy8[:, 1] >= 1)
        & (xy8[:, 1] <= h8 - 3)
        & (z > 0)
    )  # (S,) reference in-picture bounds (kitti.py:338)
    # out-of-view projections can overflow float32 (z ~ 0); clamp to the grid
    # so every derived integer index is in-range — validity is carried by
    # in_view / kpt_valid masks, never by index values
    xy8 = jnp.clip(
        xy8, 0.0, jnp.asarray([w8 - 1, h8 - 1], jnp.float32)
    )

    pc_kpt_idx, kpt_valid = masked_choice(r_kpt, in_view, cfg.num_kpt)
    pc_outline_idx, _ = masked_choice(r_out, ~in_view, cfg.num_kpt)

    # coarse /8 occupancy mask (reference's coo_matrix scatter, kitti.py:351)
    flat8 = (xy8[:, 1] * w8 + xy8[:, 0]).astype(jnp.int32)
    flat8 = jnp.where(in_view, flat8, h8 * w8)  # out-of-view -> trash slot
    img_mask = (
        jnp.zeros((h8 * w8 + 1,), jnp.float32).at[flat8].add(1.0)[: h8 * w8] > 0
    ).astype(jnp.float32)
    coarse_img_mask = img_mask.reshape(h8, w8)

    coarse_xy = xy8[pc_kpt_idx]  # (K, 2) (x, y)
    coarse_img_kpt_idx = (coarse_xy[:, 1] * w8 + coarse_xy[:, 0]).astype(jnp.int32)
    img_outline_index, _ = masked_choice(r_imgout, img_mask < 0.5, cfg.num_kpt)

    # fine /2 supervision for the selected keypoints (kitti.py:360-371)
    cam_kpt = cam_sp[pc_kpt_idx]
    uv2 = project_points(K2[None], cam_kpt[None])[0]
    fine_xy = jnp.clip(
        jnp.floor(uv2),
        0.0,
        jnp.asarray([cfg.img_W // 2 - 1, cfg.img_H // 2 - 1], jnp.float32),
    )  # (K, 2)
    fine_center = coarse_xy * 4.0  # (K, 2) on the /2 grid
    rel = fine_xy - fine_center + 2.0
    relative_index = (rel[:, 1] * 4 + rel[:, 0]).astype(jnp.int32)
    # structurally in [0, 16); clamp defensively for masked-out slots
    relative_index = jnp.clip(relative_index, 0, 15)

    fine_pc_inline_index = point2node(pyr["points"][1], superpoints[pc_kpt_idx])

    out = {
        "points": pyr["points"],
        "feats": feats,
        "P": jnp.linalg.inv(P),  # GT pose, like the reference contract (kitti.py:379)
        "K": K2,
        "K_4": K4,
        "pc_kpt_idx": pc_kpt_idx,
        "kpt_valid": kpt_valid,
        "pc_outline_idx": pc_outline_idx,
        "coarse_img_mask": coarse_img_mask,
        "coarse_img_kpt_idx": coarse_img_kpt_idx,
        "coarse_img_outline_index": img_outline_index,
        "fine_xy_coors": fine_xy.astype(jnp.int32),
        "fine_center_kpt_coors": fine_center.astype(jnp.int32),
        "relative_index": relative_index,
        "fine_pc_inline_index": fine_pc_inline_index,
    }
    for key in ("neighbors", "subsampling", "upsampling"):
        if key in pyr:
            out[key] = pyr[key]
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "has_normals"))
def prepare_samples(
    pc: jax.Array,
    attrs: jax.Array,
    P: jax.Array,
    K: jax.Array,
    rng: jax.Array,
    img: jax.Array,
    cfg: Config,
    has_normals: bool = True,
) -> Dict[str, jax.Array]:
    """Batched on-device sample prep.

    Args:
      pc: (B, N, 3) camera-frame clouds (voxel-downsampled, fixed N).
      attrs: (B, N, A): intensity (+normals when has_normals, rotated here;
        nuScenes instead ships intensity+xyz, reference nuscenes.py:213).
      P: (B, 4, 4) random SE(3) perturbations (host-generated, seeded).
      K: (B, 3, 3) cropped half-res intrinsics.
      rng: key; split per sample.
      img: (B, H, W, 3) float images (passed through).
      cfg: static config.

    Returns the model+loss batch dict (everything static-shape).
    """
    b = pc.shape[0]
    keys = jax.random.split(rng, b)
    fn = lambda p, a, pp, kk, r: _prepare_one(p, a, has_normals, pp, kk, r, cfg)
    out = jax.vmap(fn)(pc, attrs, P, K, keys)
    out["img"] = img
    return out
