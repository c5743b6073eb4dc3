"""CoFiI2P: coarse-to-fine image-to-point-cloud registration network.

Capability match for the reference assembly
(/root/reference/model/network.py:14-264), batch-first and fully jittable:

- two-stream encoders (ResNet-34 image branch, KPConv-FPN point branch);
- coarse projection heads + sine positional encodings + the 8-layer I2P
  transformer; per-modality overlap score heads;
- image upsampling to the /2 fine feature map;
- train/val mode: supervised 4x4 fine patches around projected keypoints;
- test mode: the reference's *data-dependent threshold-decay loop*
  (network.py:145-161, a host-side while over tensor contents) is re-derived
  as a closed-form masked selection: per-superpoint best image token and
  border mask are threshold-independent, so the count of inliers is a
  monotone function of the threshold and the loop equals "pick the largest
  threshold on the 0.9, 0.88, ... grid whose inlier count >= 4".  This runs
  as pure vector math with static shapes — no host sync, batchable.

Outputs are a dict (fixed shapes everywhere; test mode adds an inlier mask
instead of dynamically sized index lists).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cofii2p_tpu.config import Config
from cofii2p_tpu.models.kpconv import KPConvFPN
from cofii2p_tpu.models.layers import Linear, instance_norm
from cofii2p_tpu.models.position_encoding import (
    image_grid_coords,
    position_embedding_sine,
)
from cofii2p_tpu.models.resnet import ImageUpSample, ResNetEncoder
from cofii2p_tpu.models.transformer import LocalFeatureTransformer
from cofii2p_tpu.ops.geometry import point2node
from cofii2p_tpu.ops.patch import extract_patches


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    x32 = x.astype(jnp.float32)
    return x32 / jnp.maximum(jnp.linalg.norm(x32, axis=axis, keepdims=True), eps)


class PCFeatureHead(nn.Module):
    """2048 -> 1024 -> 512 -> 128 projection (reference network.py:29)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(1024, use_bias=False, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Linear(512, use_bias=False, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        return Linear(128, use_bias=False, dtype=self.dtype)(x)


class ScoreHead(nn.Module):
    """1x1-conv overlap score head with parameter-free instance norms
    (reference network.py:42-43).  Works on (B, N, C) or (B, H, W, C); the
    instance-norm statistics span all non-channel, non-batch axes, matching
    torch InstanceNorm1d/2d."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        spatial = tuple(range(1, x.ndim - 1))
        x = Linear(128, use_bias=False, dtype=self.dtype)(x)
        x = instance_norm(x, spatial)
        x = nn.relu(x)
        x = Linear(64, use_bias=False, dtype=self.dtype)(x)
        x = instance_norm(x, spatial)
        x = nn.relu(x)
        x = Linear(1, use_bias=False, dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


class CoFiI2P(nn.Module):
    """See module docstring.  ``mode`` is static: 'train'/'val' vs 'test'."""

    cfg: Config

    @nn.compact
    def __call__(self, batch: Dict[str, Any], mode: str, train: bool = False):
        cfg = self.cfg
        img = batch["img"]  # (B, H, W, 3)
        feats = batch["feats"]  # (B, N0, 4)
        points = batch["points"]  # list of (B, N_l, 3)
        neighbors = batch.get("neighbors")  # absent in banded mode
        subsampling = batch.get("subsampling")
        upsampling = batch.get("upsampling")
        b = img.shape[0]
        h8, w8 = cfg.pe_H, cfg.pe_W
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # --- two-stream encoders (reference network.py:76-92) ---
        pc_feature_set = KPConvFPN(
            input_dim=cfg.kpconv_input_dim,
            output_dim=cfg.kpconv_output_dim,
            init_dim=cfg.kpconv_init_dim,
            kernel_size=cfg.kernel_size,
            init_radius=cfg.init_radius,
            init_sigma=cfg.init_sigma,
            norm=cfg.norm,
            group_norm=cfg.group_norm,
            dtype=dtype,
            impl=cfg.kpconv_impl,
            tile=cfg.kpconv_tile,
            band_width=cfg.kpconv_band_width,
            band_plan=cfg.kpconv_band_plan,
            kernel=cfg.kpconv_kernel,
            knn_k=cfg.neighbor_num,
            maxpool_compact_plan=cfg.maxpool_compact_plan,
            aggregate_compact_plan=cfg.aggregate_compact_plan,
            dynamic_plan=cfg.kpconv_dynamic_plan,
            dynamic_plan_self=cfg.kpconv_dynamic_plan_self,
            dynamic_center=cfg.kpconv_dynamic_center,
            residual_fused=cfg.kpconv_residual_fused,
            knn_window_plan=cfg.kpconv_knn_window_plan,
            shared_influence=cfg.kpconv_shared_influence,
            name="pc_encoder",
        )(feats, points, neighbors, subsampling, upsampling)
        stage_sizes = {"resnet34": (3, 4, 6, 3), "resnet18": (2, 2, 2, 2)}[
            cfg.img_backbone
        ]
        img_feature_set = ResNetEncoder(
            stage_sizes=stage_sizes, dtype=dtype, name="img_encoder"
        )(img)

        pc_fine = l2norm(pc_feature_set[0])  # (B, N1, 64) fine matching feats
        pc_latent = pc_feature_set[-1]  # (B, S, 2048)
        pc_feature_middle = l2norm(
            PCFeatureHead(dtype=dtype, name="pc_feature_layer")(pc_latent)
        )

        img_s2 = img_feature_set[0]  # (B, H/2, W/2, 64)
        img_s4 = img_feature_set[1]  # (B, H/4, W/4, 64)
        img_s8_raw = img_feature_set[2]  # (B, H/8, W/8, 128)
        img_s8 = l2norm(img_s8_raw)

        # --- positional encodings + transformer (network.py:104-118) ---
        img_coords = image_grid_coords(h8, w8)  # (L, 2) (row, col)
        img_pos = position_embedding_sine(img_coords, cfg.d_model)
        pc_pos = position_embedding_sine(points[-1], cfg.d_model)  # (B, S, 128)

        img_tokens = img_s8.reshape(b, h8 * w8, cfg.d_model) + img_pos[None]
        pc_tokens = pc_feature_middle + pc_pos
        img_mid, pc_fused = LocalFeatureTransformer(
            d_model=cfg.d_model,
            nhead=cfg.nhead,
            layer_names=("self", "cross") * cfg.num_transformer_layers,
            dtype=dtype,
            attention=cfg.attention,
            name="transformer",
        )(img_tokens.astype(dtype), pc_tokens.astype(dtype))
        img_mid_map = img_mid.reshape(b, h8, w8, cfg.d_model)

        # --- overlap scores + normalized coarse features (network.py:123-126) ---
        coarse_pc_score = ScoreHead(dtype=dtype, name="pc_score_layer")(pc_fused)[..., 0]
        coarse_img_score = ScoreHead(dtype=dtype, name="img_score_layer")(img_mid_map)[..., 0]
        pc_feature_norm = l2norm(pc_fused)  # (B, S, 128)
        img_feature_norm = l2norm(img_mid_map)  # (B, h8, w8, 128)

        # --- fine image map /8 -> /4 -> /2 (network.py:129-130) ---
        # note: the reference feeds the *l2-normalized* /8 map into the
        # upsample path (network.py:91 stores the normalized tensor in
        # img_s8_feature_map; :129 upsamples it) — caught by the E2E parity
        # test in tests/test_reference_parity.py
        up4 = ImageUpSample(128, dtype=dtype, name="img_upsample_1")(
            img_s8.astype(dtype), img_s4, train
        )
        up2 = l2norm(
            ImageUpSample(64, dtype=dtype, name="img_upsample_2")(up4, img_s2, train)
        )

        out = {
            "img_feature_norm": img_feature_norm,
            "pc_feature_norm": pc_feature_norm,
            "coarse_img_score": coarse_img_score,
            "coarse_pc_score": coarse_pc_score,
            "fine_img_map": up2,
        }

        if mode in ("train", "val"):
            # supervised fine patches around the projected keypoints
            # (network.py:137-143)
            fine_idx = batch["fine_pc_inline_index"]  # (B, K) into level-1 points
            out["fine_pc_feature"] = jnp.take_along_axis(
                pc_fine, fine_idx[..., None].astype(jnp.int32), axis=1
            )  # (B, K, 64)
            centers = batch["fine_center_kpt_coors"]  # (B, K, 2) as (x, y) on /2 map
            out["fine_img_patch"] = jax.vmap(
                lambda fmap, c: extract_patches(fmap, c, 4)
            )(up2, centers)  # (B, K, 4, 4, 64)
        elif mode == "test":
            out.update(
                self._test_mode(
                    cfg, points, coarse_pc_score, pc_feature_norm, img_feature_norm,
                    pc_fine, up2,
                )
            )
        else:
            raise KeyError(mode)
        return out

    @staticmethod
    def _test_mode(cfg, points, pc_score, pc_feat, img_feat, pc_fine, fine_img_map):
        """Masked-selection rewrite of the reference fine_process loop
        (network.py:145-161, 167-187)."""
        b = pc_score.shape[0]
        h8, w8 = cfg.pe_H, cfg.pe_W
        img_flat = img_feat.reshape(b, h8 * w8, cfg.d_model)

        # per-superpoint best image token (threshold-independent):
        # distance = 1 - cosine on normalized feats (network.py:174)
        sim = jnp.einsum(
            "blc,bsc->bls", img_flat, pc_feat, preferred_element_type=jnp.float32
        )
        best_img = jnp.argmax(sim, axis=1)  # (B, S)
        cx = (best_img % w8).astype(jnp.float32)
        cy = (best_img // w8).astype(jnp.float32)
        border_ok = (
            (cx >= 2) & (cx <= w8 - 2) & (cy >= 2) & (cy <= h8 - 2)
        )  # (B, S); reference constants 2/62/2/18 generalized (network.py:184)

        # threshold decay: largest t on the grid with >= 4 inliers
        ks = jnp.arange(cfg.test_score_thresholds_num, dtype=jnp.float32)
        thrs = cfg.test_score_thresholds_start - cfg.test_score_thresholds_step * ks
        counts = jnp.sum(
            (pc_score[:, None, :] >= thrs[None, :, None]) & border_ok[:, None, :],
            axis=-1,
        )  # (B, T)
        enough = counts >= 4
        # first index with enough inliers; if none, fall back to the last grid entry
        sel = jnp.where(
            jnp.any(enough, axis=-1), jnp.argmax(enough, axis=-1), len(ks) - 1
        )
        t_star = thrs[sel]  # (B,)
        inlier_mask = (pc_score >= t_star[:, None]) & border_ok  # (B, S)

        coarse_xy = jnp.stack([cx, cy], axis=-1)  # (B, S, 2)
        fine_center_xy = coarse_xy * 4.0  # /8 grid -> /2 grid (network.py:156)
        patches = jax.vmap(lambda fmap, c: extract_patches(fmap, c, 4))(
            fine_img_map, fine_center_xy
        )  # (B, S, 4, 4, 64)

        # superpoint -> nearest level-1 point -> its fine feature
        # (network.py:153, 161)
        idx_lvl1 = jax.vmap(point2node)(points[1], points[-1])  # (B, S)
        fine_pc_feature = jnp.take_along_axis(
            pc_fine, idx_lvl1[..., None], axis=1
        )  # (B, S, 64)

        return {
            "inlier_mask": inlier_mask,
            "threshold": t_star,
            "fine_center_xy": fine_center_xy,
            "fine_img_patch": patches,
            "fine_pc_feature": fine_pc_feature,
            "coarse_pc_points": points[-1],
        }


def fine_match_xy(fine_img_patch, fine_pc_feature, fine_center_xy,
                  decode: str = "label"):
    """Argmax fine matching inside each 4x4 patch -> refined /2-scale pixels.

    Re-derivation of the eval-side fine matching (eval_all.py:98-105):
    cosine between the patch's 16 cells and the superpoint's fine feature,
    argmax cell -> (x, y) = center - 2 + (idx // 4, idx % 4).

    Args:
      fine_img_patch: (B, S, 4, 4, C) patches (rows y, cols x).
      fine_pc_feature: (B, S, C).
      fine_center_xy: (B, S, 2) as (x, y).
      decode: 'label' (default) or 'reference'.  The reference eval decodes
        the cell index with the axes swapped (eval_all.py:104-105 adds
        idx//4 — the *row* offset — to x), contradicting its own training
        labels (train.py:268-269: label index = rel_y*4 + rel_x, matching the
        patch's row-major flattening).  'label' is the label-consistent
        decode (x += idx % 4, y += idx // 4); 'reference' reproduces the
        published pipeline exactly, swap included — required for
        apples-to-apples reproduction of the published RRE/RTE, which were
        measured with the swap in place.

    Returns:
      (B, S, 2) refined pixel coordinates on the /2-resolution image.
    """
    b, s = fine_pc_feature.shape[:2]
    cells = fine_img_patch.reshape(b, s, 16, -1)
    cells_n = l2norm(cells)
    pc_n = l2norm(fine_pc_feature)
    cos = jnp.einsum("bspc,bsc->bsp", cells_n, pc_n)
    idx = jnp.argmax(cos, axis=-1)  # (B, S) in 0..15, cell = y_off*4 + x_off
    if decode == "reference":
        dx = (idx // 4).astype(jnp.float32)
        dy = (idx % 4).astype(jnp.float32)
    else:
        assert decode == "label", decode
        dx = (idx % 4).astype(jnp.float32)
        dy = (idx // 4).astype(jnp.float32)
    return fine_center_xy - 2.0 + jnp.stack([dx, dy], axis=-1)
