"""One-step gradient parity against torch autograd on bridged weights.

Forward parity (tests/test_reference_parity.py) cannot catch backward-only
bugs — a stop_gradient in the wrong place, a mask leaking into grads, a
custom-VJP routing error.  This test assembles the full training loss the
way the reference does (train.py:230-288: desc circle loss on the gathered
keypoint features + overlap BCE + fine circle loss), computes torch
autograd gradients through the entire reference network
(/root/reference/model/network.py:74-164, model/loss.py:9-93), maps them
into our parameter tree with the same linear transforms import_t7 applies
to weights (transposes/reshapes commute with d/dw), and compares against
``jax.grad`` of our assembled loss (train_lib.batch_losses) — across the
whole tree, not a sampled handful.

Runs on CPU (conftest forces jax_platforms=cpu; torch is CPU-only here).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cofii2p_tpu import train_lib
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.utils.checkpoint import import_t7

from tests.reference_bridge import load_reference
from tests.test_reference_parity import (
    _bridged_params,
    _build_inputs,
    _our_batch,
    _torch_inputs,
    cfg,
    ref_model,
)


def _gt_fields(cfg_, pyr, rng):
    """Keypoint index sets + GT pose/intrinsics shared by both sides.

    K_4 is engineered so each selected superpoint projects inside the /8
    grid and its rounded cell is the matching image keypoint — giving the
    correspondence mask a full diagonal (train.py:247-251 semantics), so
    the positive branch of desc_loss carries gradient too.
    """
    k = cfg_.num_kpt
    s = cfg_.pyramid_sizes[-1]
    h8, w8 = cfg_.pe_H, cfg_.pe_W
    perm = rng.permutation(s)
    kpt_idx = np.sort(perm[:k]).astype(np.int32)
    outl_idx = np.sort(perm[k : 2 * k]).astype(np.int32)

    P = np.eye(4, dtype=np.float32)
    th = 0.05
    P[:3, :3] = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    P[:3, 3] = (0.3, -0.2, 0.5)
    K4 = np.array(
        [[1.5, 0.0, w8 / 2.0], [0.0, 1.5, h8 / 2.0], [0.0, 0.0, 1.0]],
        np.float32,
    )

    sp = np.asarray(pyr["points"][-1], np.float32)
    cam = sp[kpt_idx] @ P[:3, :3].T + P[:3, 3]
    uvw = cam @ K4.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    img_x = np.clip(np.round(uv[:, 0]), 0, w8 - 1)
    img_y = np.clip(np.round(uv[:, 1]), 0, h8 - 1)
    img_kpt = (img_y * w8 + img_x).astype(np.int32)
    # at least a few pairs must be genuine positives (projection within
    # dist_thres of its grid cell) or the desc positive branch is dead
    d = np.hypot(uv[:, 0] - img_x, uv[:, 1] - img_y)
    assert (d <= cfg_.dist_thres).sum() >= 4

    rel = rng.randint(0, 4, (k, 2)).astype(np.int32)  # (dx, dy) in 0..3
    relative_index = rel[:, 1] * 4 + rel[:, 0]
    return kpt_idx, outl_idx, img_kpt, P, K4, relative_index


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


def test_one_step_gradient_parity(tmp_path, ref_model, cfg):
    load_reference()
    from model.loss import desc_loss as ref_desc_loss
    from model.loss import fine_circle_loss as ref_fine_circle_loss
    from model.loss import overlap_loss as ref_overlap_loss

    model_t, opt = ref_model
    rng = np.random.RandomState(11)
    pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=7)
    kpt_idx, outl_idx, img_kpt, P, K4, relative_index = _gt_fields(
        cfg, pyr, rng
    )

    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    batch.update(
        {
            "pc_kpt_idx": jnp.asarray(kpt_idx)[None],
            "pc_outline_idx": jnp.asarray(outl_idx)[None],
            "coarse_img_kpt_idx": jnp.asarray(img_kpt)[None],
            "P": jnp.asarray(P)[None],
            "K_4": jnp.asarray(K4)[None],
            "kpt_valid": jnp.ones((1, cfg.num_kpt), jnp.float32),
            "relative_index": jnp.asarray(relative_index)[None],
        }
    )
    model, params, stats = _bridged_params(tmp_path, model_t, cfg, batch)

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": stats}, batch, mode="train",
            train=False,
        )
        terms = train_lib.batch_losses(cfg, out, batch)
        return terms["loss"]

    loss_ours, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    grads = jax.device_get(grads)

    # --- torch side: the reference's own assembly, train.py:230-288 ---
    pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
        pyr, feats, img, centers, fine_idx
    )
    model_t.zero_grad(set_to_none=True)
    (
        img_features,
        pc_features,
        _img_score,
        coarse_pc_score,
        fine_img_feature_patch,
        fine_pc_inline_feature,
        _,
        _,
    ) = model_t(pc_data_dict, img_t, centers_t, None, fine_idx_t, "train")

    dev = torch.device("cpu")
    kpt_t = torch.from_numpy(kpt_idx).long()
    outl_t = torch.from_numpy(outl_idx).long()
    img_kpt_t = torch.from_numpy(img_kpt).long()
    k = cfg.num_kpt
    h8, w8 = cfg.pe_H, cfg.pe_W

    c = pc_features.size(0)
    pc_inline = torch.gather(
        pc_features, index=kpt_t.unsqueeze(0).expand(c, k), dim=-1
    )
    pc_xyz_inline = torch.gather(
        pc_data_dict["points"][-1].T,
        index=kpt_t.unsqueeze(0).expand(3, k),
        dim=-1,
    )
    img_flat = img_features.contiguous().view(img_features.size(1), -1)
    img_x = (
        torch.linspace(0, w8 - 1, w8).view(1, -1).expand(h8, w8).unsqueeze(0)
    )
    img_y = (
        torch.linspace(0, h8 - 1, h8).view(-1, 1).expand(h8, w8).unsqueeze(0)
    )
    img_xy = torch.cat((img_x, img_y), dim=0).view(2, -1)
    img_flat_inline = torch.gather(
        img_flat, index=img_kpt_t.unsqueeze(0).expand(img_flat.size(0), k),
        dim=-1,
    )
    img_xy_inline = torch.gather(
        img_xy, index=img_kpt_t.unsqueeze(0).expand(2, k), dim=-1
    )
    P_t = torch.from_numpy(P)
    K4_t = torch.from_numpy(K4)
    proj = torch.mm(K4_t, torch.mm(P_t[0:3, 0:3], pc_xyz_inline) + P_t[0:3, 3:])
    pc_xy = proj[0:2, :] / proj[2:, :]
    corr_mask = (
        torch.sqrt(
            torch.sum(
                torch.square(img_xy_inline.unsqueeze(-1) - pc_xy.unsqueeze(-2)),
                dim=0,
            )
        )
        <= cfg.dist_thres
    ).float()

    loss_desc_t, _ = ref_desc_loss(
        dev, img_flat_inline, pc_inline, corr_mask,
        pos_margin=opt.pos_margin, neg_margin=opt.neg_margin,
    )
    inline_score = torch.squeeze(coarse_pc_score[:, :, kpt_t])
    outline_score = torch.squeeze(coarse_pc_score[:, :, outl_t])
    loss_coarse_t = ref_overlap_loss(dev, inline_score, outline_score)
    loss_fine_t = ref_fine_circle_loss(
        dev, fine_img_feature_patch, fine_pc_inline_feature,
        torch.from_numpy(relative_index).long(), k,
    )
    loss_t = loss_desc_t + loss_coarse_t + loss_fine_t
    loss_t.backward()

    assert abs(float(loss_ours) - float(loss_t)) <= 2e-3, (
        float(loss_ours), float(loss_t),
    )

    # --- map torch grads into our tree with the import transforms ---
    grad_sd = {}
    for name, p in model_t.named_parameters():
        grad_sd[name] = (
            p.grad.detach().clone() if p.grad is not None
            else torch.zeros_like(p)
        )
    for name, b in model_t.named_buffers():
        grad_sd[name] = torch.zeros_like(b)
    gpath = str(tmp_path / "grads.t7")
    torch.save(grad_sd, gpath)
    zeros = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), grads)
    ref_grads, _ = import_t7(gpath, zeros, jax.device_get(stats))

    ours = _flatten(grads)
    theirs = _flatten(ref_grads)
    assert set(ours) == set(theirs)
    gmax = max(np.abs(g).max() for g in theirs.values())
    assert gmax > 1e-4  # the torch backward genuinely produced gradients
    checked = 0
    for key in sorted(ours):
        if "kernel_points" in key:
            continue  # torch buffers: no autograd there by construction
        a, b = ours[key], theirs[key]
        assert a.shape == b.shape, key
        scale = max(np.abs(b).max(), 1e-3 * gmax)
        diff = np.abs(a - b).max() if a.size else 0.0
        # fp32 tolerance: both backwards run fp32 with different reduction
        # orders (torch CPU vs XLA) through an 11-block FPN + 8 transformer
        # layers; observed worst key is ~2.1% of its own max
        # (pc_encoder/encoder2_2 bias) with the bulk far below 1%
        assert diff <= 4e-2 * scale + 1e-6, (
            f"{key}: max abs grad diff {diff} vs scale {scale}"
        )
        checked += 1
    # every subsystem must be represented with a real (nonzero) gradient
    for sub in (
        "img_encoder",
        "pc_encoder",
        "transformer",
        "pc_score_layer",
        "img_upsample_1",
        "pc_feature_layer",
    ):
        keys = [k2 for k2 in theirs if k2.startswith(sub)]
        assert keys, sub
        assert max(np.abs(theirs[k2]).max() for k2 in keys) > 0.0, sub
    assert checked > 50
