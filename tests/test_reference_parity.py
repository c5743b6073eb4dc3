"""End-to-end parity against the reference torch implementation.

Two things round 1 could not prove are proven here:

1. ``import_t7`` accepts a state_dict constructed by the *reference's own*
   ``CoFiI2P`` class (the exact key set of the released checkpoints,
   /root/reference/model/network.py:14-46) — including the registered-but-
   unused ``img_feature_layer`` convs, the ResNet classifier head, and the
   per-layer ``kernel_points`` buffers (which it must *consume*, not skip:
   the released weights are tied to their per-layer dispositions).

2. The assembled networks agree: feeding the reference model and our
   gather-path model identical inputs (same cloud, same neighbor /
   subsampling / upsampling maps, same image) with bridged weights yields
   the same coarse features, scores, and fine patches to fp32 tolerance —
   the class of wiring bug per-layer oracles cannot catch
   (reference forward: model/network.py:74-164).

Runs on CPU (conftest forces jax_platforms=cpu; torch is CPU-only here).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.ops.pyramid import build_pyramid
from cofii2p_tpu.utils import checkpoint as ckpt_mod
from cofii2p_tpu.utils.checkpoint import import_t7

from tests.reference_bridge import make_reference_model

IMG_H, IMG_W = 32, 64  # /8 grid 4x8 = 32 tokens; /2 map 16x32
# test-mode parity runs at the REAL image scale: the reference fine_process
# border mask hardcodes KITTI's 20x64 coarse grid (x in [2,62], y in [2,18],
# network.py:184) and only there does our H/8,W/8 generalization coincide
# with the literal constants.  The cloud stays small (512 pts) for CPU cost.
TM_IMG_H, TM_IMG_W = 160, 512


@pytest.fixture(scope="module")
def ref_model():
    model, opt = make_reference_model(img_H=IMG_H, img_W=IMG_W, seed=0)
    # emulate the released checkpoints: every KPConv carries its own
    # rotated/jittered disposition (kernel_points.py:429-453).  The bridge
    # patches load_kernels deterministic, so re-randomize the buffers here to
    # make per-layer import failures observable.
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("kernel_points"):
                buf.add_(0.01 * torch.randn(buf.shape, generator=g))
    return model, opt


@pytest.fixture(scope="module")
def cfg():
    return TinyConfig(
        img_H=IMG_H,
        img_W=IMG_W,
        kpconv_impl="gather",
        kpconv_kernel="xla",
        kpconv_shared_influence=False,  # honor per-layer imported kernels
    )


def _build_inputs(cfg, seed=3):
    """One geometrically plausible tiny frame + pyramid with exact kNN maps,
    shared verbatim by both models."""
    rng = np.random.RandomState(seed)
    n = cfg.num_pc
    pts = rng.uniform(-8.0, 8.0, (n, 3)).astype(np.float32)
    pts[:, 2] += 12.0  # in front of the camera, reference-style cam frame
    feats = rng.randn(n, 4).astype(np.float32)
    img = rng.rand(cfg.img_H, cfg.img_W, 3).astype(np.float32)

    pyr = jax.device_get(
        build_pyramid(
            jnp.asarray(pts),
            jax.random.PRNGKey(0),
            sizes=cfg.pyramid_sizes,
            neighbor_num=cfg.neighbor_num,
            approx=False,
            need_maps=True,
            ordering="xyz",
        )
    )
    feats = np.take(feats, np.asarray(pyr["perm0"]), axis=0)

    k = cfg.num_kpt
    h2, w2 = cfg.img_H // 2, cfg.img_W // 2
    centers = np.stack(
        [
            rng.randint(2, w2 - 2, k).astype(np.float32),  # x
            rng.randint(2, h2 - 2, k).astype(np.float32),  # y
        ],
        axis=-1,
    )  # (K, 2) as (x, y) on the /2 map
    fine_idx = rng.randint(0, cfg.pyramid_sizes[1], k).astype(np.int32)
    return pyr, feats, img, centers, fine_idx


def _our_batch(pyr, feats, img, centers, fine_idx):
    add_b = lambda x: jnp.asarray(x)[None]
    return {
        "img": add_b(img),
        "feats": add_b(feats),
        "points": [add_b(p) for p in pyr["points"]],
        "neighbors": [add_b(x).astype(jnp.int32) for x in pyr["neighbors"]],
        "subsampling": [add_b(x).astype(jnp.int32) for x in pyr["subsampling"]],
        "upsampling": [add_b(x).astype(jnp.int32) for x in pyr["upsampling"]],
        "fine_center_kpt_coors": add_b(centers),
        "fine_pc_inline_index": add_b(fine_idx),
    }


def _torch_inputs(pyr, feats, img, centers, fine_idx):
    t = lambda x: torch.from_numpy(np.asarray(x))
    pc_data_dict = {
        "feats": t(feats).float(),
        "points": [t(np.asarray(p, np.float32)) for p in pyr["points"]],
        "neighbors": [t(x).long() for x in pyr["neighbors"]],
        "subsampling": [t(x).long() for x in pyr["subsampling"]],
        "upsampling": [t(x).long() for x in pyr["upsampling"]],
    }
    img_t = t(img.transpose(2, 0, 1)).float()[None]  # (1, 3, H, W)
    centers_t = t(centers.T.astype(np.float32))  # (2, K) rows (x, y)
    fine_idx_t = t(fine_idx).long()
    return pc_data_dict, img_t, centers_t, fine_idx_t


def _bridged_params(tmp_path, ref_model, cfg, batch):
    model = CoFiI2P(cfg)
    variables = jax.jit(model.init, static_argnames=("mode", "train"))(
        jax.random.PRNGKey(0), batch, mode="train", train=False
    )
    path = str(tmp_path / "ref.t7")
    torch.save(ref_model.state_dict(), path)
    params, stats = import_t7(
        path,
        jax.device_get(variables["params"]),
        jax.device_get(variables.get("batch_stats", {})),
    )
    return model, params, stats


def test_import_t7_real_reference_state_dict(tmp_path, ref_model, cfg):
    """The genuine reference key set imports with zero unexpected leftovers,
    and per-layer kernel_points land in our per-layer parameters."""
    model_t, _ = ref_model
    pyr, feats, img, centers, fine_idx = _build_inputs(cfg)
    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    _, params, _ = _bridged_params(tmp_path, model_t, cfg, batch)

    allowed = (
        "fine_img_pos_encoding",
        "fine_pc_pos_encoding",
        "num_batches_tracked",
        "img_feature_layer.",
        "img_encoder.backbone.fc.",
    )
    leftovers = [
        k for k in ckpt_mod._last_unused if not any(a in k for a in allowed)
    ]
    assert leftovers == [], leftovers

    sd = model_t.state_dict()
    for name in ("encoder1_1", "encoder3_2", "encoder5_3"):
        ours = np.asarray(params["pc_encoder"][name]["KPConv"]["kernel_points"])
        theirs = sd[f"pc_encoder.{name}.KPConv.kernel_points"].numpy()
        np.testing.assert_array_equal(ours, theirs, err_msg=name)
    # the buffers genuinely differ per layer (jittered above), so sharing
    # one disposition would break parity — guard that assumption
    a = sd["pc_encoder.encoder1_1.KPConv.kernel_points"].numpy()
    b = sd["pc_encoder.encoder1_2.KPConv.kernel_points"].numpy()
    assert np.abs(a - b).max() > 1e-4


def test_e2e_forward_parity(tmp_path, ref_model, cfg):
    """Assembled-network agreement: identical inputs + bridged weights =>
    same outputs (train mode) to fp32 tolerance."""
    model_t, _ = ref_model
    pyr, feats, img, centers, fine_idx = _build_inputs(cfg)
    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    model, params, stats = _bridged_params(tmp_path, model_t, cfg, batch)

    out = jax.device_get(
        jax.jit(model.apply, static_argnames=("mode", "train"))(
            {"params": params, "batch_stats": stats}, batch,
            mode="train", train=False,
        )
    )

    pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
        pyr, feats, img, centers, fine_idx
    )
    with torch.no_grad():
        (
            img_feature_norm,
            pc_feature_norm,
            coarse_img_score,
            coarse_pc_score,
            fine_img_patch,
            fine_pc_feature,
            _,
            _,
        ) = model_t(pc_data_dict, img_t, centers_t, None, fine_idx_t, "train")

    def close(ours, theirs, name, atol):
        ours = np.asarray(ours, np.float64)
        theirs = np.asarray(theirs, np.float64)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        diff = np.abs(ours - theirs).max()
        assert diff <= atol, f"{name}: max abs diff {diff} > {atol}"

    # ours NHWC/(B,S,C) vs reference NCHW/(C,S)
    close(
        np.moveaxis(out["img_feature_norm"][0], -1, 0),
        img_feature_norm[0].numpy(),
        "img_feature_norm",
        2e-3,
    )
    close(
        out["pc_feature_norm"][0].T,
        pc_feature_norm.numpy(),
        "pc_feature_norm",
        2e-3,
    )
    close(
        out["coarse_img_score"][0],
        coarse_img_score[0, 0].numpy(),
        "coarse_img_score",
        2e-3,
    )
    close(
        out["coarse_pc_score"][0],
        coarse_pc_score[0, 0].numpy(),
        "coarse_pc_score",
        2e-3,
    )
    close(
        np.moveaxis(out["fine_img_patch"][0], -1, 1),
        fine_img_patch.numpy(),
        "fine_img_patch",
        2e-3,
    )
    close(
        out["fine_pc_feature"][0],
        fine_pc_feature.numpy(),
        "fine_pc_feature",
        2e-3,
    )


@pytest.mark.parametrize(
    "compact_mp,compact_agg", [(False, False), (True, False), (True, True)]
)
def test_e2e_banded_knn_parity(tmp_path, ref_model, cfg, compact_mp, compact_agg):
    """The banded_knn fast path (no maps, no gathers — the dataset-scale
    .t7 evaluation path) agrees with the torch reference itself on the
    genuine state_dict, with full-coverage bands: membership {d2 <= tau}
    == the reference's kNN maps, active-row counts match, and per-layer
    imported dispositions are honored by the banded kernels.

    compact_mp=True swaps the strided-shortcut maxpools for the compacted
    top-k form (banded_compact_maxpool, knn=True); compact_agg=True swaps
    the KPConv aggregations for banded_compact_aggregate (knn=True, per-
    layer imported dispositions) — proving those formulations reference-
    faithful end-to-end too."""
    model_t, _ = ref_model
    cfg_knn = cfg.replace(
        kpconv_impl="banded_knn",
        kpconv_band_width=1 << 20,  # band == whole level -> exact kNN
        kpconv_band_plan=None,
        maxpool_compact_plan=((128,) * 8 if compact_mp else None),
        aggregate_compact_plan=((1,) * 8 if compact_agg else None),
    )
    pyr, feats, img, centers, fine_idx = _build_inputs(cfg_knn)
    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    model, params, stats = _bridged_params(tmp_path, model_t, cfg_knn, batch)

    out = jax.device_get(
        jax.jit(model.apply, static_argnames=("mode", "train"))(
            {"params": params, "batch_stats": stats}, batch,
            mode="train", train=False,
        )
    )

    pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
        pyr, feats, img, centers, fine_idx
    )
    with torch.no_grad():
        (
            img_feature_norm,
            pc_feature_norm,
            coarse_img_score,
            coarse_pc_score,
            fine_img_patch,
            fine_pc_feature,
            _,
            _,
        ) = model_t(pc_data_dict, img_t, centers_t, None, fine_idx_t, "train")

    def close(ours, theirs, name, atol):
        ours = np.asarray(ours, np.float64)
        theirs = np.asarray(theirs, np.float64)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        diff = np.abs(ours - theirs).max()
        assert diff <= atol, f"{name}: max abs diff {diff} > {atol}"

    close(
        np.moveaxis(out["img_feature_norm"][0], -1, 0),
        img_feature_norm[0].numpy(),
        "img_feature_norm",
        2e-3,
    )
    close(
        out["pc_feature_norm"][0].T,
        pc_feature_norm.numpy(),
        "pc_feature_norm",
        2e-3,
    )
    close(
        out["coarse_pc_score"][0],
        coarse_pc_score[0, 0].numpy(),
        "coarse_pc_score",
        2e-3,
    )
    close(
        out["fine_pc_feature"][0],
        fine_pc_feature.numpy(),
        "fine_pc_feature",
        2e-3,
    )


# ---------------------------------------------------------------------------
# test-mode (inference-path) parity — the path that produces the published
# numbers: fine_process's threshold-decay loop + coarse pixel/border
# selection (network.py:145-161, 167-187), point2node, patch extraction at
# coarse_xy*4 (network.py:156-158), and the eval fine decode
# (evaluation/eval_all.py:99-105).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_model_tm():
    # seed=1 (not 0): the reference's fine_process decay loop
    # (network.py:147-151) never terminates when fewer than 4 superpoints
    # survive its border mask even at thrs < 0 — with random weights the
    # argmin image correspondences collapse onto a handful of cells
    # (conv zero-padding makes border cells the feature extremes), and for
    # seed=0 every one of them is border (tools/tm_terminate_probe: 0
    # survivors at thrs=-1 -> the reference itself would loop forever).
    # seed=1 yields 10 interior survivors -> guaranteed termination.
    model, opt = make_reference_model(img_H=TM_IMG_H, img_W=TM_IMG_W, seed=1)
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("kernel_points"):
                buf.add_(0.01 * torch.randn(buf.shape, generator=g))
    return model, opt


@pytest.fixture(scope="module")
def cfg_tm():
    return TinyConfig(
        img_H=TM_IMG_H,
        img_W=TM_IMG_W,
        kpconv_impl="gather",
        kpconv_kernel="xla",
        kpconv_shared_influence=False,
    )


@pytest.mark.slow
def test_e2e_test_mode_parity(tmp_path, ref_model_tm, cfg_tm):
    """Inference-path agreement on bridged weights at the real 20x64 coarse
    grid: the reference's own fine_process loop output (selected superpoint
    set, threshold, coarse pixels), the point2node fine-feature lookup, the
    4x4 patches at coarse_xy*4, the eval fine decode (axis swap included —
    fine_match_xy(decode='reference')), and the exact (imagePoints,
    objectPoints) pair eval_all.py:107 hands to PnP."""
    cfg = cfg_tm
    model_t, _ = ref_model_tm
    # seed=7 pairs with the model fixture's seed=1: the reference loop
    # terminates (see ref_model_tm).  Guarded below before the torch
    # forward so a shape/seed change fails loudly instead of hanging.
    pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=7)
    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    # disable_jit: at the real 160x512 image scale the XLA CPU compile of
    # the assembled network takes ~50+ CPU-minutes, while eager op-by-op
    # execution (each primitive compiles once, tiny, cached) finishes in
    # ~2 min.  Numerics are identical fp32 either way for parity purposes.
    with jax.disable_jit():
        model, params, stats = _bridged_params(tmp_path, model_t, cfg, batch)
        out = jax.device_get(
            model.apply(
                {"params": params, "batch_stats": stats}, batch,
                mode="test", train=False,
            )
        )

    pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
        pyr, feats, img, centers, fine_idx
    )
    # termination guard: the decay loop's survivor set is monotone in thrs,
    # so fine_process at thrs=-1 is its limit — if fewer than 4 pass there,
    # the reference's while loop (network.py:147-151) would spin forever.
    # One cheap train-mode forward reuses the shared trunk to check.
    from tests.reference_bridge import load_reference

    load_reference()
    from model.network import fine_process as ref_fine_process

    with torch.no_grad():
        (imgn_g, pcn_g, _, score_g, _, _, _, _) = model_t(
            pc_data_dict, img_t, centers_t, None, fine_idx_t, "train"
        )
        _, idx_g = ref_fine_process(score_g, pcn_g, imgn_g, thrs=-1.0)
    assert idx_g.numel() >= 4, (
        f"only {idx_g.numel()} superpoints survive the border mask at "
        "thrs=-1: the reference's fine_process loop would never terminate "
        "for these weights/inputs — change the fixture seeds"
    )

    with torch.no_grad():
        (
            _img_feat,
            _pc_feat,
            _img_score,
            _pc_score,
            ref_patch,          # (Nin, C, 16) — already flattened in test mode
            ref_fine_pc_feat,   # (Nin, 64)
            ref_fine_center_xy, # (2, Nin) = coarse_xy * 4
            ref_pc_points,      # (Nin, 3) PnP objectPoints
        ) = model_t(pc_data_dict, img_t, None, None, None, "test")

    # --- the selected superpoint set and threshold ---
    mask = np.asarray(out["inlier_mask"][0])
    s = mask.shape[0]
    ours_sel = np.flatnonzero(mask)
    # reference returns points, not indices; recover the index set by
    # matching coordinates (superpoint coords are unique in this cloud)
    sp = np.asarray(jax.device_get(batch["points"][-1][0]))
    ref_pts = ref_pc_points.numpy()
    d = np.linalg.norm(sp[None, :, :] - ref_pts[:, None, :], axis=-1)
    ref_sel = d.argmin(axis=1)
    assert (d.min(axis=1) < 1e-5).all()
    assert ref_sel.shape[0] >= 4
    np.testing.assert_array_equal(np.sort(ref_sel), ours_sel)

    def close(ours, theirs, name, atol):
        ours = np.asarray(ours, np.float64)
        theirs = np.asarray(theirs, np.float64)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        diff = np.abs(ours - theirs).max() if ours.size else 0.0
        assert diff <= atol, f"{name}: max abs diff {diff} > {atol}"

    # order the reference rows by superpoint index to compare against our
    # mask-ordered (ascending index) rows
    order = np.argsort(ref_sel)

    # --- coarse pixels (fine_center_xy = coarse_xy * 4) ---
    close(
        out["fine_center_xy"][0][ours_sel],
        ref_fine_center_xy.numpy().T[order],
        "fine_center_xy",
        0.0,
    )
    # --- PnP objectPoints (eval_all.py:107) ---
    close(
        np.asarray(sp)[ours_sel],
        ref_pts[order],
        "coarse_pc_points",
        0.0,
    )
    # --- point2node fine features (network.py:153,161) ---
    close(
        out["fine_pc_feature"][0][ours_sel],
        ref_fine_pc_feat.numpy()[order],
        "fine_pc_feature",
        2e-3,
    )
    # --- 4x4 patches at coarse_xy*4 on the /2 map (network.py:156-158) ---
    ours_patch = np.moveaxis(
        np.asarray(out["fine_img_patch"][0][ours_sel], np.float64), -1, 1
    ).reshape(len(ours_sel), -1, 16)
    close(ours_patch, ref_patch.numpy()[order], "fine_img_patch", 2e-3)

    # --- eval fine decode (eval_all.py:99-105), axis swap included ---
    from cofii2p_tpu.models.network import fine_match_xy

    ours_xy = np.asarray(
        jax.device_get(
            fine_match_xy(
                out["fine_img_patch"],
                out["fine_pc_feature"],
                out["fine_center_xy"],
                decode="reference",
            )
        )[0]
    )[ours_sel]

    fpf = torch.from_numpy(ref_fine_pc_feat.numpy()).unsqueeze(-1)  # (N, C, 1)
    dist = torch.cosine_similarity(
        torch.from_numpy(ref_patch.numpy()).unsqueeze(-1), fpf.unsqueeze(-2)
    )
    dist = torch.squeeze(dist, -1)
    predict_index = torch.argmax(dist, dim=1)
    ref_xy = torch.from_numpy(ref_fine_center_xy.numpy().copy()) - 2
    ref_xy[0] = ref_xy[0] + predict_index // 4
    ref_xy[1] = ref_xy[1] + predict_index % 4
    close(ours_xy, ref_xy.numpy().T[order], "fine_xy (PnP imagePoints)", 0.0)


# ---------------------------------------------------------------------------
# full-KITTI-scale parity (160x512 image, 20480-point cloud, 64 keypoints):
# scale-dependent wiring — the 20x64 coarse grid, border mask at real size,
# the 80x256 /2 fine map, sine encodings at real grid sizes — compared
# against the unmodified torch reference in train AND test mode.  Slow
# (tens of minutes on CPU): opt-in via COFII2P_FULL_SCALE=1.  A passing run
# is recorded in PARITY.md.
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not os.environ.get("COFII2P_FULL_SCALE"),
    reason="slow full-scale parity; set COFII2P_FULL_SCALE=1",
)
def test_full_scale_parity(tmp_path):
    from cofii2p_tpu.config import KITTIConfig

    cfg = KITTIConfig(
        kpconv_impl="gather",
        kpconv_kernel="xla",
        kpconv_shared_influence=False,
    )
    model_t, _ = make_reference_model(img_H=cfg.img_H, img_W=cfg.img_W, seed=0)
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for name, buf in model_t.named_buffers():
            if name.endswith("kernel_points"):
                buf.add_(0.01 * torch.randn(buf.shape, generator=g))

    pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=9)
    batch = _our_batch(pyr, feats, img, centers, fine_idx)
    # eager throughout: XLA CPU compiles of the assembled network at full
    # scale are pathologically slow (50+ CPU-min at 160x512 already); see
    # test_e2e_test_mode_parity
    with jax.disable_jit():
        model, params, stats = _bridged_params(tmp_path, model_t, cfg, batch)

    def close(ours, theirs, name, atol):
        ours = np.asarray(ours, np.float64)
        theirs = np.asarray(theirs, np.float64)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        diff = np.abs(ours - theirs).max() if ours.size else 0.0
        assert diff <= atol, f"{name}: max abs diff {diff} > {atol}"
        print(f"full-scale {name}: max abs diff {diff:.3e} (atol {atol})")

    pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
        pyr, feats, img, centers, fine_idx
    )

    # --- train mode ---
    with jax.disable_jit():
        out = jax.device_get(
            model.apply(
                {"params": params, "batch_stats": stats}, batch,
                mode="train", train=False,
            )
        )
    with torch.no_grad():
        (
            img_feature_norm, pc_feature_norm, coarse_img_score,
            coarse_pc_score, fine_img_patch, fine_pc_feature, _, _,
        ) = model_t(pc_data_dict, img_t, centers_t, None, fine_idx_t, "train")
    close(
        np.moveaxis(out["img_feature_norm"][0], -1, 0),
        img_feature_norm[0].numpy(), "train img_feature_norm", 3e-3,
    )
    close(
        out["pc_feature_norm"][0].T, pc_feature_norm.numpy(),
        "train pc_feature_norm", 3e-3,
    )
    close(
        out["coarse_img_score"][0], coarse_img_score[0, 0].numpy(),
        "train coarse_img_score", 3e-3,
    )
    close(
        out["coarse_pc_score"][0], coarse_pc_score[0, 0].numpy(),
        "train coarse_pc_score", 3e-3,
    )
    close(
        np.moveaxis(out["fine_img_patch"][0], -1, 1),
        fine_img_patch.numpy(), "train fine_img_patch", 3e-3,
    )
    close(
        out["fine_pc_feature"][0], fine_pc_feature.numpy(),
        "train fine_pc_feature", 3e-3,
    )
    del out

    # --- test mode (the published-numbers path, real border constants) ---
    # termination guard (see test_e2e_test_mode_parity): <4 border-mask
    # survivors at thrs=-1 means the reference loop would spin forever
    from tests.reference_bridge import load_reference

    load_reference()
    from model.network import fine_process as ref_fine_process

    with torch.no_grad():
        _, idx_g = ref_fine_process(
            coarse_pc_score, pc_feature_norm, img_feature_norm, thrs=-1.0
        )
    assert idx_g.numel() >= 4, (
        f"only {idx_g.numel()} survivors at thrs=-1: the reference "
        "fine_process loop would never terminate — change seeds"
    )

    with jax.disable_jit():
        out = jax.device_get(
            model.apply(
                {"params": params, "batch_stats": stats}, batch,
                mode="test", train=False,
            )
        )
    with torch.no_grad():
        (
            _if, _pf, _is, _ps,
            ref_patch, ref_fine_pc_feat, ref_fine_center_xy, ref_pc_points,
        ) = model_t(pc_data_dict, img_t, None, None, None, "test")

    mask = np.asarray(out["inlier_mask"][0])
    ours_sel = np.flatnonzero(mask)
    sp = np.asarray(jax.device_get(batch["points"][-1][0]))
    ref_pts = ref_pc_points.numpy()
    d = np.linalg.norm(sp[None, :, :] - ref_pts[:, None, :], axis=-1)
    ref_sel = d.argmin(axis=1)
    assert (d.min(axis=1) < 1e-5).all()
    np.testing.assert_array_equal(np.sort(ref_sel), ours_sel)
    order = np.argsort(ref_sel)
    close(
        out["fine_center_xy"][0][ours_sel],
        ref_fine_center_xy.numpy().T[order], "test fine_center_xy", 0.0,
    )
    close(
        out["fine_pc_feature"][0][ours_sel],
        ref_fine_pc_feat.numpy()[order], "test fine_pc_feature", 3e-3,
    )
    ours_patch = np.moveaxis(
        np.asarray(out["fine_img_patch"][0][ours_sel], np.float64), -1, 1
    ).reshape(len(ours_sel), -1, 16)
    close(ours_patch, ref_patch.numpy()[order], "test fine_img_patch", 3e-3)
