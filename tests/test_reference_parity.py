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
