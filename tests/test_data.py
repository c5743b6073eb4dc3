"""Data pipeline tests: host voxel ops, augmentations, and the on-device
sample preparation contract."""

import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.data.augment import color_jitter, random_se3, scale_intrinsics
from cofii2p_tpu.data.device_pipeline import masked_choice, prepare_samples
from cofii2p_tpu.data.loader import BatchLoader, _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.data.voxel import resample_fixed, voxel_downsample


def test_voxel_downsample_averages():
    pts = np.array([[0.01, 0.0, 0.0], [0.09, 0.0, 0.0], [5.0, 5.0, 5.0]], np.float32)
    attrs = np.array([[1.0], [3.0], [7.0]], np.float32)
    out_p, out_a = voxel_downsample(pts, attrs, 0.1)
    assert out_p.shape[0] == 2
    i = np.argmin(out_p[:, 0])
    np.testing.assert_allclose(out_p[i], [0.05, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out_a[i], [2.0], atol=1e-6)


def test_resample_fixed_up_and_down():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    up, _ = resample_fixed(pts, None, 256, rng)
    assert up.shape == (256, 3)
    down, _ = resample_fixed(pts, None, 50, rng)
    assert down.shape == (50, 3)
    assert len({tuple(r) for r in down.round(5)}) == 50  # no dup when shrinking


def test_random_se3_respects_amplitudes():
    rng = np.random.RandomState(1)
    amp = dict(tx=10.0, ty=0.0, tz=10.0, rx=0.0, ry=np.pi, rz=0.0)
    for _ in range(20):
        P = random_se3(rng, amp)
        assert abs(P[1, 3]) < 1e-9  # ty amplitude 0
        assert abs(P[0, 3]) <= 10 and abs(P[2, 3]) <= 10
        # rx=rz=0 -> rotation about y only: R[1,1] == 1
        np.testing.assert_allclose(P[1, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3), atol=1e-5)


def test_color_jitter_stays_in_range():
    rng = np.random.RandomState(2)
    img = rng.rand(16, 24, 3).astype(np.float32)
    out = color_jitter(img, rng)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)  # something changed


def test_masked_choice_prefers_valid():
    rng = jax.random.PRNGKey(0)
    mask = jnp.asarray([True, False, True, False, True, False])
    idx, valid = masked_choice(rng, mask, 3)
    assert sorted(np.asarray(idx).tolist()) == [0, 2, 4]
    assert np.asarray(valid).all()
    # more requested than available -> tail flagged invalid
    idx, valid = masked_choice(rng, mask, 5)
    assert np.asarray(valid).sum() == 3


def test_prepare_samples_contract():
    cfg = TinyConfig()
    ds = SyntheticDataset(cfg, "val", 4)
    host = _collate([ds[i] for i in range(2)])
    host.pop("index")
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(0), host["img"], cfg,
    )
    B, S, K = 2, cfg.num_superpoints, cfg.num_kpt
    assert [p.shape for p in batch["points"]] == [
        (B, n, 3) for n in cfg.pyramid_sizes
    ]
    assert batch["feats"].shape == (B, cfg.num_pc, 4)
    assert batch["pc_kpt_idx"].shape == (B, K)
    assert batch["coarse_img_mask"].shape == (B, cfg.pe_H, cfg.pe_W)
    assert batch["relative_index"].shape == (B, K)
    ri = np.asarray(batch["relative_index"])
    assert (ri >= 0).all() and (ri < 16).all()

    # selected keypoints must actually be in view: project with GT pose
    P_gt = np.asarray(batch["P"])  # = inv(P_rand)
    for b in range(B):
        kpt = np.asarray(batch["pc_kpt_idx"][b])
        valid = np.asarray(batch["kpt_valid"][b])
        sp = np.asarray(batch["points"][-1][b])[kpt[valid]]
        cam = sp @ P_gt[b][:3, :3].T + P_gt[b][:3, 3]
        assert (cam[:, 2] > 0).all()
        uv = cam @ np.asarray(batch["K_4"][b]).T
        uv = uv[:, :2] / uv[:, 2:]
        xy = np.floor(uv + 0.5)
        assert (xy[:, 0] >= 1).all() and (xy[:, 0] <= cfg.pe_W - 3).all()
        assert (xy[:, 1] >= 1).all() and (xy[:, 1] <= cfg.pe_H - 3).all()

    # all integer index fields are within range (no overflow garbage)
    ck = np.asarray(batch["coarse_img_kpt_idx"])
    assert (ck >= 0).all() and (ck < cfg.pe_H * cfg.pe_W).all()
    fi = np.asarray(batch["fine_pc_inline_index"])
    assert (fi >= 0).all() and (fi < cfg.pyramid_sizes[1]).all()


def test_batch_loader_shapes_and_order():
    cfg = TinyConfig()
    ds = SyntheticDataset(cfg, "val", 10)
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2)
    batches = list(loader.epoch(0))
    assert [b["img"].shape[0] for b in batches] == [4, 4, 2]
    np.testing.assert_array_equal(batches[0]["index"], [0, 1, 2, 3])
    # determinism: same epoch -> same batches
    again = list(loader.epoch(0))
    np.testing.assert_allclose(batches[0]["pc"], again[0]["pc"])


def test_kitti_utils_roundtrip_and_crop():
    from cofii2p_tpu.data.kitti_utils import (
        cam_to_nwu,
        crop_pc_to_image,
        fps_approximate,
        nwu_to_cam,
        project_points_to_image,
    )

    rng = np.random.RandomState(0)
    pc = rng.randn(100, 3).astype(np.float32)
    np.testing.assert_allclose(nwu_to_cam(cam_to_nwu(pc)), pc)

    K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]], np.float32)
    cam = np.array([[0, 0, 5.0], [0, 0, -5.0], [50, 0, 5.0]], np.float32)
    kept, _, mask = crop_pc_to_image(cam, None, (32, 64), K)
    np.testing.assert_array_equal(mask, [True, False, False])

    img = np.zeros((32, 64, 3), np.float32)
    out = project_points_to_image(img, cam, K)
    assert out[16, 32, 0] > 0  # the center point was splatted

    sampled = fps_approximate(rng.randn(500, 3).astype(np.float32) * 10, 1.0, 16)
    assert sampled.shape == (16, 3)
