"""KITTI loader end-to-end on a fabricated on-disk mini dataset."""

import os

import numpy as np
import pytest

from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.data.kitti import KittiDataset


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.RandomState(0)
    K = np.array([[350.0, 0, 330], [0, 350.0, 100], [0, 0, 1]], np.float32)

    for seq in list(range(9)) + [9, 10]:
        calib_dir = root / "calib" / ("%02d" % seq)
        calib_dir.mkdir(parents=True)
        with open(calib_dir / "calib.txt", "w") as f:
            p_line = "%f 0 %f 10.0 0 %f %f 0.5 0 0 1 0.1" % (
                K[0, 0], K[0, 2], K[1, 1], K[1, 2],
            )
            f.write("P0: " + p_line + "\n")
            f.write("P2: " + p_line + "\n")
            f.write("P3: " + p_line + "\n")
            # velodyne->cam0: axis permutation typical of KITTI
            f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 -0.1\n")

        if seq > 1 and seq != 9:
            # only seq 0,1,9 get frames; others need the folder listing only
            frames = 0
        else:
            frames = 2
        seq_dir = root / "sequences" / ("%02d" % seq)
        for sub in ("img_P2", "img_P3", "pc_npy_with_normal", "K_P2", "K_P3"):
            (seq_dir / sub).mkdir(parents=True)
        for i in range(frames):
            img = rng.randint(0, 255, (400, 1300, 3), np.uint8)
            np.save(seq_dir / "img_P2" / ("%06d.npy" % i), img)
            np.save(seq_dir / "img_P3" / ("%06d.npy" % i), img)
            n = 4000
            pc = np.concatenate(
                [
                    rng.uniform(2, 60, (1, n)),  # forward (velodyne x)
                    rng.uniform(-20, 20, (1, n)),
                    rng.uniform(-2, 1, (1, n)),
                    rng.rand(1, n),  # intensity
                    rng.randn(3, n),  # normals
                ]
            ).astype(np.float32)
            np.save(seq_dir / "pc_npy_with_normal" / ("%06d.npy" % i), pc)
            np.save(seq_dir / "K_P2" / ("%06d.npy" % i), K)
            np.save(seq_dir / "K_P3" / ("%06d.npy" % i), K)
    return str(root)


@pytest.fixture(scope="module")
def cfg(kitti_root):
    # image sized so resize(0.5) leaves room to crop 32x64
    return TinyConfig().replace(data_path=kitti_root, num_pc=1024)


def test_kitti_dataset_contract(cfg):
    ds = KittiDataset(cfg, "train")
    assert len(ds) == 8  # 2 seqs x 2 frames x 2 cams
    sample = ds[0]
    assert sample["img"].shape == (cfg.img_H, cfg.img_W, 3)
    assert sample["img"].dtype == np.float32
    assert 0.0 <= sample["img"].min() and sample["img"].max() <= 1.0
    assert sample["pc"].shape == (cfg.num_pc, 3)
    assert sample["attrs"].shape == (cfg.num_pc, 4)  # intensity + normals
    assert sample["P"].shape == (4, 4)
    np.testing.assert_allclose(
        sample["P"][:3, :3] @ sample["P"][:3, :3].T, np.eye(3), atol=1e-5
    )
    assert sample["K"].shape == (3, 3)

    val = KittiDataset(cfg, "val")
    assert len(val) == 4  # seq 9 only (seq 10 empty)


def test_kitti_deterministic_per_index(cfg):
    ds = KittiDataset(cfg, "train")
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["pc"], b["pc"])
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["P"], b["P"])
    c = ds[4]
    assert not np.allclose(a["P"], c["P"])  # different index, different stream


def test_kitti_points_in_camera_frame(cfg):
    """The cloud must be forward-of-camera dominated after Tr/P transforms."""
    ds = KittiDataset(cfg, "val")
    sample = ds[0]
    # undo the random perturbation: P maps cam-frame -> perturbed
    pc = sample["pc"]
    # camera frame: +z forward; most velodyne-forward points have z > 0
    assert (pc[:, 2] > 0).mean() > 0.7
