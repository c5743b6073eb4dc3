"""KITTI Odometry host-side dataset.

Capability match for the reference loader
(/root/reference/data/kitti.py:90-393) with the heavy, shape-static work
(perturbation, pyramid, GT correspondences) moved on device
(cofii2p_tpu.data.device_pipeline).  The host does only: file IO, cam-frame
transform, voxel downsample + fixed resample, image resize/crop/jitter, and
intrinsics bookkeeping.

Frame layout on disk is the CorrI2P/CoFiI2P recipe the reference consumes:
``sequences/<seq>/img_P2|img_P3/<frame>.npy``,
``sequences/<seq>/pc_npy_with_normal/<frame>.npy`` (7, N): xyz+intensity+
normals, ``sequences/<seq>/K_P2|K_P3/<frame>.npy`` and ``calib/<seq>/
calib.txt``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from cofii2p_tpu.config import Config
from cofii2p_tpu.data.augment import (
    color_jitter,
    crop_and_scale_intrinsics,
    random_se3,
    scale_intrinsics,
)
from cofii2p_tpu.data.calib import KittiCalib
from cofii2p_tpu.data.voxel import resample_fixed
from cofii2p_tpu.native import voxel_downsample  # native with NumPy fallback


class KittiDataset:
    """Yields host-side sample dicts: img, pc (camera frame, fixed size),
    attrs (intensity+normals), P (random perturbation), K (cropped half-res
    intrinsics)."""

    has_normals = True

    def __init__(self, cfg: Config, mode: str):
        if mode not in ("train", "val"):
            raise ValueError(f"invalid mode {mode!r}")
        self.cfg = cfg
        self.mode = mode
        self.root = cfg.data_path
        self.calib = KittiCalib(self.root)
        self.frames = self._list_frames(mode)

    def _list_frames(self, mode: str):
        seqs = list(range(9)) if mode == "train" else [9, 10]
        frames = []
        for seq in seqs:
            seq_dir = os.path.join(self.root, "sequences", "%02d" % seq)
            n = len(os.listdir(os.path.join(seq_dir, "img_P2")))
            for i in range(n):
                frames.append((seq, i, "P2"))
                frames.append((seq, i, "P3"))
        return frames

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        cfg = self.cfg
        # deterministic per-index stream (reference kitti.py:261-264)
        (seed,) = np.random.SeedSequence([index]).generate_state(1)
        rng = np.random.RandomState(seed)

        seq, i, cam = self.frames[index]
        seq_dir = os.path.join(self.root, "sequences", "%02d" % seq)
        img = np.load(os.path.join(seq_dir, f"img_{cam}", "%06d.npy" % i))
        data = np.load(
            os.path.join(seq_dir, "pc_npy_with_normal", "%06d.npy" % i)
        )  # (7, N)
        K = np.load(os.path.join(seq_dir, f"K_{cam}", "%06d.npy" % i)).astype(
            np.float32
        )
        pc = data[0:3].T.astype(np.float32)
        intensity = data[3:4].T.astype(np.float32)
        sn = data[4:7].T.astype(np.float32)

        # velodyne -> chosen camera frame (reference kitti.py:274-278)
        P_Tr = self.calib.get(seq, cam) @ self.calib.get(seq, "Tr")
        pc = pc @ P_Tr[:3, :3].T + P_Tr[:3, 3]
        sn = sn @ P_Tr[:3, :3].T

        pc, attrs = voxel_downsample(pc, np.concatenate([intensity, sn], -1), 0.1)
        pc, attrs = resample_fixed(pc, attrs, cfg.num_pc, rng)

        P = random_se3(
            rng,
            dict(
                tx=cfg.P_tx_amplitude,
                ty=cfg.P_ty_amplitude,
                tz=cfg.P_tz_amplitude,
                rx=cfg.P_Rx_amplitude,
                ry=cfg.P_Ry_amplitude,
                rz=cfg.P_Rz_amplitude,
            ),
        )

        img, K = process_image(img, K, cfg, self.mode, rng)
        return {"img": img, "pc": pc, "attrs": attrs, "P": P, "K": K, "index": index}


def process_image(img: np.ndarray, K: np.ndarray, cfg: Config, mode: str, rng):
    """Resize x0.5, crop to (img_H, img_W), adjust K, jitter when training
    (reference kitti.py:306-330)."""
    import cv2

    img = cv2.resize(
        img,
        (int(round(img.shape[1] * 0.5)), int(round(img.shape[0] * 0.5))),
        interpolation=cv2.INTER_LINEAR,
    )
    K = scale_intrinsics(K, 0.5)
    if mode == "train":
        dx = rng.randint(0, img.shape[1] - cfg.img_W + 1)
        dy = rng.randint(0, img.shape[0] - cfg.img_H + 1)
    else:
        dx = (img.shape[1] - cfg.img_W) // 2
        dy = (img.shape[0] - cfg.img_H) // 2
    img = img[dy : dy + cfg.img_H, dx : dx + cfg.img_W]
    K = crop_and_scale_intrinsics(K, dx, dy)
    img = img.astype(np.float32) / 255.0
    if mode == "train":
        img = color_jitter(img, rng)
    return img, K.astype(np.float32)
