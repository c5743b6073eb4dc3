"""Synthetic I2P frames with consistent projection geometry.

Used by tests, the training smoke path, and bench.py when no KITTI/nuScenes
data is mounted.  Scenes are geometrically consistent: a cloud sampled
partly inside the camera frustum, an image whose intensity is a smooth
function of the projected points, ground-truth pose = the random
perturbation — so losses are meaningful and eval produces real RRE/RTE
against the generating pose.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from cofii2p_tpu.config import Config
from cofii2p_tpu.data.augment import random_se3


class SyntheticDataset:
    has_normals = True

    def __init__(self, cfg: Config, mode: str = "train", length: int = 64):
        self.cfg = cfg
        self.mode = mode
        self.length = length
        # frames are a pure function of the index (augmentation is applied
        # on device with a per-step rng), so caching is semantics-free —
        # without it, host-side regeneration dominates the training loop
        # (~2 MB/frame; bounded by the dataset length)
        self._cache: Dict[int, Dict[str, Any]] = {}

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict[str, Any]:
        cached = self._cache.get(index)
        if cached is None:
            cached = self._generate(index)
            self._cache[index] = cached
        # shallow copy: a consumer mutating the returned dict (or replacing
        # entries) must not poison later epochs; the arrays themselves are
        # treated as read-only downstream
        return dict(cached)

    def _generate(self, index: int) -> Dict[str, Any]:
        cfg = self.cfg
        (seed,) = np.random.SeedSequence([index, 777]).generate_state(1)
        rng = np.random.RandomState(seed)
        h, w = cfg.img_H, cfg.img_W
        fx = w * 1.2
        K = np.array(
            [[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32
        )

        n = cfg.num_pc
        n_in = n // 2
        depth = rng.uniform(4.0, 50.0, n_in)
        u = rng.uniform(2, w - 2, n_in)
        v = rng.uniform(2, h - 2, n_in)
        cam_in = np.stack(
            [(u - K[0, 2]) / fx * depth, (v - K[1, 2]) / fx * depth, depth], -1
        )
        cam_out = np.stack(
            [
                rng.uniform(-60, 60, n - n_in),
                rng.uniform(-5, 15, n - n_in),
                rng.uniform(-40, -4, n - n_in),
            ],
            -1,
        )
        pc = np.concatenate([cam_in, cam_out]).astype(np.float32)
        perm = rng.permutation(n)
        pc = pc[perm]

        intensity = rng.rand(n, 1).astype(np.float32)
        normals = rng.randn(n, 3).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        attrs = np.concatenate([intensity, normals], -1)

        # image: smooth gradients + splat of projected in-frustum points
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack(
            [xx / w, yy / h, 0.5 + 0.5 * np.sin(xx / 17.0) * np.cos(yy / 9.0)], -1
        )
        uvz = pc @ K.T
        zs = uvz[:, 2]
        front = zs > 1e-3
        uu = (uvz[front, 0] / zs[front]).astype(np.int32)
        vv = (uvz[front, 1] / zs[front]).astype(np.int32)
        ok = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        img[vv[ok], uu[ok], 2] = 1.0
        img = img.astype(np.float32)

        P = random_se3(
            self._amp_rng(rng),
            dict(
                tx=cfg.P_tx_amplitude,
                ty=cfg.P_ty_amplitude,
                tz=cfg.P_tz_amplitude,
                rx=cfg.P_Rx_amplitude,
                ry=cfg.P_Ry_amplitude,
                rz=cfg.P_Rz_amplitude,
            ),
        )
        return {"img": img, "pc": pc, "attrs": attrs, "P": P, "K": K, "index": index}

    @staticmethod
    def _amp_rng(rng):
        return rng
