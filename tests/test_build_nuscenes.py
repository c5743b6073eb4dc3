"""nuScenes offline-builder logic, exercised against a faked devkit.

The real nuscenes-devkit is not installed here, so these tests install a
minimal in-memory fake (`nuscenes.nuscenes.NuScenes` + `LidarPointCloud`)
and drive the builder's actual logic: daytime-scene selection and sweep
cadence (reference build_datainfo.py:31-59), camera pairing within 10 m
(build_datainfo.py:81-135), ego-motion-compensated sweep accumulation
(build_dataset.py:124-185), and the >6000-points-in-view save filter
(build_dataset.py:277-302).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

from cofii2p_tpu.config import NuScenesConfig


# ---------------------------------------------------------------------------
# fake devkit
# ---------------------------------------------------------------------------

class FakeNuScenes:
    def __init__(self, tables, scenes, dataroot):
        self._tables = tables
        self.scene = scenes
        self.dataroot = dataroot

    def get(self, table, token):
        return self._tables[table][token]


class _FakeLidarPointCloud:
    def __init__(self, points):
        self.points = points

    @classmethod
    def from_file(cls, path):
        return cls(np.load(path))


def _install_fake_devkit():
    pkg = types.ModuleType("nuscenes")
    sub = types.ModuleType("nuscenes.nuscenes")
    sub.NuScenes = FakeNuScenes
    utils = types.ModuleType("nuscenes.utils")
    dc = types.ModuleType("nuscenes.utils.data_classes")
    dc.LidarPointCloud = _FakeLidarPointCloud
    pkg.nuscenes = sub
    pkg.utils = utils
    utils.data_classes = dc
    sys.modules["nuscenes"] = pkg
    sys.modules["nuscenes.nuscenes"] = sub
    sys.modules["nuscenes.utils"] = utils
    sys.modules["nuscenes.utils.data_classes"] = dc


_install_fake_devkit()

from cofii2p_tpu.data import build_nuscenes as bn  # noqa: E402


def _quat_identity():
    return [1.0, 0.0, 0.0, 0.0]


def _quat_yaw90():
    # 90 deg about +z, wxyz
    s = np.sqrt(0.5)
    return [s, 0.0, 0.0, s]


class WorldBuilder:
    """Minimal relational tables mimicking the devkit schema."""

    def __init__(self, tmp_path):
        self.t = {
            "scene": {},
            "sample": {},
            "sample_data": {},
            "ego_pose": {},
            "calibrated_sensor": {},
        }
        self.scenes = []
        self.root = str(tmp_path)
        self.t["calibrated_sensor"]["cal_I"] = {
            "rotation": _quat_identity(),
            "translation": [0.0, 0.0, 0.0],
        }

    def ego(self, token, translation, rotation=None):
        self.t["ego_pose"][token] = {
            "rotation": rotation or _quat_identity(),
            "translation": list(translation),
        }
        return token

    def cam_calib(self, token, K):
        self.t["calibrated_sensor"][token] = {
            "rotation": _quat_identity(),
            "translation": [0.0, 0.0, 0.0],
            "camera_intrinsic": np.asarray(K, np.float32).tolist(),
        }
        return token

    def chain(self, prefix, n, sample_token, ego_positions, filenames=None,
              calib="cal_I", rotations=None):
        toks = [f"{prefix}{i}" for i in range(n)]
        for i, tok in enumerate(toks):
            self.ego(
                f"ep_{tok}", ego_positions[i],
                None if rotations is None else rotations[i],
            )
            self.t["sample_data"][tok] = {
                "token": tok,
                "sample_token": sample_token,
                "ego_pose_token": f"ep_{tok}",
                "calibrated_sensor_token": calib,
                "filename": "" if filenames is None else filenames[i],
                "prev": toks[i - 1] if i > 0 else "",
                "next": toks[i + 1] if i < n - 1 else "",
            }
        return toks

    def scene(self, token, description, first_sample_token):
        sc = {
            "token": token,
            "description": description,
            "first_sample_token": first_sample_token,
        }
        self.t["scene"][token] = sc
        self.scenes.append(sc)
        return sc

    def sample(self, token, lidar_token, cam_token):
        self.t["sample"][token] = {
            "token": token,
            "data": {"LIDAR_TOP": lidar_token, "CAM_FRONT": cam_token},
        }
        return token

    def nusc(self):
        return FakeNuScenes(self.t, self.scenes, self.root)


def _save_cloud(root, name, pts_xyz, intensity=None):
    """pts_xyz (N, 3) -> devkit layout (4, N) .npy on disk."""
    n = len(pts_xyz)
    inten = np.full((1, n), 0.5, np.float32) if intensity is None else intensity
    arr = np.concatenate([np.asarray(pts_xyz, np.float32).T, inten], axis=0)
    path = os.path.join(root, name)
    np.save(path, arr)
    return name + ".npy" if not name.endswith(".npy") else name


def test_daytime_scene_selection_and_sweep_cadence(tmp_path):
    w = WorldBuilder(tmp_path)
    # day scene: 8 lidar sweeps
    lt = w.chain("Ld", 8, "smp_d", [[0.5 * i, 0, 0] for i in range(8)])
    ct = w.chain("Cd", 1, "smp_d", [[0, 0, 0]])
    w.sample("smp_d", lt[0], ct[0])
    w.scene("scene_day", "Sunny afternoon drive", "smp_d")
    # night by description
    ln = w.chain("Ln", 4, "smp_n", [[0, 0, 0]] * 4)
    cn = w.chain("Cn", 1, "smp_n", [[0, 0, 0]])
    w.sample("smp_n", ln[0], cn[0])
    w.scene("scene_night", "Night drive in rain", "smp_n")
    # night by token (innocuous description)
    token_night = next(iter(bn.NIGHT_SCENE_TOKENS))
    lx = w.chain("Lx", 4, "smp_x", [[0, 0, 0]] * 4)
    cx = w.chain("Cx", 1, "smp_x", [[0, 0, 0]])
    w.sample("smp_x", lx[0], cx[0])
    w.scene(token_night, "Clear evening", "smp_x")

    tokens = bn.daytime_lidar_tokens(w.nusc(), frame_skip=2)
    # only the day scene contributes; first sweep always, then every sweep
    # where the running count is a multiple of frame_skip
    expected = ["Ld0"] + [f"Ld{i}" for i in range(1, 8) if (i + 1) % 2 == 0]
    assert tokens == expected


def test_nearby_front_cameras_within_translation(tmp_path):
    w = WorldBuilder(tmp_path)
    lt = w.chain("L", 1, "smp", [[0, 0, 0]])
    # cameras marching +2 m in x per frame: 0,2,4,6,8,10,12
    ct = w.chain("C", 7, "smp", [[2.0 * i, 0, 0] for i in range(7)])
    w.sample("smp", lt[0], ct[0])
    w.scene("s", "day", "smp")

    cams = bn.nearby_front_cameras(w.nusc(), "L0", max_translation=10.0)
    # keyframe camera + next-walk frames strictly inside 10 m (2,4,6,8);
    # the walk breaks at the first frame at >= 10 m
    assert cams == ["C0", "C1", "C2", "C3", "C4"]


def test_accumulate_sweeps_ego_motion_compensation(tmp_path):
    w = WorldBuilder(tmp_path)
    center_pts = np.array([[5.0, 3.0, 1.0], [6.0, -4.0, 0.5]], np.float32)
    next_pts = np.array([[10.0, 0.0, 2.0]], np.float32)
    f0 = _save_cloud(w.root, "c0.npy", center_pts)
    f1 = _save_cloud(w.root, "c1.npy", next_pts)
    # center ego at origin/identity, next ego translated +2 m in x
    lt = w.chain("L", 2, "smp", [[0, 0, 0], [2.0, 0, 0]], filenames=[f0, f1])
    ct = w.chain("C", 1, "smp", [[0, 0, 0]])
    w.sample("smp", lt[0], ct[0])
    w.scene("s", "day", "smp")

    pc, inten = bn.accumulate_sweeps(w.nusc(), "L0", num=1, skip=1)
    assert pc.shape == (3, 3) and inten.shape == (1, 3)
    got = pc.T
    np.testing.assert_allclose(got[:2], center_pts, atol=1e-5)
    # neighbor points compensated into the center frame: p + (2, 0, 0)
    np.testing.assert_allclose(got[2], next_pts[0] + [2.0, 0, 0], atol=1e-5)


def test_accumulate_sweeps_rotation_compensation(tmp_path):
    w = WorldBuilder(tmp_path)
    center_pts = np.array([[5.0, 5.0, 0.0]], np.float32)
    next_pts = np.array([[4.0, 0.0, 1.0]], np.float32)
    f0 = _save_cloud(w.root, "r0.npy", center_pts)
    f1 = _save_cloud(w.root, "r1.npy", next_pts)
    # next ego frame rotated 90 deg about z: its +x is the world's +y
    lt = w.chain(
        "L", 2, "smp", [[0, 0, 0], [0, 0, 0]], filenames=[f0, f1],
        rotations=[_quat_identity(), _quat_yaw90()],
    )
    ct = w.chain("C", 1, "smp", [[0, 0, 0]])
    w.sample("smp", lt[0], ct[0])
    w.scene("s", "day", "smp")

    pc, _ = bn.accumulate_sweeps(w.nusc(), "L0", num=1, skip=1)
    got = pc.T
    np.testing.assert_allclose(got[0], center_pts[0], atol=1e-5)
    np.testing.assert_allclose(got[1], [0.0, 4.0, 1.0], atol=1e-5)


def test_load_sweep_drops_ego_car_returns(tmp_path):
    w = WorldBuilder(tmp_path)
    pts = np.array(
        [[0.1, 0.1, 0.0], [0.5, -2.0, 1.0], [5.0, 0.0, 0.0], [0.9, 0.0, 0.0]],
        np.float32,
    )  # first two inside the |x|<0.8, |y|<2.7 ego box
    fn = _save_cloud(w.root, "ego.npy", pts)
    lt = w.chain("L", 1, "smp", [[0, 0, 0]], filenames=[fn])
    ct = w.chain("C", 1, "smp", [[0, 0, 0]])
    w.sample("smp", lt[0], ct[0])
    w.scene("s", "day", "smp")

    kept, inten, _ = bn._load_sweep(w.nusc(), "L0")
    np.testing.assert_allclose(kept.T, pts[2:], atol=1e-6)


@pytest.mark.parametrize("in_view", [True, False])
def test_build_frame_in_view_filter(tmp_path, in_view):
    from PIL import Image

    w = WorldBuilder(tmp_path)
    rng = np.random.RandomState(0)
    n = 60000
    z = rng.uniform(5.0, 50.0, n)
    x = rng.uniform(-0.85, 0.85, n) * z
    y = rng.uniform(-0.15, 0.35, n) * z
    pts = np.stack([x, y, z], axis=-1).astype(np.float32)
    if not in_view:
        pts[:, 2] *= -1.0  # behind the camera
    fn = _save_cloud(w.root, "big.npy", pts)

    K = [[400.0, 0.0, 400.0], [0.0, 400.0, 225.0], [0.0, 0.0, 1.0]]
    w.cam_calib("cal_cam", K)
    img_path = os.path.join(w.root, "img.png")
    Image.fromarray(np.zeros((450, 800, 3), np.uint8)).save(img_path)

    lt = w.chain("L", 1, "smp", [[0, 0, 0]], filenames=[fn])
    ct = w.chain(
        "C", 1, "smp", [[0, 0, 0]], filenames=["img.png"], calib="cal_cam"
    )
    w.sample("smp", lt[0], ct[0])
    w.scene("s", "day", "smp")

    out_base = tmp_path / "out"
    out_dirs = {k: str(out_base / k) for k in ("img", "pc", "ext", "int")}
    for d in out_dirs.values():
        os.makedirs(d)

    cfg = NuScenesConfig().replace(
        accumulation_frame_num=0, accumulation_frame_skip=1
    )
    ok = bn.build_frame(w.nusc(), cfg, "L0", ["C0"], 0, out_dirs)
    assert ok == in_view
    assert os.path.exists(os.path.join(out_dirs["pc"], "000000.npy")) == in_view
    if in_view:
        saved = np.load(os.path.join(out_dirs["pc"], "000000.npy"))
        assert saved.shape[0] == 4 and saved.shape[1] >= 45000
        img = np.load(os.path.join(out_dirs["img"], "000000.npy"))
        # 450 rows - 100 crop = 350, x0.4 scale -> 140 x 320
        assert img.shape[:2] == (140, 320)
        Ksaved = np.load(os.path.join(out_dirs["int"], "000000.npy"))
        # fx scaled by img_scale; cy shifted by the crop then scaled
        np.testing.assert_allclose(Ksaved[0, 0], 400 * 0.4, rtol=1e-6)
        np.testing.assert_allclose(Ksaved[1, 2], (225 - 100) * 0.4, rtol=1e-6)


def test_config_accumulation_fields_match_reference():
    """accumulation_frame_num/skip exist with the reference's values
    (reference data/options.py:12-13, 68-69)."""
    from cofii2p_tpu.config import KITTIConfig

    assert KITTIConfig().accumulation_frame_num == 3
    assert KITTIConfig().accumulation_frame_skip == 6
    assert NuScenesConfig().accumulation_frame_num == 3
    assert NuScenesConfig().accumulation_frame_skip == 4
