"""nuScenes-contract variants at tiny scale: intensity+xyz features
(has_normals=False, reference nuscenes.py:213) and a non-KITTI coarse
grid aspect (the reference hardcodes its border mask to KITTI's 20x64,
network.py:184; ours is parameterized by H/8 x W/8)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.data.loader import _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu import train_lib


def _host_batch(cfg, n=2, has_normals=True):
    ds = SyntheticDataset(cfg, "train", length=n)
    host = {k: v for k, v in _collate([ds[i] for i in range(n)]).items()
            if k != "index"}
    if not has_normals:
        # nuScenes carries intensity only; feats become intensity (+) xyz
        host["attrs"] = host["attrs"][..., :1]
    return host


def test_no_normals_feature_contract():
    cfg = TinyConfig()
    host = _host_batch(cfg, has_normals=False)
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(0), host["img"], cfg, has_normals=False,
    )
    # input_dim stays 4: intensity + xyz (reference nuscenes.py:213)
    assert batch["feats"].shape[-1] == 4
    assert np.isfinite(np.asarray(batch["feats"])).all()


def test_train_step_without_normals():
    cfg = TinyConfig()
    host = _host_batch(cfg, has_normals=False)
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(
        cfg, model, tx, jax.random.PRNGKey(0), host, has_normals=False
    )
    step = train_lib.make_train_step(cfg, model, tx, has_normals=False)
    _, metrics = step(state, host, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_nonkitti_coarse_grid_forward():
    # nuScenes-like aspect: W half of KITTI's -> coarse grid H/8 x W/8
    # differs from the KITTI-hardcoded 20x64 of the reference
    cfg = dataclasses.replace(TinyConfig(), img_W=32)
    host = _host_batch(cfg)
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(0), host["img"], cfg, has_normals=True,
    )
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, mode="test", train=False,
    )
    ch, cw = cfg.img_H // 8, cfg.img_W // 8
    assert out["coarse_img_score"].shape[-2:] == (ch, cw)
    assert np.isfinite(
        np.asarray(out["fine_pc_feature"], dtype=np.float32)
    ).all()
