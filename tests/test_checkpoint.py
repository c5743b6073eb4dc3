"""Checkpoint tests: orbax save/restore round-trip and the torch .t7
import/export mapping round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofii2p_tpu import train_lib
from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.data.loader import _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.utils.checkpoint import (
    export_t7,
    import_t7,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def state_and_cfg():
    cfg = TinyConfig()
    ds = SyntheticDataset(cfg, "val", 1)
    host = _collate([ds[0]])
    host.pop("index")
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    return cfg, state


def test_orbax_roundtrip(tmp_path, state_and_cfg):
    cfg, state = state_and_cfg
    path = save_checkpoint(str(tmp_path), 7, state)
    assert latest_checkpoint(str(tmp_path)) == os.path.join(str(tmp_path), "step_00000007")
    template = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored = restore_checkpoint(path, template)
    orig = jax.device_get(state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        orig,
        restored,
    )


def test_t7_export_import_roundtrip(tmp_path, state_and_cfg):
    """export_t7 writes a reference-layout state_dict; import_t7 maps it back
    bit-exactly onto a zeroed tree — covering every mapped parameter."""
    cfg, state = state_and_cfg
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    path = str(tmp_path / "weights.t7")
    sd = export_t7(params, stats, path)
    assert len(sd) > 100

    zero_p = jax.tree.map(np.zeros_like, params)
    zero_s = jax.tree.map(np.zeros_like, stats)
    got_p, got_s = import_t7(path, zero_p, zero_s)

    flat_orig, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got_p)[0])
    n_exact = 0
    for keypath, val in flat_orig:
        np.testing.assert_array_equal(
            np.asarray(flat_got[tuple(keypath)]), np.asarray(val),
            err_msg=str(keypath),
        )
        n_exact += 1
    assert n_exact == len(flat_orig)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        stats,
        got_s,
    )
    # the importer consumed every exported tensor
    from cofii2p_tpu.utils import checkpoint as ckpt_mod

    assert not ckpt_mod._last_unused
