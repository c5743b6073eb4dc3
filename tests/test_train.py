"""Train-step integration tests (tiny config, virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofii2p_tpu import train_lib
from cofii2p_tpu.config import TinyConfig
from cofii2p_tpu.data.loader import _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.parallel.mesh import make_mesh, shard_host_batch


@pytest.fixture(scope="module")
def setup():
    cfg = TinyConfig()
    ds = SyntheticDataset(cfg, "train", 8)
    host = _collate([ds[i] for i in range(2)])
    host.pop("index")
    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    state0 = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    # the train step donates its input state; hand each test a fresh copy
    make_state = lambda: jax.tree.map(jnp.copy, state0)
    return cfg, model, tx, make_state, host


@pytest.mark.slow
def test_train_step_finite_and_updates(setup):
    cfg, model, tx, make_state, host = setup
    state = make_state()
    before = jax.device_get(state.params)
    step = train_lib.make_train_step(cfg, model, tx)
    new_state, metrics = step(state, host, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
    assert int(new_state.step) == 1
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), before, jax.device_get(new_state.params)
    )
    assert max(jax.tree.leaves(delta)) > 0


@pytest.mark.slow
def test_loss_decreases_over_steps(setup):
    cfg, model, tx, make_state, host = setup
    step = train_lib.make_train_step(cfg, model, tx)
    losses = []
    s = make_state()
    for i in range(8):
        s, metrics = step(s, host, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    # same batch, fresh rng stream folded on step: loss should drop overall
    assert losses[-1] < losses[0], losses


def test_eval_step_recalls(setup):
    cfg, model, tx, make_state, host = setup
    ev = train_lib.make_eval_step(cfg, model)
    out = jax.device_get(ev(make_state(), host, jax.random.PRNGKey(3)))
    for k in ("top1_recall", "top5_recall", "fine_recall", "val_loss"):
        assert np.isfinite(out[k])
    assert 0.0 <= out["top1_recall"] <= out["top5_recall"] <= 1.0
    assert 0.0 <= out["fine_recall"] <= 1.0


@pytest.mark.slow
def test_train_step_sharded_over_mesh(setup):
    cfg, model, tx, make_state, host = setup
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    ds = SyntheticDataset(cfg, "train", 8)
    host8 = _collate([ds[i] for i in range(8)])
    host8.pop("index")
    host8 = shard_host_batch(host8, mesh)
    state8 = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host8)
    step = train_lib.make_train_step(cfg, model, tx)
    new_state, metrics = step(state8, host8, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_lr_schedule():
    cfg = TinyConfig()
    assert train_lib.lr_for_epoch(cfg, 0) == cfg.lr
    assert train_lib.lr_for_epoch(cfg, 5) == cfg.lr * 0.25
    assert train_lib.lr_for_epoch(cfg, 24) == cfg.min_lr


def test_resume_continues_lr_schedule():
    """A restored run must continue the LR-decay schedule from its step, not
    restart at lr=cfg.lr / epoch 0 (reference --ft_from restarts,
    /root/reference/train.py:151-152, 325-330)."""
    cfg = TinyConfig()  # epoch=25, decay x0.25 every 5 epochs
    steps_per_epoch = 64
    # restored mid-run at step 7*64 -> epoch 7 -> one decay applied
    ep = train_lib.resume_epoch(cfg, 7 * steps_per_epoch, steps_per_epoch)
    assert ep == 7
    assert train_lib.lr_for_epoch(cfg, ep) == cfg.lr * 0.25
    # fresh run
    assert train_lib.resume_epoch(cfg, 0, steps_per_epoch) == 0
    # restored past the end: no further epochs run
    assert train_lib.resume_epoch(cfg, 10_000 * steps_per_epoch, steps_per_epoch) == cfg.epoch


@pytest.mark.slow
def test_dp_sharded_step_matches_single_device(setup):
    """The 8-way sharded train step must agree with the unsharded step on the
    same batch: identical loss terms and gradient norm (XLA's inserted
    all-reduce changes only summation order).  Parameter-level equality is
    NOT asserted: Adam's first step is ~lr*sign(grad), which amplifies
    reduction-order noise on near-zero gradients into +-lr sign flips."""
    cfg, model, tx, make_state, _ = setup
    ds = SyntheticDataset(cfg, "train", 8)
    host8 = _collate([ds[i] for i in range(8)])
    host8.pop("index")

    step = train_lib.make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(9)

    s_single = make_state()
    out_single, m_single = step(s_single, jax.tree.map(jnp.asarray, host8), rng)

    mesh = make_mesh()
    s_shard = make_state()
    out_shard, m_shard = step(s_shard, shard_host_batch(host8, mesh), rng)

    for key in ("loss", "loss_desc", "loss_coarse", "loss_fine", "grad_norm"):
        np.testing.assert_allclose(
            float(m_single[key]), float(m_shard[key]), rtol=1e-4, err_msg=key
        )
    # updated params stay replicated and finite
    leaf = jax.tree.leaves(out_shard.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(out_shard.params)
    )


def test_with_fast_windows():
    """`train --fast` applies the gated w256 plan; explicit plans and
    non-banded impls are left alone (config.with_fast_windows)."""
    from cofii2p_tpu.config import (
        FAST_DYNAMIC_PLAN, FAST_DYNAMIC_PLAN_SELF, KITTIConfig,
        with_fast_windows,
    )

    fast = with_fast_windows(KITTIConfig())
    assert fast.kpconv_dynamic_plan == FAST_DYNAMIC_PLAN
    assert fast.kpconv_dynamic_plan_self == FAST_DYNAMIC_PLAN_SELF
    assert fast.kpconv_dynamic_center == "best"

    # explicit plan wins — either pair kind (ADVICE r4: a CLI
    # kpconv_dynamic_plan_self= override composed with --fast must not be
    # clobbered)
    explicit = KITTIConfig(kpconv_dynamic_plan=(0, 512, 512, 512, 0))
    assert with_fast_windows(explicit) is explicit
    explicit_self = KITTIConfig(kpconv_dynamic_plan_self=(0, 0, 512, 512, 0))
    assert with_fast_windows(explicit_self) is explicit_self

    # an explicit center override survives --fast
    centered = with_fast_windows(KITTIConfig(kpconv_dynamic_center="centroid"))
    assert centered.kpconv_dynamic_center == "centroid"
    assert centered.kpconv_dynamic_plan == FAST_DYNAMIC_PLAN

    # dynamic starts are radius-banded only; parity impls are untouched
    knn = KITTIConfig(kpconv_impl="banded_knn")
    assert with_fast_windows(knn) is knn


def test_with_fast_windows_tiny_fits():
    """At tiny scale the KITTI windows exceed the level sizes; entries that
    cannot win fall back to the static bands instead of producing invalid
    clipped starts."""
    from cofii2p_tpu.config import TinyConfig, with_fast_windows

    cfg = with_fast_windows(TinyConfig())
    sizes = cfg.pyramid_sizes
    for plan in (cfg.kpconv_dynamic_plan, cfg.kpconv_dynamic_plan_self):
        assert plan is not None
        for lvl, w in enumerate(plan):
            assert w == 0 or w < sizes[lvl], (lvl, w, sizes)
