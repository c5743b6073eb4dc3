"""Model variant options: linear attention and resnet18 backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.models.transformer import (
    LocalFeatureTransformer,
    linear_attention,
)


def test_linear_attention_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, L, S, H, D = 1, 5, 7, 2, 4
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    got = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    # oracle of reference linear_attention.py:31-47
    def elu1(x):
        return np.where(x > 0, x + 1.0, np.exp(x))

    Q, K = elu1(q), elu1(k)
    vl = v / S
    KV = np.einsum("nshd,nshv->nhdv", K, vl)
    Z = 1.0 / (np.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + 1e-6)
    want = np.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * S
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_transformer_runs():
    mod = LocalFeatureTransformer(
        d_model=16, nhead=4, layer_names=("self", "cross"), attention="linear"
    )
    rng = np.random.RandomState(1)
    f0 = jnp.asarray(rng.randn(1, 6, 16).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 9, 16).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), f0, f1)
    o0, o1 = mod.apply(v, f0, f1)
    assert o0.shape == f0.shape and o1.shape == f1.shape
    assert np.isfinite(np.asarray(o0)).all()


def test_resnet18_backbone():
    from cofii2p_tpu.config import TinyConfig
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.data.device_pipeline import prepare_samples

    cfg = TinyConfig().replace(img_backbone="resnet18", attention="linear")
    ds = SyntheticDataset(cfg, "val", 1)
    host = _collate([ds[0]])
    host.pop("index")
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(0), host["img"], cfg,
    )
    model = CoFiI2P(cfg)
    v = jax.jit(model.init, static_argnames=("mode", "train"))(
        jax.random.PRNGKey(1), batch, mode="train", train=True
    )
    out = jax.jit(model.apply, static_argnames=("mode", "train"))(
        v, batch, mode="val", train=False
    )
    assert out["pc_feature_norm"].shape == (1, cfg.num_superpoints, 128)


def test_pallas_attention_matches_xla_interpret():
    """The fused attention kernel equals the einsum path (interpret mode on
    CPU; the real TPU path is exercised by the perf drives)."""
    from unittest import mock
    import jax.experimental.pallas as pl
    from cofii2p_tpu.ops import attention_kernel as ak
    from cofii2p_tpu.models.transformer import full_attention

    rng = np.random.RandomState(2)
    B, L, S, H, D = 1, 256, 128, 2, 32
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(ak.pl, "pallas_call", interp):
        got = ak.fused_attention.__wrapped__(q, k, v, q_tile=128)
    want = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
