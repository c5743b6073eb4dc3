"""Model unit tests: KPConv math vs direct oracle, norm semantics vs torch,
transformer/network shape + jit contracts."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofii2p_tpu.config import get_config
from cofii2p_tpu.models.kernel_points import kernel_dispositions, load_kernel_points
from cofii2p_tpu.models.kpconv import KPConv, KPConvFPN, neighbor_maxpool, nearest_upsample
from cofii2p_tpu.models.layers import PointGroupNorm, instance_norm
from cofii2p_tpu.models.position_encoding import position_embedding_sine
from cofii2p_tpu.models.resnet import ResNetEncoder
from cofii2p_tpu.models.transformer import LocalFeatureTransformer


def test_kernel_dispositions_deterministic_and_well_spread():
    kp = kernel_dispositions(15, 3)
    kp2 = kernel_dispositions(15, 3)
    np.testing.assert_array_equal(kp, kp2)
    assert kp.shape == (15, 3)
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-7)  # pinned center
    radii = np.linalg.norm(kp[1:], axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.66, rtol=1e-3)
    # points mutually separated
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    d[np.arange(15), np.arange(15)] = 1e9
    assert d.min() > 0.3

    scaled = load_kernel_points(2.0, 15, 3)
    np.testing.assert_allclose(scaled, kp * 2.0, rtol=1e-6)


def np_kpconv(s_feats, q_points, s_points, nbr_idx, kp, weights, sigma):
    """Direct oracle of the KPConv formula (reference kpconv.py:79-116),
    with explicit shadow handling."""
    n = s_feats.shape[0]
    sp = np.concatenate([s_points, np.full((1, 3), 1e6, np.float32)])
    sf = np.concatenate([s_feats, np.zeros((1, s_feats.shape[1]), np.float32)])
    nbrs = sp[nbr_idx]  # (M, H, 3)
    off = nbrs - q_points[:, None]
    diff = off[:, :, None, :] - kp[None, None]  # (M, H, K, 3)
    d = np.sqrt((diff**2).sum(-1))
    w = np.maximum(1 - d / sigma, 0)  # (M, H, K)
    nf = sf[nbr_idx]  # (M, H, C)
    weighted = np.einsum("mhk,mhc->mkc", w, nf)
    out = np.einsum("mkc,kcd->md", weighted, weights)
    cnt = np.maximum((nf.sum(-1) > 0).sum(-1), 1)
    return out / cnt[:, None]


def test_kpconv_matches_oracle_including_shadows():
    rng = np.random.RandomState(0)
    N, M, H, Cin, Cout, K = 40, 20, 8, 6, 10, 15
    s_feats = rng.randn(N, Cin).astype(np.float32)
    s_points = rng.randn(N, 3).astype(np.float32)
    q_points = rng.randn(M, 3).astype(np.float32)
    nbr = rng.randint(0, N, (M, H))
    nbr[0, 3:] = N  # shadow neighbors
    nbr[5, :] = N  # all shadow

    mod = KPConv(Cout, K, radius=1.0, sigma=1.0, use_bias=False)
    vars_ = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(s_feats)[None],
        jnp.asarray(q_points)[None],
        jnp.asarray(s_points)[None],
        jnp.asarray(nbr)[None],
    )
    got = np.asarray(
        mod.apply(
            vars_,
            jnp.asarray(s_feats)[None],
            jnp.asarray(q_points)[None],
            jnp.asarray(s_points)[None],
            jnp.asarray(nbr)[None],
        )
    )[0]
    kp = kernel_dispositions(K, 3) * 1.0
    weights = np.asarray(vars_["params"]["weights"])
    want = np_kpconv(s_feats, q_points, s_points, nbr, kp, weights, 1.0)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_neighbor_maxpool_and_upsample():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))[None]
    idx = jnp.asarray(np.array([[0, 1], [3, 4]]))[None]  # 4 == shadow
    mp = np.asarray(neighbor_maxpool(feats, idx))[0]
    np.testing.assert_allclose(mp[0], [3, 4, 5])
    np.testing.assert_allclose(mp[1], [9, 10, 11])  # max(row3, zeros)
    up = np.asarray(nearest_upsample(feats, idx))[0]
    np.testing.assert_allclose(up[0], [0, 1, 2])
    np.testing.assert_allclose(up[1], [9, 10, 11])


def test_instance_norm_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)  # NHWC
    got = np.asarray(instance_norm(jnp.asarray(x), (1, 2)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.instance_norm(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_point_group_norm_matches_torch_whole_cloud():
    import torch

    rng = np.random.RandomState(2)
    N, C, G = 11, 8, 4
    x = rng.randn(N, C).astype(np.float32)
    mod = PointGroupNorm(G)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))
    # reference semantics: GroupNorm on (1, C, N) (modules.py:43-49)
    xt = torch.from_numpy(x).T.unsqueeze(0)
    want = torch.nn.functional.group_norm(
        xt, G, torch.ones(C), torch.zeros(C)
    )[0].T.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_position_embedding_matches_reference_formula():
    import torch

    rng = np.random.RandomState(3)
    xyz = rng.randn(6, 3).astype(np.float32)
    got = np.asarray(position_embedding_sine(jnp.asarray(xyz), 128))
    # torch oracle of PositionEmbeddingCoordsSine (position_encoding.py:29-50)
    n_dim, d_model = 3, 128
    num = d_model // n_dim // 2 * 2
    dim_t = torch.arange(num, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="trunc") / num)
    x = torch.from_numpy(xyz) * (2 * np.pi)
    pd = x.unsqueeze(-1) / dim_t
    emb = torch.stack([pd[..., 0::2].sin(), pd[..., 1::2].cos()], dim=-1).reshape(6, -1)
    want = torch.nn.functional.pad(emb, (0, d_model - num * n_dim)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transformer_layer_matches_numpy_oracle():
    """Full numpy oracle of one LoFTR encoder layer, including the reference
    quirk that q is L2-normalized along the *sequence* axis
    (transformer.py:53 uses F.normalize's default dim=1)."""
    d_model, nhead, L, S = 16, 4, 5, 7
    mod = LocalFeatureTransformer(d_model=d_model, nhead=nhead, layer_names=("cross",))
    rng = np.random.RandomState(4)
    f0 = rng.randn(1, L, d_model).astype(np.float32)
    f1 = rng.randn(1, S, d_model).astype(np.float32)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(f0), jnp.asarray(f1))
    got0, _ = mod.apply(vars_, jnp.asarray(f0), jnp.asarray(f1))
    got0 = np.asarray(got0)[0]

    p = jax.tree.map(np.asarray, vars_["params"]["layer0"])
    d = d_model // nhead

    def layer(x, src):
        q = (x @ p["q_proj"]["kernel"]).reshape(-1, nhead, d)
        k = (src @ p["k_proj"]["kernel"]).reshape(-1, nhead, d)
        v = (src @ p["v_proj"]["kernel"]).reshape(-1, nhead, d)
        q = q / np.maximum(np.linalg.norm(q, axis=0, keepdims=True), 1e-12)  # seq axis!
        logits = np.einsum("lhd,shd->lsh", q, k) / np.sqrt(d)
        a = np.exp(logits - logits.max(1, keepdims=True))
        a = a / a.sum(1, keepdims=True)
        msg = np.einsum("lsh,shd->lhd", a, v).reshape(-1, d_model)
        msg = msg @ p["merge"]["kernel"]

        def ln(y, prm):
            mu = y.mean(-1, keepdims=True)
            var = y.var(-1, keepdims=True)
            return (y - mu) / np.sqrt(var + 1e-5) * prm["scale"] + prm["bias"]

        msg = ln(msg, p["norm1"])
        y = np.concatenate([x, msg], -1) @ p["mlp1"]["kernel"]
        y = np.maximum(y, 0) @ p["mlp2"]["kernel"]
        return x + ln(y, p["norm2"])

    want0 = layer(f0[0], f1[0])
    np.testing.assert_allclose(got0, want0, rtol=1e-3, atol=1e-4)


def test_resnet_encoder_pyramid_shapes():
    mod = ResNetEncoder()
    x = jnp.zeros((1, 32, 64, 3))
    vars_ = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(vars_, x)
    shapes = [o.shape for o in out]
    assert shapes == [
        (1, 16, 32, 64),
        (1, 8, 16, 64),
        (1, 4, 8, 128),
        (1, 2, 4, 256),
        (1, 1, 2, 512),
        (1, 1, 1, 512),
    ]


@pytest.fixture(scope="module")
def tiny_setup():
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.ops.pyramid import build_pyramid

    cfg = get_config("tiny")
    B = 1
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(B, cfg.num_pc, 3).astype(np.float32) * 5)
    pyr = jax.jit(
        jax.vmap(
            functools.partial(
                build_pyramid, sizes=cfg.pyramid_sizes, neighbor_num=cfg.neighbor_num
            )
        )
    )(pts, jax.random.split(jax.random.PRNGKey(0), B))
    batch = {
        "img": jnp.asarray(rng.rand(B, cfg.img_H, cfg.img_W, 3).astype(np.float32)),
        "feats": jnp.asarray(rng.rand(B, cfg.num_pc, 4).astype(np.float32)),
        "points": pyr["points"],
        "neighbors": pyr["neighbors"],
        "subsampling": pyr["subsampling"],
        "upsampling": pyr["upsampling"],
        "fine_pc_inline_index": jnp.asarray(
            rng.randint(0, cfg.pyramid_sizes[1], (B, cfg.num_kpt))
        ),
        "fine_center_kpt_coors": jnp.asarray(
            rng.randint(4, 12, (B, cfg.num_kpt, 2)).astype(np.int32)
        ),
    }
    model = CoFiI2P(cfg)
    vars_ = jax.jit(model.init, static_argnames=("mode", "train"))(
        jax.random.PRNGKey(1), batch, mode="train", train=True
    )
    return cfg, model, vars_, batch


def test_network_train_mode_shapes(tiny_setup):
    cfg, model, vars_, batch = tiny_setup
    fwd = jax.jit(
        functools.partial(model.apply, mutable=["batch_stats"]),
        static_argnames=("mode", "train"),
    )
    out, _ = fwd(vars_, batch, mode="train", train=True)
    S = cfg.num_superpoints
    assert out["pc_feature_norm"].shape == (1, S, 128)
    assert out["img_feature_norm"].shape == (1, cfg.pe_H, cfg.pe_W, 128)
    assert out["coarse_pc_score"].shape == (1, S)
    assert out["fine_img_patch"].shape == (1, cfg.num_kpt, 4, 4, 64)
    assert out["fine_pc_feature"].shape == (1, cfg.num_kpt, 64)
    # normalized features have unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["pc_feature_norm"]), axis=-1), 1.0, atol=1e-4
    )
    # scores in (0, 1)
    s = np.asarray(out["coarse_pc_score"])
    assert (s > 0).all() and (s < 1).all()


def test_network_test_mode_inliers(tiny_setup):
    cfg, model, vars_, batch = tiny_setup
    fwd = jax.jit(model.apply, static_argnames=("mode", "train"))
    out = fwd(vars_, batch, mode="test", train=False)
    mask = np.asarray(out["inlier_mask"])
    assert mask.shape == (1, cfg.num_superpoints)
    # the threshold-decay contract: at least 4 inliers unless the border mask
    # leaves fewer than 4 candidates in total
    assert mask.sum() >= 4 or mask.sum() == 0
    assert out["fine_center_xy"].shape == (1, cfg.num_superpoints, 2)
