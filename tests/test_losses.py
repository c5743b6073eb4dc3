"""Golden tests for losses against independent NumPy oracles of the
reference formulas (model/loss.py) and against torch where semantics are
subtle."""

import jax.numpy as jnp
import numpy as np

from cofii2p_tpu import losses


def _np_logsumexp(x, axis):
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def _np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def np_desc_loss(img_f, pc_f, mask, pos_margin, neg_margin, log_scale=10.0):
    """NumPy oracle for the weighted circle loss (reference loss.py:69-93)."""
    dists = 1.0 - np.einsum("ck,cl->kl", img_f, pc_f)
    pos = dists - 1e5 * (1 - mask)
    pw = np.maximum(pos - pos_margin, 0.0)
    lpr = _np_logsumexp(log_scale * (pos - pos_margin) * pw, -1)
    lpc = _np_logsumexp(log_scale * (pos - pos_margin) * pw, -2)
    neg = dists + 1e5 * mask
    nw = np.maximum(neg_margin - neg, 0.0)
    lnr = _np_logsumexp(log_scale * (neg_margin - neg) * nw, -1)
    lnc = _np_logsumexp(log_scale * (neg_margin - neg) * nw, -2)
    return np.mean(
        _np_softplus(lpr + lnr) / log_scale + _np_softplus(lpc + lnc) / log_scale
    )


def test_desc_loss_matches_oracle():
    rng = np.random.RandomState(0)
    K, C = 16, 8
    img = rng.randn(C, K).astype(np.float32)
    img /= np.linalg.norm(img, axis=0, keepdims=True)
    pc = rng.randn(C, K).astype(np.float32)
    pc /= np.linalg.norm(pc, axis=0, keepdims=True)
    mask = (rng.rand(K, K) < 0.1).astype(np.float32)
    mask[np.arange(K), np.arange(K)] = 1.0

    got, dists = losses.desc_loss(
        jnp.asarray(img), jnp.asarray(pc), jnp.asarray(mask), 0.2, 1.8
    )
    want = np_desc_loss(img, pc, mask, 0.2, 1.8)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dists), 1.0 - img.T @ pc, rtol=1e-4, atol=1e-5
    )


def test_desc_loss_perfect_match_smaller_than_random():
    rng = np.random.RandomState(1)
    K, C = 8, 16
    f = rng.randn(C, K).astype(np.float32)
    f /= np.linalg.norm(f, axis=0, keepdims=True)
    mask = np.eye(K, dtype=np.float32)
    good, _ = losses.desc_loss(jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask), 0.2, 1.8)
    g = rng.randn(C, K).astype(np.float32)
    g /= np.linalg.norm(g, axis=0, keepdims=True)
    bad, _ = losses.desc_loss(jnp.asarray(f), jnp.asarray(g), jnp.asarray(mask), 0.2, 1.8)
    assert float(good) < float(bad)


def test_overlap_loss_matches_bce():
    import torch

    rng = np.random.RandomState(2)
    inl = rng.rand(10).astype(np.float32)
    outl = rng.rand(7).astype(np.float32)
    got = float(losses.overlap_loss(jnp.asarray(inl), jnp.asarray(outl)))
    # torch oracle mirroring reference loss.py:53-60
    score = torch.cat([torch.from_numpy(inl), torch.from_numpy(outl)])
    label = torch.cat([torch.ones(10), torch.zeros(7)])
    want = float(torch.nn.functional.binary_cross_entropy(score, label))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fine_circle_loss_prefers_true_cell():
    rng = np.random.RandomState(3)
    K, C = 8, 16
    pc = rng.randn(K, C).astype(np.float32)
    rel = rng.randint(0, 16, K)
    # patch whose true cell equals the pc feature, others random
    patch = rng.randn(K, 16, C).astype(np.float32)
    patch[np.arange(K), rel] = pc
    good = float(
        losses.fine_circle_loss(
            jnp.asarray(patch.reshape(K, 4, 4, C)), jnp.asarray(pc), jnp.asarray(rel)
        )
    )
    wrong_rel = (rel + 7) % 16
    bad = float(
        losses.fine_circle_loss(
            jnp.asarray(patch.reshape(K, 4, 4, C)), jnp.asarray(pc), jnp.asarray(wrong_rel)
        )
    )
    assert good < bad


def test_fine_circle_loss_matches_oracle():
    rng = np.random.RandomState(4)
    K, C = 8, 12
    patch = rng.randn(K, 16, C).astype(np.float32)
    pc = rng.randn(K, C).astype(np.float32)
    rel = rng.randint(0, 16, K)

    got = float(
        losses.fine_circle_loss(
            jnp.asarray(patch.reshape(K, 4, 4, C)), jnp.asarray(pc), jnp.asarray(rel)
        )
    )

    # numpy oracle of reference loss.py:9-51 (m=0.2, gamma=5)
    m, gamma = 0.2, 5.0
    pn = patch / np.linalg.norm(patch, axis=-1, keepdims=True)
    qn = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    cos = np.einsum("kpc,kc->kp", pn, qn)
    label = np.zeros((K, 16), np.float32)
    label[np.arange(K), rel] = 1
    posm, negm = label, 1 - label
    sp, sn = cos * posm, cos * negm
    ap = np.maximum(-sp + posm + posm * m, 0)
    an = np.maximum(sn + negm * m, 0)
    lp = -ap * (sp - posm * (1 - m)) * gamma
    ln = an * (sn - negm * m) * gamma
    want = np.mean(
        np.log(1 + (np.exp(ln) * negm).sum(-1) * (np.exp(lp) * posm).sum(-1))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)
