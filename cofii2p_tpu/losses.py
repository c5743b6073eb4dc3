"""Training losses: coarse circle loss, overlap BCE, fine circle loss.

Re-derivations of the reference loss math (/root/reference/model/loss.py)
as pure, batched JAX functions.  All masks are float masks over static
shapes; everything vmaps over the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def desc_loss(
    img_features: jax.Array,
    pc_features: jax.Array,
    mask: jax.Array,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    log_scale: float = 10.0,
):
    """Weighted circle loss on the coarse K x K match matrix.

    (reference loss.py:69-93; called with pos_margin=0.2, neg_margin=1.8,
    train.py:254 + options.py:42-43)

    Args:
      img_features: (..., C, K) channel-normalized image keypoint features.
      pc_features: (..., C, K) channel-normalized superpoint features.
      mask: (..., K, K) float correspondence mask (1 = positive pair).

    Returns:
      (scalar loss, (..., K, K) cosine distances)
    """
    pos_mask = mask
    neg_mask = 1.0 - mask
    dists = 1.0 - jnp.einsum(
        "...ck,...cl->...kl", img_features, pc_features,
        preferred_element_type=jnp.float32,
    )

    pos = dists - 1e5 * neg_mask
    pos_weight = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
    lse_pos_row = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_weight, axis=-1)
    lse_pos_col = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_weight, axis=-2)

    neg = dists + 1e5 * pos_mask
    neg_weight = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
    lse_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_weight, axis=-1)
    lse_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_weight, axis=-2)

    loss_col = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_row = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale
    return jnp.mean(loss_col + loss_row), dists


def overlap_loss(inline_score: jax.Array, outline_score: jax.Array) -> jax.Array:
    """BCE pushing in-view superpoint scores to 1 and out-of-view to 0
    (reference loss.py:53-60)."""
    eps = 1e-7
    pos = -jnp.log(jnp.clip(inline_score, eps, 1.0))
    neg = -jnp.log(jnp.clip(1.0 - outline_score, eps, 1.0))
    return (jnp.sum(pos) + jnp.sum(neg)) / (inline_score.size + outline_score.size)


def fine_circle_loss(
    fine_img_patch: jax.Array,
    fine_pc_feature: jax.Array,
    relative_index: jax.Array,
    m: float = 0.2,
    gamma: float = 5.0,
) -> jax.Array:
    """Circle loss over the 16 cells of each fine patch, one-hot true cell.

    (reference loss.py:9-51; label index = rel_y*4 + rel_x per
    train.py:268-269)

    Args:
      fine_img_patch: (..., K, 4, 4, C).
      fine_pc_feature: (..., K, C).
      relative_index: (..., K) int true-cell index in 0..15.
    """
    k = fine_pc_feature.shape[-2]
    cells = fine_img_patch.reshape(*fine_img_patch.shape[:-3], 16, -1)  # (...,K,16,C)

    # cosine similarity per cell (torch.cosine_similarity normalizes both)
    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    cos = jnp.einsum(
        "...kpc,...kc->...kp", _norm(cells), _norm(fine_pc_feature),
        preferred_element_type=jnp.float32,
    )  # (..., K, 16)

    label = jax.nn.one_hot(relative_index, 16, dtype=cos.dtype)
    pos = label
    neg = 1.0 - label
    sp = cos * pos
    sn = cos * neg
    ap = jnp.maximum(-jax.lax.stop_gradient(sp) + pos + pos * m, 0.0)
    an = jnp.maximum(jax.lax.stop_gradient(sn) + neg * m, 0.0)
    delta_p = 1.0 - m
    delta_n = m
    logit_p = -ap * (sp - pos * delta_p) * gamma
    logit_n = an * (sn - neg * delta_n) * gamma
    loss_p = jnp.sum(jnp.exp(logit_p) * pos, axis=-1)
    loss_n = jnp.sum(jnp.exp(logit_n) * neg, axis=-1)
    return jnp.mean(jnp.log(1.0 + loss_n * loss_p))
