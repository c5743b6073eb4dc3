"""I2P feature-fusion transformer (LoFTR-style alternating self/cross).

Capability match for the reference LocalFeatureTransformer
(/root/reference/model/transformer/transformer.py:15-103): 8 layers of
('self','cross') x 4 at d_model=128, nhead=4, full attention.

Parity quirk preserved on purpose: the reference normalizes the projected
query with F.normalize's *default dim=1*, i.e. across the sequence axis of
the (B, L, H, D) tensor (transformer.py:53) — not across the head dim.
Checkpoints are trained with that behavior, so we reproduce it exactly.

Token counts are static (1280 image x 1280 superpoints), so full O(L*S)
attention is a single fused einsum chain per layer — comfortably MXU-bound
at this size; no sequence sharding is warranted (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cofii2p_tpu.models.layers import xavier_init


def full_attention(q, k, v):
    """Softmax attention over (B, L/S, H, D) tensors
    (reference linear_attention.py:50-78).

    Layout: the score/softmax chain runs head-major ((B, H, L, S)) so the
    S=1280 axis rides the 128-lane minor dimension.  The reference-shaped
    "blhd,bshd->blsh" formulation puts H=4 minor — 4/128 lane utilization
    on the ~52 MB fp32 softmax chain per call, which made the transformer
    the largest non-kernel stage (14.5 ms/batch of the w192 pipeline,
    PERF.md round-5 glue decomposition).  Same math, same fp32 softmax —
    only the reduction layout changes.
    """
    d = q.shape[-1]
    qT = jnp.swapaxes(q, 1, 2)  # (B, H, L, D)
    kT = jnp.swapaxes(k, 1, 2)  # (B, H, S, D)
    vT = jnp.swapaxes(v, 1, 2)  # (B, H, S, D)
    logits = jnp.einsum(
        "bhld,bhsd->bhls", qT, kT, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhls,bhsd->bhld", attn, vT, preferred_element_type=jnp.float32
    )
    return jnp.swapaxes(out, 1, 2)  # (B, L, H, D) fp32


def linear_attention(q, k, v, eps: float = 1e-6):
    """elu+1 feature-map linear attention, the reference's ATTENTION='linear'
    option (linear_attention.py:14-47, after Katharopoulos et al. 2020)."""
    qf = jax.nn.elu(q.astype(jnp.float32)) + 1.0
    kf = jax.nn.elu(k.astype(jnp.float32)) + 1.0
    s = v.shape[1]
    v = v.astype(jnp.float32) / s  # overflow guard kept from the reference
    kv = jnp.einsum("bshd,bshv->bhdv", kf, v)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", qf, jnp.sum(kf, axis=1)) + eps)
    return jnp.einsum("blhd,bhdv,blh->blhv", qf, kv, z) * s


def _seq_l2norm(q: jax.Array) -> jax.Array:
    """The reference's F.normalize(default dim=1) on the (B, L, H, D)
    projected query — a SEQUENCE-axis L2 norm (transformer.py:53), kept
    for checkpoint parity; fp32 for bf16 stability."""
    q32 = q.astype(jnp.float32)
    return (
        q32 / jnp.maximum(jnp.linalg.norm(q32, axis=1, keepdims=True), 1e-12)
    ).astype(q.dtype)


class LoFTREncoderLayer(nn.Module):
    d_model: int = 128
    nhead: int = 4
    dtype: Any = jnp.float32
    attention: str = "full"  # 'full' | 'linear' | 'pallas' (fused TPU kernel)

    @nn.compact
    def __call__(self, x: jax.Array, source: jax.Array) -> jax.Array:
        """x (B, L, C) attends to source (B, S, C)."""
        b, l, c = x.shape
        h = self.nhead
        d = c // h

        dense = lambda name: nn.Dense(
            c, use_bias=False, kernel_init=xavier_init, dtype=self.dtype, name=name
        )
        q = dense("q_proj")(x).reshape(b, l, h, d)
        k = dense("k_proj")(source).reshape(b, -1, h, d)
        v = dense("v_proj")(source).reshape(b, -1, h, d)

        # reference quirk: L2-normalize q along the *sequence* axis (dim=1)
        q = _seq_l2norm(q)

        if self.attention == "pallas":
            from cofii2p_tpu.ops.attention_kernel import fused_attention

            message = fused_attention(q, k, v)
        elif self.attention == "linear":
            message = linear_attention(q, k, v)
        else:
            message = full_attention(q, k, v)
        message = message.reshape(b, l, c)

        message = dense("merge")(message.astype(self.dtype))
        message = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(message)

        y = jnp.concatenate([x.astype(self.dtype), message], axis=-1)
        y = nn.Dense(2 * c, use_bias=False, kernel_init=xavier_init, dtype=self.dtype, name="mlp1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=xavier_init, dtype=self.dtype, name="mlp2")(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross fusion over two token sets
    (reference transformer.py:67-103)."""

    d_model: int = 128
    nhead: int = 4
    layer_names: Sequence[str] = ("self", "cross") * 4
    dtype: Any = jnp.float32
    attention: str = "full"  # 'full' | 'linear' (reference ATTENTION option)

    @nn.compact
    def __call__(self, feat0: jax.Array, feat1: jax.Array):
        assert feat0.shape[-1] == self.d_model
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(
                self.d_model, self.nhead, dtype=self.dtype,
                attention=self.attention, name=f"layer{i}",
            )
            if name == "self":
                feat0 = layer(feat0, feat0)
                feat1 = layer(feat1, feat1)
            elif name == "cross":
                feat0 = layer(feat0, feat1)
                feat1 = layer(feat1, feat0)
            else:
                raise KeyError(name)
        return feat0, feat1
