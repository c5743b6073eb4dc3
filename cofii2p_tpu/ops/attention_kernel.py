"""Fused multi-head attention Pallas kernel for the I2P transformer.

The fusion token counts are small and static (1280 image tokens x 1280
superpoints, d_head 32 — reference network.py:104-115), so the entire K/V
of one (batch, head) slice fits in VMEM (~160 KB each).  The kernel fuses
logits, softmax, and the value contraction over query tiles — one HBM read
per operand and no materialized (L, S) attention matrix in HBM (XLA's
unfused path writes it out at fp32: L*S*H*B ~ 50 MB per layer per call).

Falls back to the XLA einsum path on CPU or when shapes don't tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # (TL, D)
    k = k_ref[0].astype(jnp.float32)  # (S, D)
    v = v_ref[0].astype(jnp.float32)  # (S, D)
    d = q.shape[-1]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))  # (TL, S)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, q_tile: int = 128):
    """Softmax attention (B, L, H, D) x (B, S, H, D) -> (B, L, H, D).

    Semantics match models.transformer.full_attention (scale 1/sqrt(D),
    softmax over S).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    # (B, L, H, D) -> (B*H, L, D)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    grid = (b * h, pl.cdiv(l, q_tile))
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests interpret
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_tile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
    )(qt, kt, vt)
    return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)


def attention_available() -> bool:
    """True when the Pallas TPU path can run (TPU backend present)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
