"""I2P transformer micro-bench (real TPU, chained-scan stream timing).

The round-5 glue decomposition put the 8-layer transformer at 14.5
ms/batch — ~15x off its bf16 roofline.  Root cause: the reference-shaped
attention einsum "blhd,bshd->blsh" puts H=4 on the minor axis, so the
~52 MB fp32 score/softmax chain runs at 4/128 lane utilization.  This
tool A/Bs the head-major rewrite (models/transformer.full_attention)
against the old layout at the exact I2P shape, and checks value equality.

Usage: python -m tools.tf_micro [--dtype bfloat16] [--iters 8]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.models import transformer as tf_mod
    from cofii2p_tpu.utils.profiling import timeit_sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    fdt = jnp.dtype(args.dtype)
    b, l, c = args.batch, args.tokens, 128
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32)).astype(fdt)
    f1 = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32)).astype(fdt)

    def attention_old(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum(
            "blhd,bshd->blsh", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(d))
        attn = jax.nn.softmax(logits, axis=2)
        return jnp.einsum(
            "blsh,bshd->blhd", attn, v, preferred_element_type=jnp.float32
        )

    model = tf_mod.LocalFeatureTransformer(dtype=fdt)
    params = model.init(jax.random.PRNGKey(0), f0, f1)

    def attention_stub(q, k, v):
        # shapes/dataflow preserved, QK/softmax/AV removed
        return (q + jnp.mean(k) * 1e-12 + jnp.mean(v) * 1e-12).astype(
            jnp.float32
        )

    def attention_pallas(q, k, v):
        from cofii2p_tpu.ops.attention_kernel import fused_attention

        return fused_attention(q, k, v)

    real_attn = tf_mod.full_attention
    real_qnorm = tf_mod._seq_l2norm
    arms = {
        "old-layout": (attention_old, real_qnorm),
        "head-major": (real_attn, real_qnorm),
        "pallas": (attention_pallas, real_qnorm),
        "no-attn": (attention_stub, real_qnorm),
        "no-qnorm": (real_attn, lambda q: q),
        "no-both": (attention_stub, lambda q: q),
    }
    outs = {}
    for name, (attn_fn, qnorm_fn) in arms.items():
        tf_mod.full_attention = attn_fn
        tf_mod._seq_l2norm = qnorm_fn

        @jax.jit
        def run(params, a, bb):
            def body(carry, _):
                x, y = carry
                o0, o1 = model.apply(params, x, y)
                eps = (jnp.mean(o0) + jnp.mean(o1)) * 1e-12
                return (x + eps.astype(x.dtype), y + eps.astype(y.dtype)), None

            (xf, yf), _ = jax.lax.scan(body, (a, bb), None, length=args.iters)
            return jnp.sum(xf[..., 0]) + jnp.sum(yf[..., 0])

        ms = (
            timeit_sync(lambda: run(params, f0, f1), warmup=1, iters=args.reps)
            * 1e3 / args.iters
        )
        print(f"{name:11s}: {ms:7.2f} ms/apply (8 layers, B={b}, L=S={l})",
              flush=True)
        if name in ("old-layout", "head-major"):
            outs[name] = jax.device_get(jax.jit(model.apply)(params, f0, f1))
    tf_mod.full_attention = real_attn
    tf_mod._seq_l2norm = real_qnorm

    d0 = np.abs(
        np.asarray(outs["old-layout"][0], np.float32)
        - np.asarray(outs["head-major"][0], np.float32)
    ).max()
    d1 = np.abs(
        np.asarray(outs["old-layout"][1], np.float32)
        - np.asarray(outs["head-major"][1], np.float32)
    ).max()
    print(f"value agreement: max abs diff feat0 {d0:.2e}, feat1 {d1:.2e}")


if __name__ == "__main__":
    main()
