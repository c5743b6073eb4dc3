"""Diagnose the streamed-scan slowdown: device time of one scanned stream
(CHUNK batches in one dispatch) vs CHUNK standalone pipeline dispatches.

Run on TPU: python -m tools.stream_diag
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.config import KITTIConfig
from cofii2p_tpu.data.loader import _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.evaluation.pipeline import make_eval_body
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu import train_lib
from cofii2p_tpu.utils.profiling import timeit_sync

BATCH, CHUNK = 8, 8


def main():
    cfg = KITTIConfig(compute_dtype="bfloat16")
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=BATCH * CHUNK)
    batches = [
        _collate([ds[k * BATCH + i] for i in range(BATCH)])
        for k in range(CHUNK)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(jax.tree.map(lambda *xs: np.stack(xs), *batches))
    host0 = jax.device_put(batches[0])

    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host0)
    body = make_eval_body(cfg, model)
    single = jax.jit(body)

    @jax.jit
    def run_stream(params, batch_stats, stream, rngs):
        def step(carry, xs):
            batch_k, rng_k = xs
            out = body(params, batch_stats, batch_k, rng_k)
            return carry + jnp.sum(out.t), (out.R, out.t, out.success)

        return jax.lax.scan(step, jnp.zeros((), jnp.float32), (stream, rngs),
                            unroll=CHUNK)

    rngs = jax.random.split(jax.random.PRNGKey(0), CHUNK)
    rng1 = rngs[0]

    t0 = time.perf_counter()
    jax.block_until_ready(single(state.params, state.batch_stats, host0, rng1))
    print(f"single compile: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    jax.block_until_ready(
        run_stream(state.params, state.batch_stats, stream_host, rngs)
    )
    print(f"stream compile: {time.perf_counter()-t0:.1f}s")

    ms_single = timeit_sync(
        lambda: single(state.params, state.batch_stats, host0, rng1),
        warmup=2, iters=6,
    ) * 1e3
    ms_stream = timeit_sync(
        lambda: run_stream(state.params, state.batch_stats, stream_host, rngs),
        warmup=2, iters=4,
    ) * 1e3
    print(f"single pipeline: {ms_single:.1f} ms/B={BATCH}  "
          f"({BATCH/ms_single*1e3:.1f} fps)")
    print(f"scanned stream:  {ms_stream:.1f} ms/{CHUNK}xB={BATCH}  "
          f"= {ms_stream/CHUNK:.1f} ms/batch "
          f"({CHUNK*BATCH/ms_stream*1e3:.1f} fps)")


def scalar_only():
    """True device time: scalar-reducing wrapper (no big readback)."""
    cfg = KITTIConfig(compute_dtype="bfloat16")
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=BATCH)
    batch = _collate([ds[i] for i in range(BATCH)])
    batch.pop("index", None)
    host0 = jax.device_put(batch)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host0)
    body = make_eval_body(cfg, model)

    @jax.jit
    def single_scalar(params, bs, b, rng):
        out = body(params, bs, b, rng)
        return jnp.sum(out.t) + jnp.sum(out.R)

    rng1 = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    jax.block_until_ready(single_scalar(state.params, state.batch_stats, host0, rng1))
    print(f"scalar compile: {time.perf_counter()-t0:.1f}s")
    ms = timeit_sync(
        lambda: single_scalar(state.params, state.batch_stats, host0, rng1),
        warmup=2, iters=8,
    ) * 1e3
    print(f"scalar single:  {ms:.1f} ms/B={BATCH}  ({BATCH/ms*1e3:.1f} fps)")


if __name__ == "__main__":
    import sys
    scalar_only() if "--scalar" in sys.argv else main()
