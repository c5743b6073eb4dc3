"""Benchmark: end-to-end eval throughput (frames/sec/chip) on KITTI-scale
frames — the BASELINE.json north-star metric.

Measures the fused inference pipeline (on-device sample prep incl. pyramid +
kNN, two-stream encoders, I2P transformer, fine matching, EPnP-RANSAC) on
synthetic KITTI-shaped frames (160x512 image, 20480-point cloud), batched.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no FPS (its measurement tool,
evaluation/get_flops_fps.py, has no committed output); the paper claims
"real-time speed" on a desktop GPU.  We use 10 frames/s as the reference
estimate (conservative for a batch-1 PyTorch pipeline that runs 15 CPU kNN
searches per frame in the loader plus a 10000-iteration CPU
cv2.solvePnPRansac), so vs_baseline = value / 10.0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS_ESTIMATE = 10.0


def main():
    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_pipeline
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib

    batch_size = 8
    # bf16 serving config: ~10% faster than fp32 (PERF.md) and accuracy-
    # validated against fp32 on a trained checkpoint (same 32/32
    # registration success, comparable RRE/RTE); params remain fp32
    cfg = KITTIConfig(compute_dtype="bfloat16")
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=batch_size)
    host = _collate([ds[i] for i in range(batch_size)])
    host = {k: v for k, v in host.items() if k != "index"}
    # steady-state inputs: BatchLoader(to_device=True) stages batches on the
    # device from its producer thread, overlapping H2D with compute, so the
    # measured loop sees device-resident inputs
    host = jax.device_put(host)

    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
    pipeline = make_eval_pipeline(cfg, model)
    rng = jax.random.PRNGKey(0)

    # Steady-state throughput: issue the timed calls back-to-back (async
    # dispatch overlaps the ~28 ms tunnel round trip with device compute)
    # and hard-sync ONCE at the end via a scalar readback — per-iteration
    # sync would charge the tunnel's per-call dispatch floor to every
    # batch, which is a latency number, not the frames/sec/chip north star.
    # (block_until_ready alone is not a reliable barrier on this backend.)
    rngs = list(jax.random.split(rng, 16))

    def sync(res):
        return float(jax.device_get(jnp.sum(res.t)))

    for i in range(3):  # warmup + compile
        out = pipeline(state.params, state.batch_stats, host, rngs[i])
    sync(out)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipeline(state.params, state.batch_stats, host, rngs[3 + i])
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    fps = batch_size / dt

    print(
        json.dumps(
            {
                "metric": "kitti_eval_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
