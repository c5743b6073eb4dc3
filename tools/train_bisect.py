"""In-context train-step cost bisection by stubbing pieces (TPU).

Times the full fused train step (prep + forward + losses + backward +
Adam) with banded kernels monkeypatched to near-free differentiable
stubs — each piece's in-context forward+backward cost is the delta.

Usage:  python -m tools.train_bisect [--batch 8]
"""

from __future__ import annotations

import argparse
import json


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig, apply_overrides
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync
    import cofii2p_tpu.models.kpconv as kpconv_mod
    import cofii2p_tpu.ops.kpconv_kernel as agg_mod
    import cofii2p_tpu.ops.maxpool_kernel as mp_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*", default=[])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    cfg = apply_overrides(KITTIConfig(), args.overrides)
    b = args.batch
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "train", length=b)
    host = {k: v for k, v in _collate([ds[i] for i in range(b)]).items()
            if k != "index"}
    host = jax.device_put(host)
    tx = train_lib.make_optimizer(cfg)

    real_agg = agg_mod.banded_kpconv_aggregate_pallas
    real_fused = agg_mod.banded_kpconv_fused_pallas
    real_mp = mp_mod.banded_maxpool_pallas
    real_near = kpconv_mod.banded_nearest_index

    def stub_agg(s_feats, q_points, s_points, radius, sigma, kernel_size=15,
                 tile=128, band_width=1024, dtype=jnp.float32):
        bq, m = q_points.shape[:2]
        c = s_feats.shape[-1]
        w = jnp.zeros((bq, m, kernel_size, c), jnp.float32)
        w = w + jnp.mean(s_feats, axis=1)[:, None, None, :]
        return w, jnp.ones((bq, m), jnp.int32)

    def stub_fused(s_feats, q_points, s_points, weights, radius, sigma,
                   kernel_size=15, tile=128, band_width=1024, dtype=jnp.float32):
        w, cnt = stub_agg(s_feats, q_points, s_points, radius, sigma,
                          kernel_size, tile, band_width, dtype)
        out = jnp.einsum("bmkc,kcd->bmd", w, weights,
                         preferred_element_type=jnp.float32)
        return out, cnt

    def stub_mp(s_feats, q_points, s_points, r_active, tile=128, band_width=1024):
        step = s_feats.shape[1] // q_points.shape[1]
        return s_feats[:, ::step]

    def stub_near(q_points, s_points, tile=128, band_width=1024):
        m, n = q_points.shape[0], s_points.shape[0]
        return (jnp.arange(m, dtype=jnp.int32) * n) // m

    def set_stubs(agg=False, mp=False, near=False):
        agg_mod.banded_kpconv_aggregate_pallas = stub_agg if agg else real_agg
        agg_mod.banded_kpconv_fused_pallas = stub_fused if agg else real_fused
        kpconv_mod.banded_nearest_index = stub_near if near else real_near
        mp_mod.banded_maxpool_pallas = stub_mp if mp else real_mp

    results = {}

    def time_step(name):
        state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host)
        step = train_lib.make_train_step(cfg, model, tx)
        k = jax.random.PRNGKey(1)
        st = [state]

        def run():
            s2, metrics = step(st[0], host, k)
            st[0] = s2
            return metrics["loss"]

        dt = timeit_sync(run, warmup=2, iters=args.iters)
        results[name] = round(dt * 1e3, 1)
        print(f"{name:28s} {dt * 1e3:8.1f} ms", flush=True)

    try:
        set_stubs()
        time_step("train full")
        set_stubs(mp=True)
        time_step("train - maxpool")
        set_stubs(agg=True)
        time_step("train - agg")
        set_stubs(agg=True, mp=True, near=True)
        time_step("train - all banded")
    finally:
        set_stubs()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
