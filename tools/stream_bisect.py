"""Stream-method cost bisection of the FULL eval pipeline (real TPU).

tools/fpn_bisect chains applications inside one jit — the method the
round-2 correction showed can overstate components (XLA overlaps/CSEs the
chain).  This tool instead times a lax.scan of CHUNK independent eval
bodies inside ONE jitted program (the method whose total was verified
three ways, PERF.md round-2 correction) with selected pieces stubbed, so
each piece's share is a delta between two *trusted* totals.

Run with the bench config (bf16) by default — shares measured in fp32 do
not transfer (the select chain runs in the feature dtype).

Round 5 adds non-kernel stage stubs (resnet, transformer, heads, fine,
ransac, resfuse) so the ~51 ms "glue" floor gets the same trusted
decomposition the kernels got in round 4 (VERDICT r4 weak #3).

Usage: python -m tools.stream_bisect [--batch 8] [--chunk 4]
       [--dtype bfloat16] [--variants full,mp,agg,near,gn,kernels,all]
       [--variants full,resnet,transformer,heads,fine,ransac --plan serve]
"""

from __future__ import annotations

import argparse
import json
from typing import Any

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.evaluation.pipeline import make_eval_body
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.pose.ransac import RansacResult
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.profiling import timeit_sync
    import cofii2p_tpu.evaluation.pipeline as pipe_mod
    import cofii2p_tpu.models.kpconv as kpconv_mod
    import cofii2p_tpu.models.layers as layers_mod
    import cofii2p_tpu.models.network as net_mod
    import cofii2p_tpu.ops.kpconv_kernel as agg_mod
    import cofii2p_tpu.ops.maxpool_kernel as mp_mod
    import cofii2p_tpu.ops.residual_kernel as res_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--variants", default="full,mp,agg,near,gn,kernels,all"
    )
    ap.add_argument(
        "--impl", default=None,
        help="'banded_knn' = the .t7 reproduction config (banded_knn + "
        "per-layer dispositions + reference fine decode + pallas "
        "attention); default = the radius serving/parity config",
    )
    ap.add_argument(
        "--knnplan", type=int, default=0,
        help="with --impl banded_knn: kNN window width on every level "
        "(kpconv_knn_window_plan), 0 = full static bands",
    )
    ap.add_argument(
        "--plan", default="static",
        help="'static' (the parity bands) or 'serve' (the bench serving "
        "plan, config.SERVE_DYNAMIC_PLAN) — measure stage shares under "
        "the narrow windows",
    )
    args = ap.parse_args()

    cfg = KITTIConfig(compute_dtype=args.dtype)
    if args.impl == "banded_knn":
        cfg = cfg.replace(
            kpconv_impl="banded_knn",
            kpconv_shared_influence=False,
            fine_decode="reference",
            attention="pallas",
            kpconv_knn_window_plan=(
                (args.knnplan,) * 5 if args.knnplan else None
            ),
        )
    if args.plan == "serve":
        from cofii2p_tpu.config import (
            SERVE_DYNAMIC_PLAN, SERVE_DYNAMIC_PLAN_SELF,
        )

        cfg = cfg.replace(
            kpconv_dynamic_plan=SERVE_DYNAMIC_PLAN,
            kpconv_dynamic_plan_self=SERVE_DYNAMIC_PLAN_SELF,
            # the round-5 serving default (bench.py): fused Pallas attention
            attention="pallas",
        )
    model = CoFiI2P(cfg)
    ds = SyntheticDataset(cfg, "val", length=args.batch * args.chunk)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(args.chunk)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *batches)
    )
    host0 = jax.device_put(batches[0])
    rngs = jax.random.split(jax.random.PRNGKey(0), args.chunk)
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx, jax.random.PRNGKey(0), host0)

    real_agg = agg_mod.banded_kpconv_aggregate_pallas
    real_fused = agg_mod.banded_kpconv_fused_pallas
    real_mp = mp_mod.banded_maxpool_pallas
    real_near = kpconv_mod.banded_nearest_index
    real_gn = layers_mod._gn_normalize
    real_resfuse = res_mod.banded_residual_fused_pallas
    real_tau_agg = agg_mod.banded_kpconv_aggregate_tau_pallas
    real_tau_fused = agg_mod.banded_kpconv_fused_tau_pallas
    real_tau_mp = mp_mod.banded_maxpool_tau_pallas
    real_knn_tau = kpconv_mod.banded_knn_tau
    real_resnet = net_mod.ResNetEncoder
    real_tf = net_mod.LocalFeatureTransformer
    real_score = net_mod.ScoreHead
    real_pchead = net_mod.PCFeatureHead
    real_fine = pipe_mod.fine_match_xy
    real_ransac = pipe_mod.ransac_pnp

    def stub_agg(s_feats, q_points, s_points, radius, sigma, kernel_size=15,
                 tile=128, band_width=1024, dtype=jnp.float32, starts=None):
        bq, m = q_points.shape[:2]
        c = s_feats.shape[-1]
        w = jnp.zeros((bq, m, kernel_size, c), jnp.float32)
        w = w + jnp.mean(s_feats, axis=1)[:, None, None, :].astype(jnp.float32)
        return w, jnp.ones((bq, m), jnp.int32)

    def stub_fused(s_feats, q_points, s_points, weights, radius, sigma,
                   kernel_size=15, tile=128, band_width=1024,
                   dtype=jnp.float32, starts=None):
        bq, m = q_points.shape[:2]
        out = jnp.zeros((bq, m, weights.shape[-1]), jnp.float32)
        out = out + jnp.mean(s_feats, axis=1)[:, None, :1].astype(jnp.float32)
        return out, jnp.ones((bq, m), jnp.int32)

    def stub_mp(s_feats, q_points, s_points, r_active, tile=128,
                band_width=1024, tie_even=True, starts=None):
        step = s_feats.shape[1] // q_points.shape[1]
        return s_feats[:, ::step]

    def stub_near(q_points, s_points, tile=128, band_width=1024):
        m, n = q_points.shape[0], s_points.shape[0]
        return (jnp.arange(m, dtype=jnp.int32) * n) // m

    def stub_gn(x, g, eps):
        return x.astype(jnp.float32)

    def stub_tau_agg(s_feats, q_points, s_points, tau, kp, radius, sigma,
                     kernel_size=15, tile=128, band_width=1024,
                     dtype=jnp.float32, starts=None):
        return stub_agg(s_feats, q_points, s_points, radius, sigma,
                        kernel_size, tile, band_width, dtype, starts)

    def stub_tau_fused(s_feats, q_points, s_points, weights, tau, kp, radius,
                       sigma, kernel_size=15, tile=128, band_width=1024,
                       dtype=jnp.float32, starts=None):
        return stub_fused(s_feats, q_points, s_points, weights, radius, sigma,
                          kernel_size, tile, band_width, dtype, starts)

    def stub_tau_mp(s_feats, q_points, s_points, tau, tile=128,
                    band_width=1024, tie_even=True, starts=None):
        return stub_mp(s_feats, q_points, s_points, 0.0)

    def stub_knn_tau(q, s, k=128, tile=128, band_width=1024):
        # cheap density proxy: the (k/8)-th distance on an 8x-subsampled
        # support — approximates the same local-density quantile at ~1/64
        # the top_k cost, so the consumers' membership stays realistic
        return real_knn_tau(
            q, s[::8], max(k // 8, 1), tile, max(band_width // 8, 32)
        )

    def stub_resfuse(mp_feats, agg_feats, weights, q_points, s_points,
                     radius, sigma, kernel_size=15, tile=128, band_width=1024,
                     dtype=jnp.float32, tie_even=True, starts=None):
        out, count = stub_fused(
            agg_feats, q_points, s_points, weights, radius, sigma,
            kernel_size, tile, band_width, dtype, starts,
        )
        return out, count, stub_mp(mp_feats, q_points, s_points, 0.0)

    def resfuse_via_pair(mp_feats, agg_feats, weights, q_points, s_points,
                         radius, sigma, kernel_size=15, tile=128,
                         band_width=1024, dtype=jnp.float32, tie_even=True,
                         starts=None):
        # split the fused residual kernel back into the pair so the mp/agg
        # stubs apply independently (resolves the possibly-stubbed module
        # attrs at trace time)
        from cofii2p_tpu.ops.banded import kernel_reach

        out, count = agg_mod.banded_kpconv_fused_pallas(
            agg_feats, q_points, s_points, weights, radius, sigma,
            kernel_size, tile, band_width, dtype, starts,
        )
        mp = mp_mod.banded_maxpool_pallas(
            mp_feats, q_points, s_points,
            kernel_reach(radius, sigma, kernel_size), tile, band_width,
            tie_even, starts,
        )
        return out, count, mp

    # ---- non-kernel stage stubs (round 5): param-less module/function
    # twins with the right output structure and a tiny input dependence so
    # XLA cannot DCE the data path ----

    class StubResNet(nn.Module):
        stage_sizes: Any = (3, 4, 6, 3)
        stage_features: Any = (64, 128, 256, 512)
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            b, h, w, _ = x.shape
            base = jnp.mean(x, axis=-1, keepdims=True).astype(self.dtype)
            out = []
            for i, c in enumerate((64, 64, 128, 256, 512)):
                s = 2 ** (i + 1)
                out.append(
                    jnp.broadcast_to(base[:, ::s, ::s, :], (b, h // s, w // s, c))
                )
            out.append(jnp.mean(out[-1], axis=(1, 2), keepdims=True))
            return out

    class StubTF(nn.Module):
        d_model: int = 128
        nhead: int = 4
        layer_names: Any = ()
        dtype: Any = jnp.float32
        attention: str = "full"

        @nn.compact
        def __call__(self, feat0, feat1):
            mix = (jnp.mean(feat0) + jnp.mean(feat1)) * 1e-6
            return feat0 + mix.astype(feat0.dtype), feat1 + mix.astype(feat1.dtype)

    class StubScore(nn.Module):
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            return jax.nn.sigmoid(
                jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
            )

    class StubPCHead(nn.Module):
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x[..., :128].astype(self.dtype)

    def stub_fine(fine_img_patch, fine_pc_feature, fine_center_xy,
                  decode="label"):
        eps = (
            jnp.mean(fine_img_patch) + jnp.mean(fine_pc_feature)
        ).astype(jnp.float32) * 1e-6
        return fine_center_xy.astype(jnp.float32) + eps

    def stub_ransac(rng, object_points, image_points, K, mask,
                    inlier_threshold=8.0, num_hypotheses=1024, sample_size=6,
                    refine_iters=2):
        t = jnp.mean(object_points, axis=0) + jnp.mean(image_points) * 1e-6
        return RansacResult(
            R=jnp.eye(3, dtype=jnp.float32),
            t=t.astype(jnp.float32),
            inlier_mask=mask > 0,
            num_inliers=jnp.sum(mask).astype(jnp.int32),
            success=jnp.sum(mask) > 0,
        )

    def set_stubs(agg=False, mp=False, near=False, gn=False, resnet=False,
                  tf=False, heads=False, fine=False, ransac=False, tau=False):
        agg_mod.banded_kpconv_aggregate_pallas = stub_agg if agg else real_agg
        agg_mod.banded_kpconv_fused_pallas = stub_fused if agg else real_fused
        agg_mod.banded_kpconv_aggregate_tau_pallas = (
            stub_tau_agg if agg else real_tau_agg
        )
        agg_mod.banded_kpconv_fused_tau_pallas = (
            stub_tau_fused if agg else real_tau_fused
        )
        mp_mod.banded_maxpool_tau_pallas = stub_tau_mp if mp else real_tau_mp
        kpconv_mod.banded_knn_tau = stub_knn_tau if tau else real_knn_tau
        kpconv_mod.banded_nearest_index = stub_near if near else real_near
        mp_mod.banded_maxpool_pallas = stub_mp if mp else real_mp
        layers_mod._gn_normalize = stub_gn if gn else real_gn
        if agg and mp:
            res_mod.banded_residual_fused_pallas = stub_resfuse
        elif agg or mp:
            res_mod.banded_residual_fused_pallas = resfuse_via_pair
        else:
            res_mod.banded_residual_fused_pallas = real_resfuse
        net_mod.ResNetEncoder = StubResNet if resnet else real_resnet
        net_mod.LocalFeatureTransformer = StubTF if tf else real_tf
        net_mod.ScoreHead = StubScore if heads else real_score
        net_mod.PCFeatureHead = StubPCHead if heads else real_pchead
        pipe_mod.fine_match_xy = stub_fine if fine else real_fine
        pipe_mod.ransac_pnp = stub_ransac if ransac else real_ransac

    variants = {
        "full": {},
        "mp": dict(mp=True),
        "agg": dict(agg=True),
        "near": dict(near=True),
        "gn": dict(gn=True),
        "kernels": dict(mp=True, agg=True),
        "tau": dict(tau=True),
        "all": dict(mp=True, agg=True, near=True, gn=True),
        # round-5 glue decomposition
        "resnet": dict(resnet=True),
        "transformer": dict(tf=True),
        "heads": dict(heads=True),
        "fine": dict(fine=True),
        "ransac": dict(ransac=True),
        "glue": dict(resnet=True, tf=True, heads=True, fine=True, ransac=True),
    }
    want = args.variants.split(",")

    results = {}
    try:
        for name in want:
            set_stubs(**variants[name])
            body = make_eval_body(cfg, model)

            @jax.jit
            def run(params, batch_stats, stream, rr, body=body):
                def step(carry, xs):
                    b_k, r_k = xs
                    out = body(params, batch_stats, b_k, r_k)
                    return carry + jnp.sum(out.t), None

                total, _ = jax.lax.scan(
                    step, jnp.zeros((), jnp.float32), (stream, rr)
                )
                return total

            def call(run=run):
                return run(state.params, state.batch_stats, stream_host, rngs)

            ms = timeit_sync(call, warmup=2, iters=args.iters) * 1e3 / args.chunk
            results[name] = round(ms, 2)
            extra = ""
            if name != "full" and "full" in results:
                extra = f"  (share {results['full'] - ms:+.2f} ms)"
            print(f"{name:8s}: {ms:8.2f} ms/batch{extra}")
    finally:
        set_stubs()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
