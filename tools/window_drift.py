"""Deterministic window-impact gate (round 5, VERDICT r4 weak #2).

The w192 serving promotion was gated on a registration proxy whose noise
floor (RRE 26.6-43.6 deg across plans at uniform 32/32 success) is wider
than the deltas it gates on.  This tool measures EXACTLY what the narrow
windows change, with zero RANSAC/training noise: the same frames, the same
weights, the same prep rng, forwarded under the static band plan and under
each candidate window plan, comparing

  - coarse-argmax drift: fraction of superpoints whose best image token
    (argmax over pc_feature_norm @ img_feature_norm) changed;
  - selection drift: fraction of changed inlier_mask entries
    (the closed-form test-mode threshold selection);
  - fine-cell drift: fraction of selected superpoints whose fine 4x4
    argmax cell moved (fine_match_xy output differs);
  - score drift: max |coarse_pc_score delta|.

Every number is a deterministic function of what the windows drop —
matching /root/reference/model/network.py:74-164 forward semantics under
bridged/trained weights.

Usage: python -m tools.window_drift <ckpt_dir> [--frames 32] [--batch 8]
       [--plans w256,w192] [--dtype bfloat16]
       python -m tools.window_drift --tiny     # CPU smoke (random init)
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig, TinyConfig
    from cofii2p_tpu.data.device_pipeline import prepare_samples
    from cofii2p_tpu.data.loader import _collate
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.models import CoFiI2P
    from cofii2p_tpu.models.network import fine_match_xy
    from cofii2p_tpu import train_lib
    from cofii2p_tpu.utils.checkpoint import restore_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=str, nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--plans", default="w256,w192",
                    help="candidate plans to compare against static bands")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--tile", type=int, default=0,
                    help="override cfg.kpconv_tile (0 = keep default)")
    ap.add_argument("--knn", action="store_true",
                    help="measure kNN window plans on the .t7-style config "
                    "(banded_knn + per-layer dispositions + reference fine "
                    "decode); plans then name kpconv_knn_window_plan widths "
                    "(knn256 etc.) and 0%% drift == exact windows")
    args = ap.parse_args()

    catalog = {
        "w256": ((0, 256, 256, 256, 0), (0, 0, 256, 256, 0)),
        "w192": ((0, 192, 192, 192, 0), (0, 0, 192, 192, 0)),
        "w128": ((0, 128, 128, 128, 0), (0, 0, 128, 128, 0)),
        # round-5 shallow/self candidates (see tools/dyn_pipeline_ab)
        "c0w256": ((256, 192, 192, 192, 0), (0, 0, 192, 192, 0)),
        "s4w256": ((0, 192, 192, 192, 0), (0, 0, 192, 192, 256)),
        "selfw256": ((0, 192, 192, 192, 0), (256, 256, 192, 192, 256)),
        "all256": ((256, 256, 256, 256, 0), (256, 256, 256, 256, 256)),
        "w8": ((0, 8, 8, 8, 0), (0, 0, 8, 8, 0)),  # tiny smoke
    }
    knn_catalog = {
        "knn640": (640, 640, 640, 640, 640),
        "knn512": (512, 512, 512, 512, 512),
        "knn384": (384, 384, 384, 384, 384),
        "knn256": (256, 256, 256, 256, 256),
        "knn192": (192, 192, 192, 192, 192),
        # graded: narrow where the top_k cost lives (shallow), wider/off at
        # the deep levels where the 128-NN span most of the level
        "knngrade": (256, 256, 384, 640, 0),
        "knngrade2": (384, 384, 512, 0, 0),
        "knn8": (8, 8, 8, 8, 8),  # tiny smoke
    }

    if args.tiny:
        base = TinyConfig(compute_dtype=args.dtype)
        args.plans = "knn8" if args.knn else "w8"
        args.frames = min(args.frames, 8)
        args.batch = min(args.batch, 4)
    else:
        base = KITTIConfig(compute_dtype=args.dtype)
    if args.tile:
        base = base.replace(kpconv_tile=args.tile)
    if args.knn:
        base = base.replace(
            kpconv_impl="banded_knn",
            kpconv_shared_influence=False,
            fine_decode="reference",
        )

    nb = args.frames // args.batch
    ds = SyntheticDataset(base, "val", length=args.frames)
    batches = [
        _collate([ds[k * args.batch + i] for i in range(args.batch)])
        for k in range(nb)
    ]
    for hb in batches:
        hb.pop("index", None)
    stream_host = jax.device_put(
        jax.tree.map(lambda *xs: np.stack(xs), *batches)
    )
    host0 = jax.device_put(batches[0])
    rngs = jax.random.split(jax.random.PRNGKey(7), nb)

    def outputs_for(cfg):
        model = CoFiI2P(cfg)
        tx = train_lib.make_optimizer(cfg)
        state = train_lib.init_state(
            cfg, model, tx, jax.random.PRNGKey(0), host0
        )
        if args.ckpt is not None:
            state = restore_checkpoint(args.ckpt, state)

        @jax.jit
        def run(params, batch_stats, stream, rr):
            def step(_, xs):
                hb, r = xs
                prep_rng, _ = jax.random.split(r)
                batch = prepare_samples(
                    hb["pc"], hb["attrs"], hb["P"], hb["K"], prep_rng,
                    hb["img"], cfg,
                )
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, mode="test", train=False,
                )
                fine_xy = fine_match_xy(
                    out["fine_img_patch"], out["fine_pc_feature"],
                    out["fine_center_xy"], decode=cfg.fine_decode,
                )
                b, s, _ = out["pc_feature_norm"].shape
                img_tok = out["img_feature_norm"].reshape(b, -1, 128)
                sim = jnp.einsum(
                    "bsc,blc->bsl", out["pc_feature_norm"], img_tok,
                    preferred_element_type=jnp.float32,
                )
                return None, dict(
                    argmax=jnp.argmax(sim, axis=-1).astype(jnp.int32),
                    mask=out["inlier_mask"],
                    fine_xy=fine_xy,
                    score=out["coarse_pc_score"].astype(jnp.float32),
                )

            _, outs = jax.lax.scan(step, None, (stream, rr))
            return outs

        return jax.device_get(
            run(state.params, state.batch_stats, stream_host, rngs)
        )

    ref = outputs_for(
        base.replace(kpconv_dynamic_plan=None, kpconv_dynamic_plan_self=None)
    )
    print(
        f"static reference: {int(ref['mask'].sum())} selected superpoints "
        f"over {args.frames} frames"
    )

    results = {}
    for name in args.plans.split(","):
        if args.knn:
            cand = base.replace(kpconv_knn_window_plan=knn_catalog[name])
        else:
            plan, plan_self = catalog[name]
            cand = base.replace(
                kpconv_dynamic_plan=plan, kpconv_dynamic_plan_self=plan_self
            )
        out = outputs_for(cand)
        n_sp = ref["argmax"].size
        either = (ref["mask"] | out["mask"])
        n_sel = max(int(either.sum()), 1)
        argmax_drift = float((ref["argmax"] != out["argmax"]).mean())
        # drift among superpoints either config selected (the ones that
        # reach fine matching / RANSAC)
        argmax_drift_sel = float(
            ((ref["argmax"] != out["argmax"]) & either).sum() / n_sel
        )
        mask_drift = float((ref["mask"] != out["mask"]).mean())
        fine_moved = (
            np.abs(ref["fine_xy"] - out["fine_xy"]).max(axis=-1) > 1e-6
        )
        fine_drift_sel = float((fine_moved & either).sum() / n_sel)
        score_drift = float(np.abs(ref["score"] - out["score"]).max())
        results[name] = dict(
            argmax_drift=round(argmax_drift, 4),
            argmax_drift_selected=round(argmax_drift_sel, 4),
            mask_drift=round(mask_drift, 4),
            fine_drift_selected=round(fine_drift_sel, 4),
            score_drift=round(score_drift, 5),
        )
        print(
            f"{name:9s}: coarse-argmax drift {argmax_drift*100:5.2f}% "
            f"(selected {argmax_drift_sel*100:5.2f}%), mask drift "
            f"{mask_drift*100:5.2f}%, fine-cell drift (selected) "
            f"{fine_drift_sel*100:5.2f}%, max score drift {score_drift:.4f}"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
