"""Evaluation CLI: ``python -m cofii2p_tpu.evaluation.eval_all <ckpt>
{kitti|nuscenes} [--eval_path ...]``.

CLI- and output-compatible with the reference evaluator
(/root/reference/evaluation/eval_all.py:24-139): per-frame ``.npy`` dumps
into ``<eval_path>/<dataset>/<timestamp>/`` and the aggregate
``{dataset}_t_error.npy`` / ``{dataset}_r_error.npy`` arrays consumed by
calc_result / IR_RMSE.  Accepts ``--synthetic`` and ``--batch_size`` (the
pipeline is batched on device; the reference is frame-by-frame with a host
PnP round-trip).

``<ckpt>`` may be an orbax checkpoint directory (ours) or a torch ``.t7``
state_dict (the reference's released weights, imported via
utils.checkpoint.import_t7).
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import numpy as np

from cofii2p_tpu.config import apply_overrides, get_config
from cofii2p_tpu.data.loader import BatchLoader
from cofii2p_tpu.evaluation.pipeline import make_eval_pipeline, pose_errors_np
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu import train_lib
from cofii2p_tpu.utils.checkpoint import import_t7, restore_checkpoint
from cofii2p_tpu.utils.metrics import setup_logger


def load_weights(ckpt: str, cfg, model, sample_host_batch, has_normals):
    tx = train_lib.make_optimizer(cfg)
    state = train_lib.init_state(
        cfg, model, tx, jax.random.PRNGKey(0), sample_host_batch, has_normals
    )
    if ckpt in ("none", "random", ""):
        return state.params, state.batch_stats  # random init (smoke runs)
    if ckpt.endswith(".t7") or ckpt.endswith(".pth"):
        params, batch_stats = import_t7(ckpt, jax.device_get(state.params),
                                        jax.device_get(state.batch_stats))
        return params, batch_stats
    state = restore_checkpoint(ckpt, state)
    return state.params, state.batch_stats


def reference_ckpt_config(cfg, overrides):
    """Auto-selection for reference ``.t7``/``.pth`` checkpoints (explicit
    ``key=value`` overrides always win):

    - ``kpconv_impl='banded_knn'`` — the weights were trained with kNN
      neighborhoods; this is reference kNN semantics on the banded machinery
      (tests/test_banded_knn.py proves it equal to the gather parity path at
      full band coverage).  ``kpconv_impl=gather`` overrides to the exact
      index-map formulation for spot parity checks (~10x slower).
    - ``kpconv_shared_influence=False`` — each reference layer carries its
      own rotated/jittered kernel disposition buffer.
    - ``fine_decode='reference'`` — the published RRE/RTE were measured with
      the reference's SWAPPED fine decode
      (/root/reference/evaluation/eval_all.py:104-105), so a reproduction
      must use it too; ``fine_decode=label`` stays available (PARITY.md).
    """
    keyed = {o.split("=", 1)[0] for o in overrides if "=" in o}
    if "kpconv_impl" not in keyed:
        cfg = cfg.replace(kpconv_impl="banded_knn")
    if "kpconv_shared_influence" not in keyed:
        cfg = cfg.replace(kpconv_shared_influence=False)
    if "fine_decode" not in keyed:
        cfg = cfg.replace(fine_decode="reference")
    if "attention" not in keyed and jax.default_backend() == "tpu":
        # flash-style fused attention kernel — same math as 'full' (softmax
        # fp32, bit-equal in interpret mode, rtol 1e-4 on TPU), 2x the
        # transformer throughput (tools/tf_micro round 5); eval-only, which
        # this path always is
        cfg = cfg.replace(attention="pallas")
    return cfg


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Image-to-Point Cloud Registration evaluation (TPU)"
    )
    parser.add_argument("ckpt", type=str)
    parser.add_argument("dataset", type=str)
    parser.add_argument("--eval_path", type=str, default="eval_results")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_frames", type=int, default=32)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(get_config(args.dataset), args.overrides)
    if args.ckpt.endswith((".t7", ".pth")):
        cfg = reference_ckpt_config(cfg, args.overrides)
    logger = setup_logger()

    from cofii2p_tpu.train import build_dataset

    dataset = build_dataset(
        args.dataset, cfg, "val", args.synthetic, args.synthetic_frames
    )
    assert len(dataset) > 0
    has_normals = getattr(dataset, "has_normals", True)
    loader = BatchLoader(
        dataset, args.batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers, to_device=True,
    )

    model = CoFiI2P(cfg)
    first = next(loader.epoch(0))
    params, batch_stats = load_weights(args.ckpt, cfg, model, first, has_normals)
    pipeline = make_eval_pipeline(cfg, model, has_normals)

    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    eval_path = os.path.join(args.eval_path, args.dataset, ts)
    os.makedirs(eval_path, exist_ok=True)

    rng = jax.random.PRNGKey(7)
    t_errs, r_errs = [], []
    success_num = 0
    frame = 0
    done = False
    for host_batch in loader.epoch(0):
        out = jax.device_get(
            pipeline(params, batch_stats, host_batch, jax.random.fold_in(rng, frame))
        )
        b = out.R.shape[0]
        for i in range(b):
            T_pred = np.eye(4, dtype=np.float64)
            T_pred[:3, :3] = out.R[i]
            T_pred[:3, 3] = out.t[i]
            P_gt = np.asarray(out.P_gt[i], np.float64)
            if bool(out.success[i]):
                success_num += 1
                t_diff, r_diff = pose_errors_np(T_pred, P_gt)
                t_errs.append(t_diff)
                r_errs.append(r_diff)
                logger.info("%d r=%.4f t=%.4f inl=%d", frame, r_diff, t_diff,
                            int(out.num_inliers[i]))
            K2 = np.asarray(host_batch["K"][i]) * 0.5  # PnP intrinsics (/2 image)
            K2[2, 2] = 1.0
            np.save(
                os.path.join(eval_path, "%06d.npy" % frame),
                {
                    "GT_P": P_gt,
                    "pred_P": T_pred,
                    "K": K2,
                    "fine_xy": np.asarray(out.fine_xy[i]).T,
                    "corr_mask": np.asarray(out.corr_mask[i]),
                    "object_points": np.asarray(out.object_points[i]),
                    "superpoints_score": np.asarray(out.pc_score[i]),
                },
            )
            frame += 1
            if args.max_frames and frame >= args.max_frames:
                done = True
                break
        if done:
            break

    t_errs = np.asarray(t_errs)
    r_errs = np.asarray(r_errs)
    print(f"success num / total num: {success_num}/{frame}")
    if len(r_errs):
        print(np.mean(r_errs), np.mean(t_errs))
    np.save(f"{args.dataset}_t_error.npy", t_errs)
    np.save(f"{args.dataset}_r_error.npy", r_errs)
    return r_errs, t_errs


if __name__ == "__main__":
    main()
