"""Training CLI: ``python -m cofii2p_tpu.train {kitti|nuscenes} [options]``.

CLI-compatible with the reference entry point (``python -m train kitti
[--ft_from ckpt]``, /root/reference/train.py:110-124) plus:
``--synthetic`` (no dataset on disk needed), ``--steps`` (cap for smokes),
``--batch_size`` (data parallelism over the device mesh — absent in the
reference, which is single-GPU batch-1), and ``key=value`` config overrides.
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import numpy as np

from cofii2p_tpu.config import apply_overrides, get_config, with_fast_windows
from cofii2p_tpu.data.loader import BatchLoader
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.parallel.mesh import make_mesh, shard_host_batch
from cofii2p_tpu import train_lib
from cofii2p_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from cofii2p_tpu.utils.metrics import MetricWriter, setup_logger


def build_dataset(name: str, cfg, mode: str, synthetic: bool, length: int = 64):
    if synthetic:
        from cofii2p_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(cfg, mode, length=length)
    if name == "kitti":
        from cofii2p_tpu.data.kitti import KittiDataset

        return KittiDataset(cfg, mode)
    if name == "nuscenes":
        from cofii2p_tpu.data.nuscenes import NuScenesDataset

        return NuScenesDataset(cfg, mode)
    raise ValueError(name)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Image-to-Point Cloud Registration (CoFiI2P, TPU-native)"
    )
    parser.add_argument("dataset", type=str, help="kitti | nuscenes | tiny")
    parser.add_argument("--ft_from", type=str, help="fine-tune from checkpoint")
    parser.add_argument("--synthetic", action="store_true", help="synthetic data")
    parser.add_argument("--steps", type=int, default=0, help="stop after N steps")
    parser.add_argument("--batch_size", type=int, default=0, help="global batch")
    parser.add_argument("--synthetic_frames", type=int, default=64)
    parser.add_argument("--ckpt_every_steps", type=int, default=0)
    parser.add_argument(
        "--ckpt_every_epochs", type=int, default=1,
        help="save cadence in epochs (reference saves every epoch)",
    )
    parser.add_argument(
        "--fast", action="store_true",
        help="train with the accuracy-gated w256 dynamic windows "
        "(config.FAST_DYNAMIC_PLAN; ~1.5x step speedup, PERF.md round-4 "
        "trained-quality gate); explicit kpconv_dynamic_plan= overrides win",
    )
    parser.add_argument("overrides", nargs="*", help="config key=value overrides")
    args = parser.parse_args(argv)

    cfg = apply_overrides(get_config(args.dataset), args.overrides)
    if args.fast:
        cfg = with_fast_windows(cfg)
    batch_size = args.batch_size or cfg.train_batch_size

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if batch_size % n_dev and batch_size > 1:
        raise ValueError(f"batch_size {batch_size} not divisible by {n_dev} devices")

    ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    save_dir = os.path.join(cfg.root_path, cfg.save_path, args.dataset, ts)
    log_dir = os.path.join(cfg.root_path, cfg.log_path, args.dataset, ts)
    logger = setup_logger(log_dir)
    writer = MetricWriter(log_dir)
    logger.info("config: %s", cfg)
    logger.info("devices: %s", jax.devices())

    train_ds = build_dataset(
        args.dataset, cfg, "train", args.synthetic, args.synthetic_frames
    )
    val_ds = build_dataset(
        args.dataset, cfg, "val", args.synthetic, max(args.synthetic_frames // 4, 8)
    )
    assert len(train_ds) > 0 and len(val_ds) > 0
    train_loader = BatchLoader(
        train_ds, batch_size, shuffle=True, num_workers=cfg.num_workers
    )
    val_loader = BatchLoader(
        val_ds, batch_size, shuffle=False, num_workers=cfg.num_workers
    )

    model = CoFiI2P(cfg)
    tx = train_lib.make_optimizer(cfg)
    has_normals = getattr(train_ds, "has_normals", True)
    train_step = train_lib.make_train_step(cfg, model, tx, has_normals)
    eval_step = train_lib.make_eval_step(cfg, model, has_normals)

    first = next(train_loader.epoch(0))
    rng = jax.random.PRNGKey(42)
    state = train_lib.init_state(cfg, model, tx, rng, shard_host_batch(first, mesh), has_normals)
    if args.ft_from:
        state = restore_checkpoint(args.ft_from, state)
        logger.info("restored %s at step %d", args.ft_from, int(state.step))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info("parameters: %.2fM", n_params / 1e6)

    global_step = int(state.step)
    last_saved = -1
    stop = False
    # Resume continues the schedule (LR-decay position + epoch count) instead
    # of restarting it; see train_lib.resume_epoch.
    start_epoch = train_lib.resume_epoch(cfg, global_step, len(train_loader))
    for epoch in range(start_epoch, cfg.epoch):
        lr = train_lib.lr_for_epoch(cfg, epoch)
        state = state._replace(
            opt_state=train_lib.set_learning_rate(state.opt_state, lr)
        )
        for host_batch in train_loader.epoch(epoch):
            host_batch = shard_host_batch(host_batch, mesh)
            state, metrics = train_step(state, host_batch, rng)
            global_step += 1
            if global_step % 10 == 0:
                m = jax.device_get(metrics)
                writer.write(global_step, m)
                logger.info(
                    "train-%d-%d loss %.4f desc %.4f coarse %.4f fine %.4f",
                    epoch, global_step, m["loss"], m["loss_desc"],
                    m["loss_coarse"], m["loss_fine"],
                )
            if global_step % cfg.val_freq == 0:
                accs = []
                for i, vb in enumerate(val_loader.epoch(0)):
                    if i >= 6:
                        break
                    accs.append(
                        jax.device_get(
                            eval_step(state, shard_host_batch(vb, mesh), rng)
                        )
                    )
                mean = {k: float(np.mean([a[k] for a in accs])) for k in accs[0]}
                writer.write(global_step, mean)
                logger.info("val @%d: %s", global_step, mean)
            if args.ckpt_every_steps and global_step % args.ckpt_every_steps == 0:
                save_checkpoint(save_dir, global_step, state)
                last_saved = global_step
            if args.steps and global_step >= args.steps:
                stop = True
                break
        # a step-cadence save may have just written this step — orbax
        # refuses to overwrite, so don't double-save it at the epoch/stop
        # boundary (hit at exactly --steps % --ckpt_every_steps == 0)
        if (stop or (epoch + 1) % max(args.ckpt_every_epochs, 1) == 0) and (
            global_step != last_saved
        ):
            path = save_checkpoint(save_dir, global_step, state)
            logger.info("saved %s", path)
        if stop:
            break
    writer.close()
    return save_dir


if __name__ == "__main__":
    main()
