"""Training step construction: loss wiring, optimizer, top-k validation.

Re-derivation of the reference training logic (/root/reference/train.py:
184-322) as one jitted function: on-device sample prep (pyramid + GT),
forward, the three losses, grads, Adam update — a single XLA program per
step.  Data parallelism is a sharding annotation on the batch (see
cofii2p_tpu.parallel.mesh), not a separate code path.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from cofii2p_tpu import losses
from cofii2p_tpu.config import Config
from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.models import CoFiI2P


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: Config):
    """Adam with an epoch-level step decay injected as a hyperparameter
    (reference: lr 1e-3, x0.25 every 5 epochs, floor 1e-5; train.py:156,
    325-330)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    lr = cfg.lr * (cfg.lr_decay_step ** (epoch // 5))
    return max(lr, cfg.min_lr)


def resume_epoch(cfg: Config, global_step: int, steps_per_epoch: int) -> int:
    """Epoch a restored run should continue from, derived from its step.

    Keeps `--ft_from` on the LR-decay schedule instead of restarting it at
    lr=cfg.lr / epoch 0 (the reference's --ft_from restores weights only and
    restarts, /root/reference/train.py:151-152, 325-330)."""
    return min(global_step // max(steps_per_epoch, 1), cfg.epoch)


def set_learning_rate(opt_state, lr: float):
    """Update the injected Adam learning rate (epoch-level step decay)."""
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": jnp.asarray(lr)}
    )


def batch_losses(cfg: Config, out: dict, batch: dict):
    """The three losses of train.py:224-283, batched."""
    s = cfg.num_superpoints
    h8, w8 = cfg.pe_H, cfg.pe_W

    pc_feat = out["pc_feature_norm"]  # (B, S, C)
    img_feat = out["img_feature_norm"].reshape(pc_feat.shape[0], h8 * w8, -1)

    kpt = batch["pc_kpt_idx"]  # (B, K)
    outl = batch["pc_outline_idx"]
    img_kpt = batch["coarse_img_kpt_idx"]  # (B, K)

    take = lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)
    pc_inline = take(pc_feat, kpt)  # (B, K, C)
    img_inline = take(img_feat, img_kpt)  # (B, K, C)

    # GT correspondence mask: project the selected superpoints with the GT
    # pose and compare against the image keypoints' grid coords
    superpoints = batch["points"][-1]  # (B, S, 3)
    pc_xyz = take(superpoints, kpt)  # (B, K, 3)
    P = batch["P"]  # (B, 4, 4) GT pose
    cam = jnp.einsum("bij,bkj->bki", P[:, :3, :3], pc_xyz) + P[:, None, :3, 3]
    uvw = jnp.einsum("bij,bkj->bki", batch["K_4"], cam)
    uv = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)
    img_x = (img_kpt % w8).astype(jnp.float32)
    img_y = (img_kpt // w8).astype(jnp.float32)
    img_xy = jnp.stack([img_x, img_y], axis=-1)  # (B, K, 2)
    d = jnp.linalg.norm(img_xy[:, :, None, :] - uv[:, None, :, :], axis=-1)
    corr_mask = (d <= cfg.dist_thres).astype(jnp.float32)  # (B, K, K)
    valid = batch["kpt_valid"].astype(jnp.float32)
    corr_mask = corr_mask * valid[:, :, None] * valid[:, None, :]

    loss_desc, dists = jax.vmap(
        functools.partial(
            losses.desc_loss,
            pos_margin=cfg.pos_margin,
            neg_margin=cfg.neg_margin,
        )
    )(jnp.swapaxes(img_inline, 1, 2), jnp.swapaxes(pc_inline, 1, 2), corr_mask)
    loss_desc = jnp.mean(loss_desc)

    score = out["coarse_pc_score"]  # (B, S)
    inline_score = jnp.take_along_axis(score, kpt, axis=1)
    outline_score = jnp.take_along_axis(score, outl, axis=1)
    loss_coarse = losses.overlap_loss(inline_score, outline_score)

    loss_fine = losses.fine_circle_loss(
        out["fine_img_patch"], out["fine_pc_feature"], batch["relative_index"]
    )
    return {
        "loss_desc": loss_desc,
        "loss_coarse": loss_coarse,
        "loss_fine": loss_fine,
        "loss": loss_desc + loss_coarse + loss_fine,
        "corr_mask": corr_mask,
        "dists": dists,
    }


def make_train_step(cfg: Config, model: CoFiI2P, tx, has_normals: bool = True):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, host_batch: dict, rng: jax.Array):
        prep_rng, model_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        batch = prepare_samples(
            host_batch["pc"],
            host_batch["attrs"],
            host_batch["P"],
            host_batch["K"],
            prep_rng,
            host_batch["img"],
            cfg,
            has_normals=has_normals,
        )

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                mode="train",
                train=True,
                mutable=["batch_stats"],
            )
            terms = batch_losses(cfg, out, batch)
            return terms["loss"], (mut["batch_stats"], terms)

        (loss, (new_stats, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": terms["loss"],
            "loss_desc": terms["loss_desc"],
            "loss_coarse": terms["loss_coarse"],
            "loss_fine": terms["loss_fine"],
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(cfg: Config, model: CoFiI2P, has_normals: bool = True):
    """Coarse top-k matching recall on a validation batch (the role of the
    reference's test_acc, train.py:27-106, without its Python loops)."""

    @jax.jit
    def eval_step(state: TrainState, host_batch: dict, rng: jax.Array):
        batch = prepare_samples(
            host_batch["pc"],
            host_batch["attrs"],
            host_batch["P"],
            host_batch["K"],
            rng,
            host_batch["img"],
            cfg,
            has_normals=has_normals,
        )
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            mode="val",
            train=False,
        )
        terms = batch_losses(cfg, out, batch)
        # top-k recall: a keypoint is recalled at k if one of its k nearest
        # image keypoints (by fused-feature distance) is a GT correspondence
        dists = terms["dists"]  # (B, K, K) img x pc
        mask = terms["corr_mask"]
        ranks = jnp.argsort(dists, axis=1)  # for each pc kpt, img kpts sorted
        recalls = {}
        valid = batch["kpt_valid"].astype(jnp.float32)  # (B, K)
        has_pos = jnp.sum(mask, axis=1) > 0  # (B, K) pc kpts with any GT match
        denom = jnp.maximum(jnp.sum(has_pos), 1)
        for k in (1, 2, 3, 4, 5):
            topk = ranks[:, :k, :]  # (B, k, K)
            hit = jnp.take_along_axis(mask, topk, axis=1).max(axis=1)  # (B, K)
            recalls[f"top{k}_recall"] = jnp.sum(hit * has_pos) / denom
        # fine-level recall: fraction of keypoints whose argmax fine-patch
        # cell (cosine similarity, as the reference computes it every
        # val_freq steps — /root/reference/train.py:271-281) equals the GT
        # relative_index.  The reference averages over all num_kpt; padded
        # keypoints don't exist there, so here invalid kpts are masked out.
        patch = out["fine_img_patch"]  # (B, K, 4, 4, C)
        cells = patch.reshape(*patch.shape[:-3], 16, -1)
        pcf = out["fine_pc_feature"]  # (B, K, C)
        nrm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )
        cos = jnp.einsum(
            "bkpc,bkc->bkp", nrm(cells), nrm(pcf),
            preferred_element_type=jnp.float32,
        )  # (B, K, 16)
        pred = jnp.argmax(cos, axis=-1)
        fine_hit = (pred == batch["relative_index"]).astype(jnp.float32)
        recalls["fine_recall"] = jnp.sum(fine_hit * valid) / jnp.maximum(
            jnp.sum(valid), 1
        )
        recalls["val_loss"] = terms["loss"]
        return recalls

    return eval_step


def init_state(cfg: Config, model: CoFiI2P, tx, rng, sample_host_batch, has_normals=True):
    """Initialize parameters from one host batch (shapes only)."""
    batch = prepare_samples(
        sample_host_batch["pc"],
        sample_host_batch["attrs"],
        sample_host_batch["P"],
        sample_host_batch["K"],
        jax.random.PRNGKey(0),
        sample_host_batch["img"],
        cfg,
        has_normals=has_normals,
    )
    variables = jax.jit(
        model.init, static_argnames=("mode", "train")
    )(rng, batch, mode="train", train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.asarray(0, jnp.int32))
