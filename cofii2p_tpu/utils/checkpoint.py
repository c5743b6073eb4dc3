"""Checkpointing: full training state (params + opt_state + batch_stats +
step), plus a torch ``.t7`` state_dict importer for parity evaluation with
the reference's released weights.

The reference saves bare ``state_dict`` per epoch and resumes weights-only
(/root/reference/train.py:151-152, 334); here resume restores the optimizer
and step too (SURVEY.md §5 checkpoint/resume gap).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any):
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])


# ---------------------------------------------------------------------------
# torch .t7 importer
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)


def import_t7(path: str, params: dict, batch_stats: dict) -> tuple[dict, dict]:
    """Map a reference CoFiI2P ``state_dict`` onto our param pytree.

    Layout mapping (torch -> flax):
      conv weight (O,I,kh,kw) -> (kh,kw,I,O); linear weight (O,I) -> (I,O);
      KPConv weights (K,I,O) kept as-is.  InstanceNorm layers carry no
      parameters on either side.  The unused fine positional-encoding MLPs in
      the reference checkpoint (network.py:36-37) are skipped.

    Returns (params, batch_stats) with imported values.  Raises KeyError on
    any of our parameters that cannot be matched, so silent partial imports
    are impossible.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    used = set()

    def take(name: str, kind: str) -> np.ndarray:
        if name not in sd:
            raise KeyError(f"reference checkpoint is missing {name}")
        used.add(name)
        w = _t(sd[name])
        if kind == "conv":
            return np.transpose(w, (2, 3, 1, 0))
        if kind == "linear":
            return w.T
        return w

    def set_in(tree, path_, val):
        node = tree
        for p in path_[:-1]:
            node = node[p]
        cur = node[path_[-1]]
        if cur.shape != val.shape:
            raise ValueError(f"{path_}: shape {cur.shape} vs import {val.shape}")
        node[path_[-1]] = val.astype(cur.dtype)

    # ---- image encoder (ResNet-34; torch prefix img_encoder.backbone.) ----
    pre = "img_encoder.backbone."
    set_in(params, ("img_encoder", "conv1", "Conv_0", "kernel"), take(pre + "conv1.weight", "conv"))
    stage_sizes = [3, 4, 6, 3]
    for s, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            tb = f"{pre}layer{s+1}.{b}."
            fb = ("img_encoder", f"layer{s+1}_{b}")
            set_in(params, fb + ("conv1", "Conv_0", "kernel"), take(tb + "conv1.weight", "conv"))
            set_in(params, fb + ("conv2", "Conv_0", "kernel"), take(tb + "conv2.weight", "conv"))
            if tb + "downsample.0.weight" in sd:
                set_in(params, fb + ("downsample", "Conv_0", "kernel"), take(tb + "downsample.0.weight", "conv"))

    # ---- pc feature head (network.py:29: Sequential indices 0,1,3,4,6) ----
    head = ("pc_feature_layer",)
    seq = [("0", "Linear_0", True), ("3", "Linear_1", True), ("6", "Linear_2", False)]
    for tidx, fname, has_ln in seq:
        set_in(params, head + (fname, "Dense_0", "kernel"), take(f"pc_feature_layer.{tidx}.weight", "linear"))
    for tidx, fname in [("1", "LayerNorm_0"), ("4", "LayerNorm_1")]:
        set_in(params, head + (fname, "scale"), take(f"pc_feature_layer.{tidx}.weight", "raw"))
        set_in(params, head + (fname, "bias"), take(f"pc_feature_layer.{tidx}.bias", "raw"))

    # ---- score heads (1x1 convs == dense over channels) ----
    for tname, fname in [("pc_score_layer", "pc_score_layer"), ("img_score_layer", "img_score_layer")]:
        for tidx, fidx in [("0", "Linear_0"), ("3", "Linear_1"), ("6", "Linear_2")]:
            w = take(f"{tname}.{tidx}.weight", "raw")
            w = w.reshape(w.shape[0], w.shape[1]).T  # (O,I,1[,1]) -> (I,O)
            set_in(params, (fname, fidx, "Dense_0", "kernel"), w)

    # ---- transformer ----
    for i in range(8):
        tb = f"transformer.layers.{i}."
        fb = ("transformer", f"layer{i}")
        for nm in ["q_proj", "k_proj", "v_proj", "merge"]:
            set_in(params, fb + (nm, "kernel"), take(tb + nm + ".weight", "linear"))
        set_in(params, fb + ("mlp1", "kernel"), take(tb + "mlp.0.weight", "linear"))
        set_in(params, fb + ("mlp2", "kernel"), take(tb + "mlp.2.weight", "linear"))
        for tn, fn in [("norm1", "norm1"), ("norm2", "norm2")]:
            set_in(params, fb + (fn, "scale"), take(tb + tn + ".weight", "raw"))
            set_in(params, fb + (fn, "bias"), take(tb + tn + ".bias", "raw"))

    # ---- image upsample decoders (ResidualConv pairs with BatchNorm) ----
    for t_up, f_up in [("img_upsample_1", "img_upsample_1"), ("img_upsample_2", "img_upsample_2")]:
        for t_res, f_res in [("conv.0", "res1"), ("conv.1", "res2")]:
            tb = f"{t_up}.{t_res}."
            fb = (f_up, f_res)
            set_in(params, fb + ("conv1", "Conv_0", "kernel"), take(tb + "conv1.weight", "conv"))
            set_in(params, fb + ("conv2", "Conv_0", "kernel"), take(tb + "conv2.weight", "conv"))
            set_in(params, fb + ("conv_skip", "Conv_0", "kernel"), take(tb + "conv_skip.0.weight", "conv"))
            for tbn, fbn in [("bn1", "bn1"), ("bn2", "bn2"), ("conv_skip.1", "bn_skip")]:
                set_in(params, fb + (fbn, "scale"), take(tb + tbn + ".weight", "raw"))
                set_in(params, fb + (fbn, "bias"), take(tb + tbn + ".bias", "raw"))
                set_in(batch_stats, fb + (fbn, "mean"), take(tb + tbn + ".running_mean", "raw"))
                set_in(batch_stats, fb + (fbn, "var"), take(tb + tbn + ".running_var", "raw"))

    # ---- KPConv FPN ----
    def unary(fpath, tpath):
        set_in(params, fpath + ("mlp", "Dense_0", "kernel"), take(tpath + "mlp.weight", "linear"))
        set_in(params, fpath + ("mlp", "Dense_0", "bias"), take(tpath + "mlp.bias", "raw"))
        if tpath + "norm.norm.weight" in sd:
            set_in(params, fpath + ("PointGroupNorm_0", "scale"), take(tpath + "norm.norm.weight", "raw"))
            set_in(params, fpath + ("PointGroupNorm_0", "bias"), take(tpath + "norm.norm.bias", "raw"))

    def kpconv(fpath, tpath):
        set_in(params, fpath + ("weights",), take(tpath + "weights", "raw"))
        # each reference KPConv registers its own rotated/jittered disposition
        # buffer and load_state_dict restores it (reference kpconv.py:64-65),
        # so the released weights are tied to these per-layer kernel points
        set_in(params, fpath + ("kernel_points",), take(tpath + "kernel_points", "raw"))
        if tpath + "bias" in sd:
            set_in(params, fpath + ("bias",), take(tpath + "bias", "raw"))

    def gn(fpath, wrapper_prefix):
        # wrapper_prefix names the reference GroupNorm *wrapper* module
        # ("encoder1_1.norm" for ConvBlock, "...norm_conv" for ResidualBlock);
        # its inner nn.GroupNorm is attribute .norm (modules.py:43)
        set_in(params, fpath + ("scale",), take(wrapper_prefix + ".norm.weight", "raw"))
        set_in(params, fpath + ("bias",), take(wrapper_prefix + ".norm.bias", "raw"))

    pe = "pc_encoder."
    fpe = ("pc_encoder",)
    kpconv(fpe + ("encoder1_1", "KPConv"), pe + "encoder1_1.KPConv.")
    gn(fpe + ("encoder1_1", "PointGroupNorm_0"), pe + "encoder1_1.norm")
    res_names = ["encoder1_2"] + [
        f"encoder{s}_{i}" for s in range(2, 6) for i in range(1, 4)
    ]
    for nm in res_names:
        tb = pe + nm + "."
        fb = fpe + (nm,)
        if tb + "unary1.mlp.weight" in sd:
            unary(fb + ("unary1",), tb + "unary1.")
        kpconv(fb + ("KPConv",), tb + "KPConv.")
        gn(fb + ("PointGroupNorm_0",), tb + "norm_conv")
        unary(fb + ("unary2",), tb + "unary2.")
        if tb + "unary_shortcut.mlp.weight" in sd:
            unary(fb + ("unary_shortcut",), tb + "unary_shortcut.")
    unary(fpe + ("decoder4",), pe + "decoder4.")
    unary(fpe + ("decoder3",), pe + "decoder3.")
    set_in(params, fpe + ("decoder2", "Dense_0", "kernel"), take(pe + "decoder2.mlp.weight", "linear"))
    set_in(params, fpe + ("decoder2", "Dense_0", "bias"), take(pe + "decoder2.mlp.bias", "raw"))

    unused = {k for k in sd if k not in used}
    globals()["_last_unused"] = unused  # introspection for tests
    # Expected unused: parameters the reference registers but never uses in
    # forward — the never-called fine positional MLPs (network.py:36-37), the
    # commented-out img_feature_layer convs (network.py:31, usage commented
    # at :120), the torchvision ResNet classifier head (imagenet.py fc, the
    # encoder stops at the feature pyramid) — plus BatchNorm bookkeeping.
    _expected_unused = (
        "fine_img_pos_encoding",
        "fine_pc_pos_encoding",
        "num_batches_tracked",
        "img_feature_layer.",
        "img_encoder.backbone.fc.",
    )
    unexpected = {
        k for k in unused if not any(tag in k for tag in _expected_unused)
    }
    if unexpected:
        raise KeyError(f"unmapped reference parameters: {sorted(unexpected)[:10]}...")
    return params, batch_stats


def export_t7(params: dict, batch_stats: dict, path: str):
    """Inverse of :func:`import_t7`: write our params as a reference-layout
    torch ``state_dict`` (reference module naming, torch tensor layouts).

    Lets users move weights trained here back into the reference codebase,
    and gives the importer a round-trip test target.
    """
    import torch

    sd = {}

    def put(name: str, arr: np.ndarray, kind: str):
        arr = np.asarray(arr)
        if kind == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))
        elif kind == "linear":
            arr = arr.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(arr))

    def get(tree, path_):
        node = tree
        for p in path_:
            node = node[p]
        return node

    # image encoder
    put("img_encoder.backbone.conv1.weight", get(params, ("img_encoder", "conv1", "Conv_0", "kernel")), "conv")
    for s, blocks in enumerate([3, 4, 6, 3]):
        for b in range(blocks):
            fb = ("img_encoder", f"layer{s+1}_{b}")
            tb = f"img_encoder.backbone.layer{s+1}.{b}."
            put(tb + "conv1.weight", get(params, fb + ("conv1", "Conv_0", "kernel")), "conv")
            put(tb + "conv2.weight", get(params, fb + ("conv2", "Conv_0", "kernel")), "conv")
            try:
                put(tb + "downsample.0.weight", get(params, fb + ("downsample", "Conv_0", "kernel")), "conv")
            except KeyError:
                pass

    # pc feature head
    for tidx, fname in [("0", "Linear_0"), ("3", "Linear_1"), ("6", "Linear_2")]:
        put(f"pc_feature_layer.{tidx}.weight", get(params, ("pc_feature_layer", fname, "Dense_0", "kernel")), "linear")
    for tidx, fname in [("1", "LayerNorm_0"), ("4", "LayerNorm_1")]:
        put(f"pc_feature_layer.{tidx}.weight", get(params, ("pc_feature_layer", fname, "scale")), "raw")
        put(f"pc_feature_layer.{tidx}.bias", get(params, ("pc_feature_layer", fname, "bias")), "raw")

    # score heads: 1x1 convs stored as (O, I, 1) / (O, I, 1, 1) in torch; we
    # export the Conv1d layout the reference pc head uses and the Conv2d
    # layout for the image head
    for fname, tname, rank in [("pc_score_layer", "pc_score_layer", 3), ("img_score_layer", "img_score_layer", 4)]:
        for fidx, tidx in [("Linear_0", "0"), ("Linear_1", "3"), ("Linear_2", "6")]:
            w = np.asarray(get(params, (fname, fidx, "Dense_0", "kernel"))).T  # (O, I)
            w = w.reshape(w.shape + (1,) * (rank - 2))
            sd[f"{tname}.{tidx}.weight"] = __import__("torch").from_numpy(np.ascontiguousarray(w))

    # transformer
    for i in range(len(params["transformer"])):
        fb = ("transformer", f"layer{i}")
        tb = f"transformer.layers.{i}."
        for nm in ["q_proj", "k_proj", "v_proj", "merge"]:
            put(tb + nm + ".weight", get(params, fb + (nm, "kernel")), "linear")
        put(tb + "mlp.0.weight", get(params, fb + ("mlp1", "kernel")), "linear")
        put(tb + "mlp.2.weight", get(params, fb + ("mlp2", "kernel")), "linear")
        for nm in ["norm1", "norm2"]:
            put(tb + nm + ".weight", get(params, fb + (nm, "scale")), "raw")
            put(tb + nm + ".bias", get(params, fb + (nm, "bias")), "raw")

    # image upsample decoders
    for f_up in ["img_upsample_1", "img_upsample_2"]:
        for f_res, t_res in [("res1", "conv.0"), ("res2", "conv.1")]:
            fb = (f_up, f_res)
            tb = f"{f_up}.{t_res}."
            put(tb + "conv1.weight", get(params, fb + ("conv1", "Conv_0", "kernel")), "conv")
            put(tb + "conv2.weight", get(params, fb + ("conv2", "Conv_0", "kernel")), "conv")
            put(tb + "conv_skip.0.weight", get(params, fb + ("conv_skip", "Conv_0", "kernel")), "conv")
            for fbn, tbn in [("bn1", "bn1"), ("bn2", "bn2"), ("bn_skip", "conv_skip.1")]:
                put(tb + tbn + ".weight", get(params, fb + (fbn, "scale")), "raw")
                put(tb + tbn + ".bias", get(params, fb + (fbn, "bias")), "raw")
                put(tb + tbn + ".running_mean", get(batch_stats, fb + (fbn, "mean")), "raw")
                put(tb + tbn + ".running_var", get(batch_stats, fb + (fbn, "var")), "raw")

    # KPConv FPN
    def unary_out(fpath, tpath):
        put(tpath + "mlp.weight", get(params, fpath + ("mlp", "Dense_0", "kernel")), "linear")
        put(tpath + "mlp.bias", get(params, fpath + ("mlp", "Dense_0", "bias")), "raw")
        try:
            put(tpath + "norm.norm.weight", get(params, fpath + ("PointGroupNorm_0", "scale")), "raw")
            put(tpath + "norm.norm.bias", get(params, fpath + ("PointGroupNorm_0", "bias")), "raw")
        except KeyError:
            pass

    pe, fpe = "pc_encoder.", ("pc_encoder",)
    put(pe + "encoder1_1.KPConv.weights", get(params, fpe + ("encoder1_1", "KPConv", "weights")), "raw")
    put(pe + "encoder1_1.KPConv.kernel_points", get(params, fpe + ("encoder1_1", "KPConv", "kernel_points")), "raw")
    put(pe + "encoder1_1.KPConv.bias", get(params, fpe + ("encoder1_1", "KPConv", "bias")), "raw")
    put(pe + "encoder1_1.norm.norm.weight", get(params, fpe + ("encoder1_1", "PointGroupNorm_0", "scale")), "raw")
    put(pe + "encoder1_1.norm.norm.bias", get(params, fpe + ("encoder1_1", "PointGroupNorm_0", "bias")), "raw")
    res_names = ["encoder1_2"] + [f"encoder{s}_{i}" for s in range(2, 6) for i in range(1, 4)]
    for nm in res_names:
        fb, tb = fpe + (nm,), pe + nm + "."
        if "unary1" in params["pc_encoder"][nm]:
            unary_out(fb + ("unary1",), tb + "unary1.")
        put(tb + "KPConv.weights", get(params, fb + ("KPConv", "weights")), "raw")
        put(tb + "KPConv.kernel_points", get(params, fb + ("KPConv", "kernel_points")), "raw")
        put(tb + "KPConv.bias", get(params, fb + ("KPConv", "bias")), "raw")
        put(tb + "norm_conv.norm.weight", get(params, fb + ("PointGroupNorm_0", "scale")), "raw")
        put(tb + "norm_conv.norm.bias", get(params, fb + ("PointGroupNorm_0", "bias")), "raw")
        unary_out(fb + ("unary2",), tb + "unary2.")
        if "unary_shortcut" in params["pc_encoder"][nm]:
            unary_out(fb + ("unary_shortcut",), tb + "unary_shortcut.")
    unary_out(fpe + ("decoder4",), pe + "decoder4.")
    unary_out(fpe + ("decoder3",), pe + "decoder3.")
    put(pe + "decoder2.mlp.weight", get(params, fpe + ("decoder2", "Dense_0", "kernel")), "linear")
    put(pe + "decoder2.mlp.bias", get(params, fpe + ("decoder2", "Dense_0", "bias")), "raw")

    import torch

    torch.save(sd, path)
    return sd
