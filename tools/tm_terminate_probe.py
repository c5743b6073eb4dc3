"""Does the reference's fine_process decay loop terminate at 160x512 with
bridged random weights?  The loop (network.py:147-151) spins forever when
fewer than 4 superpoints survive the border mask even at thrs < 0 (the
set is monotone in thrs, so thrs=-1 is the limit).  This probe runs the
shared trunk ONCE per seed via a train-mode forward + hooks, then calls
the reference's own fine_process at thrs=-1 and reports the surviving
count and where the argmin image cells land (border collapse check)."""
import sys
import pathlib
import time

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_reference_parity import (  # noqa: E402
    TM_IMG_H,
    TM_IMG_W,
    _build_inputs,
    _torch_inputs,
)
from tests.reference_bridge import load_reference, make_reference_model  # noqa: E402
from cofii2p_tpu.config import TinyConfig  # noqa: E402

load_reference()
from model.network import fine_process  # noqa: E402

cfg = TinyConfig(
    img_H=TM_IMG_H, img_W=TM_IMG_W, kpconv_impl="gather",
    kpconv_kernel="xla", kpconv_shared_influence=False,
)

for mseed in (0, 1):
    model_t, _ = make_reference_model(
        img_H=TM_IMG_H, img_W=TM_IMG_W, seed=mseed
    )
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for name, buf in model_t.named_buffers():
            if name.endswith("kernel_points"):
                buf.add_(0.01 * torch.randn(buf.shape, generator=g))

    for seed in (5, 6, 7):
        pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=seed)
        pc_data_dict, img_t, centers_t, fine_idx_t = _torch_inputs(
            pyr, feats, img, centers, fine_idx
        )
        t0 = time.time()
        with torch.no_grad():
            (
                img_feature_norm, pc_feature_norm, _cis, coarse_pc_score,
                _p, _f, _, _,
            ) = model_t(
                pc_data_dict, img_t, centers_t, None, fine_idx_t, "train"
            )
        with torch.no_grad():
            coarse_xy, idx = fine_process(
                coarse_pc_score, pc_feature_norm, img_feature_norm,
                thrs=-1.0,
            )
        # where do the argmin cells land overall (no threshold)?
        imgf = img_feature_norm.squeeze(0).reshape(
            img_feature_norm.size(1), -1
        )
        dist = 1 - torch.einsum("cp,cn->pn", imgf, pc_feature_norm)
        corr = dist.argmin(dim=0)
        W = img_feature_norm.size(-1)
        xs, ys = (corr % W).float(), (corr // W).float()
        interior = (
            (xs >= 2) & (xs <= 62) & (ys >= 2) & (ys <= 18)
        ).float().mean()
        print(
            f"model_seed={mseed} in_seed={seed}: survivors@thrs=-1 "
            f"{idx.numel()}, interior frac {interior:.3f}, unique cells "
            f"{corr.unique().numel()}, fwd {time.time()-t0:.0f}s",
            flush=True,
        )
