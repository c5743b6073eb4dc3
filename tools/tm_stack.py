"""Dump the torch reference's stack during the test-mode forward at
160x512 (the stage tm_profile showed consuming hours): faulthandler
prints all thread stacks every 60s so the hot frame is visible."""
import faulthandler
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
from tests.reference_bridge import make_reference_model  # noqa: E402
from cofii2p_tpu.config import TinyConfig  # noqa: E402

cfg = TinyConfig(
    img_H=TM_IMG_H, img_W=TM_IMG_W, kpconv_impl="gather",
    kpconv_kernel="xla", kpconv_shared_influence=False,
)
model_t, _ = make_reference_model(img_H=TM_IMG_H, img_W=TM_IMG_W, seed=0)
g = torch.Generator().manual_seed(123)
with torch.no_grad():
    for name, buf in model_t.named_buffers():
        if name.endswith("kernel_points"):
            buf.add_(0.01 * torch.randn(buf.shape, generator=g))

pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=5)
pc_data_dict, img_t, _, _ = _torch_inputs(pyr, feats, img, centers, fine_idx)
print("inputs ready", flush=True)

faulthandler.dump_traceback_later(60, repeat=True)
t0 = time.time()
with torch.no_grad():
    ref_out = model_t(pc_data_dict, img_t, None, None, None, "test")
faulthandler.cancel_dump_traceback_later()
print(f"torch test-mode forward done in {time.time() - t0:.1f}s; "
      f"selected {ref_out[7].shape[0]}", flush=True)
