"""Stage timing for the test-mode parity test at 160x512 (CPU, eager).

Identifies which stage of tests/test_reference_parity.py::
test_e2e_test_mode_parity burns the hours its docstring promised would be
minutes.  Prints a wall-clock line per stage as it completes.
"""
import sys
import time
import tempfile
import pathlib

t0 = time.time()


def mark(name):
    print(f"[{time.time() - t0:8.1f}s] {name}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import torch  # noqa: E402

mark("imports")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tests.test_reference_parity import (  # noqa: E402
    TM_IMG_H,
    TM_IMG_W,
    _bridged_params,
    _build_inputs,
    _our_batch,
    _torch_inputs,
)
from tests.reference_bridge import make_reference_model  # noqa: E402
from cofii2p_tpu.config import TinyConfig  # noqa: E402

cfg = TinyConfig(
    img_H=TM_IMG_H,
    img_W=TM_IMG_W,
    kpconv_impl="gather",
    kpconv_kernel="xla",
    kpconv_shared_influence=False,
)
mark("config")

model_t, _ = make_reference_model(img_H=TM_IMG_H, img_W=TM_IMG_W, seed=0)
g = torch.Generator().manual_seed(123)
with torch.no_grad():
    for name, buf in model_t.named_buffers():
        if name.endswith("kernel_points"):
            buf.add_(0.01 * torch.randn(buf.shape, generator=g))
mark("torch reference model built")

pyr, feats, img, centers, fine_idx = _build_inputs(cfg, seed=5)
batch = _our_batch(pyr, feats, img, centers, fine_idx)
mark("inputs + pyramid")

tmp = pathlib.Path(tempfile.mkdtemp())
with jax.disable_jit():
    model, params, stats = _bridged_params(tmp, model_t, cfg, batch)
    mark("bridged params (eager init + import_t7)")
    out = jax.device_get(
        model.apply(
            {"params": params, "batch_stats": stats}, batch,
            mode="test", train=False,
        )
    )
    mark("our eager test-mode apply")

pc_data_dict, img_t, _, _ = _torch_inputs(pyr, feats, img, centers, fine_idx)
with torch.no_grad():
    ref_out = model_t(pc_data_dict, img_t, None, None, None, "test")
mark("torch reference test-mode forward")
print("selected:", int(np.asarray(out["inlier_mask"][0]).sum()),
      "ref:", ref_out[7].shape[0])
