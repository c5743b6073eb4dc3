"""CPU repro of the drive_r3 dyn-maxpool Pallas-vs-XLA mismatch.

Runs the exact drive_r3 section-2 shapes in interpret mode, with
_FORCE_CHUNKS mimicking the TPU chunking (cc=128, bch=128), to decide
whether the mismatch is semantic (reproduces here) or Mosaic-specific.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cofii2p_tpu.ops import maxpool_kernel as mk
from cofii2p_tpu.ops.banded import (
    banded_maxpool,
    dynamic_band_starts,
    kernel_reach,
)
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas

print("backend:", jax.default_backend())
rng = np.random.default_rng(11)
RADIUS, SIGMA, KS = 0.85, 0.4, 15
R = kernel_reach(RADIUS, SIGMA, KS)
n, cc, b, width = 512, 128, 2, 256
clouds = []
for _ in range(b):
    p = np.concatenate(
        [
            rng.uniform(0, 60.0, (n, 1)),
            rng.uniform(0, 4.0, (n, 1)),
            rng.uniform(0, 2.0, (n, 1)),
        ],
        1,
    ).astype(np.float32)
    p = p[np.argsort(p[:, 0], kind="stable")]
    clouds.append(p)
q = jnp.asarray(np.stack(clouds))
f = jnp.asarray(rng.normal(size=(b, n, cc)).astype(np.float32))
starts = jax.block_until_ready(
    jax.vmap(
        lambda p: dynamic_band_starts(p, p, R, tile=128, width=width, center="span")
    )(q)
)
print("starts:", np.asarray(starts))

for forced in (None, (128, 128)):
    mk._FORCE_CHUNKS = forced
    mp_pl = jax.jit(
        lambda ff: banded_maxpool_pallas(ff, q, q, R, 128, width, True, starts)
    )(f)
    mp_x = jax.jit(
        jax.vmap(
            lambda ff, p, st: banded_maxpool(ff, p, p, R, 128, width, starts=st)
        )
    )(f, q, starts)
    mp_full = jax.jit(
        jax.vmap(lambda ff, p: banded_maxpool(ff, p, p, R, 128, 1 << 20))
    )(f, q)
    d_px = np.abs(np.asarray(mp_pl) - np.asarray(mp_x))
    d_xf = np.abs(np.asarray(mp_x) - np.asarray(mp_full))
    print(f"forced={forced}: pallas-vs-xla {d_px.max()}, xla-vs-full {d_xf.max()}")
    if d_px.max() > 0:
        bad = np.argwhere(d_px == d_px.max())[0]
        bb, mm, ch = bad
        print("worst at", bad, "tile", mm // 128)
        print("pl:", np.asarray(mp_pl)[bb, mm, ch], "xla:", np.asarray(mp_x)[bb, mm, ch])
mk._FORCE_CHUNKS = None
print("DONE")
