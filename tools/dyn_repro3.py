"""Closure-vs-argument isolation: same values as the failing drive, the
Pallas call once with q/starts closed over (drive style) and once passed
as jit arguments (production style)."""
import numpy as np
import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import (
    banded_maxpool,
    dynamic_band_starts,
    kernel_reach,
)
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas

print("backend:", jax.default_backend())
rng = np.random.default_rng(11)
R = kernel_reach(0.85, 0.4, 15)
n, c, b, width = 512, 128, 2, 256
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
    clouds.append(p[np.argsort(p[:, 0], kind="stable")])
q = jnp.asarray(np.stack(clouds))
f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
starts = jax.block_until_ready(
    jax.vmap(
        lambda p: dynamic_band_starts(p, p, R, tile=128, width=width, center="span")
    )(q)
)
print("starts:", np.asarray(starts))

mp_x = jax.jit(
    jax.vmap(lambda ff, p, s1: banded_maxpool(ff, p, p, R, 128, width, starts=s1))
)(f, q, starts)

mp_closure = jax.jit(
    lambda ff: banded_maxpool_pallas(ff, q, q, R, 128, width, True, starts)
)(f)
mp_arg = jax.jit(
    lambda ff, qq, ss: banded_maxpool_pallas(ff, qq, qq, R, 128, width, True, ss)
)(f, q, starts)
print("closure vs xla:", np.abs(np.asarray(mp_closure) - np.asarray(mp_x)).max())
print("argument vs xla:", np.abs(np.asarray(mp_arg) - np.asarray(mp_x)).max())
print("DONE")
