"""TPU isolation of the dyn-starts Pallas mismatch: traced-vs-static and
aligned-vs-unaligned window starts."""
import numpy as np
import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import banded_maxpool, kernel_reach
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

CASES = {
    "aligned128": np.array([[0, 128, 256, 256]] * b, np.int32),
    "aligned8": np.array([[0, 64, 192, 256]] * b, np.int32),
    "unaligned": np.array([[0, 62, 190, 256]] * b, np.int32),
    "off-by-one": np.array([[1, 129, 255, 255]] * b, np.int32),
}
for name, st_np in CASES.items():
    st = jnp.asarray(st_np)
    mp_pl = jax.jit(
        lambda ff, qq, ss: banded_maxpool_pallas(ff, qq, qq, R, 128, width, True, ss)
    )(f, q, st)
    mp_x = jax.jit(
        jax.vmap(
            lambda ff, p, s1: banded_maxpool(ff, p, p, R, 128, width, starts=s1)
        )
    )(f, q, st)
    d = np.abs(np.asarray(mp_pl) - np.asarray(mp_x))
    per_tile = [float(d[:, t * 128 : (t + 1) * 128].max()) for t in range(4)]
    print(f"{name}: max {d.max():.4f} per-tile {per_tile}")
print("DONE")
