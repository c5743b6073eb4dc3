"""Round-3 verify drive (real TPU): tie-even maxpool backward + dynamic
band starts, driven through the public package surface at small shapes.

1. tie-even: duplicated-point cloud, grad of both Pallas maxpool variants
   vs the XLA twins (tie_even must match; tie_even=False must NOT).
2. dynamic starts: Pallas maxpool/aggregation forwards with
   dynamic_band_starts vs the XLA twins with the same starts, and vs the
   full-band results (window covers every span on a sorted cloud).
"""
import numpy as np
import jax
import jax.numpy as jnp

from cofii2p_tpu.ops.banded import (
    banded_kpconv_aggregate,
    banded_knn_tau,
    banded_maxpool,
    dynamic_band_starts,
    kernel_reach,
)
from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
from cofii2p_tpu.ops.maxpool_kernel import (
    banded_maxpool_pallas,
    banded_maxpool_tau_pallas,
)
from cofii2p_tpu.ops.pyramid import morton_order

print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(11)

# --- 1. tie-even backward with duplicated (padded) points ---
nu, nd, c = 384, 128, 128
pts_u = np.concatenate(
    [rng.uniform(0, 20.0, (nu, 2)), rng.uniform(0, 2.0, (nu, 1))], 1
).astype(np.float32)
feats_u = rng.normal(size=(nu, c)).astype(np.float32)
pts = np.concatenate([pts_u, pts_u[:nd]], 0)
feats = np.concatenate([feats_u, feats_u[:nd]], 0)
order = np.asarray(morton_order(jnp.asarray(pts)))
pts = jnp.asarray(pts[order])[None]
feats = jnp.asarray(feats[order])[None]
R = kernel_reach(0.85, 0.4, 15)
kw = dict(tile=128, band_width=128)
g = jnp.asarray(rng.normal(size=(1, 512, c)).astype(np.float32))


def loss_pl(f):
    return jnp.sum(banded_maxpool_pallas(f, pts, pts, R, **kw) * g)


def loss_xla(f):
    return jnp.sum(
        jax.vmap(lambda ff, q, s: banded_maxpool(ff, q, s, R, **kw))(
            f, pts, pts
        )
        * g
    )


def loss_full(f):
    return jnp.sum(
        banded_maxpool_pallas(
            f, pts, pts, R, kw["tile"], kw["band_width"], False
        )
        * g
    )


g_pl = np.asarray(jax.jit(jax.grad(loss_pl))(feats))
g_xla = np.asarray(jax.jit(jax.grad(loss_xla))(feats))
g_full = np.asarray(jax.jit(jax.grad(loss_full))(feats))
print("tie radius: even vs XLA:", np.abs(g_pl - g_xla).max())
print("tie radius: full vs XLA:", np.abs(g_full - g_xla).max(), "(>0 expected)")
assert np.abs(g_pl - g_xla).max() < 1e-4
assert np.abs(g_full - g_xla).max() > 1e-3

tau = jax.vmap(lambda q, s: banded_knn_tau(q, s, k=16, **kw))(pts, pts)


def loss_tpl(f):
    return jnp.sum(banded_maxpool_tau_pallas(f, pts, pts, tau, **kw) * g)


def loss_txla(f):
    out = jax.vmap(
        lambda ff, q, s, t: banded_maxpool(ff, q, s, 0.0, tau=t, **kw)
    )(f, pts, pts, tau)
    return jnp.sum(out * g)


g_tpl = np.asarray(jax.jit(jax.grad(loss_tpl))(feats))
g_txla = np.asarray(jax.jit(jax.grad(loss_txla))(feats))
print("tie tau: even vs XLA:", np.abs(g_tpl - g_txla).max())
assert np.abs(g_tpl - g_txla).max() < 1e-4

# --- 2. dynamic starts forwards on TPU ---
RADIUS, SIGMA, KS = 0.85, 0.4, 15
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
        lambda p: dynamic_band_starts(
            p, p, R, tile=128, width=width, center="span"
        )
    )(q)
)

# everything enters jit as an ARGUMENT: closing device arrays over the jit
# boundary serializes them as constants through the axon remote compiler,
# which has been observed to produce silently WRONG results (not only the
# documented HTTP 413) — tools/dyn_repro3.py pins closure 5.41-off vs
# argument exact on identical values.
mp_pl = jax.jit(
    lambda ff, qq, ss: banded_maxpool_pallas(ff, qq, qq, R, 128, width, True, ss)
)(f, q, starts)
mp_x = jax.jit(
    jax.vmap(
        lambda ff, p, st: banded_maxpool(ff, p, p, R, 128, width, starts=st)
    )
)(f, q, starts)
mp_full = jax.jit(
    jax.vmap(lambda ff, p: banded_maxpool(ff, p, p, R, 128, 1 << 20))
)(f, q)
print("dyn maxpool: pallas vs xla:", np.abs(np.asarray(mp_pl) - np.asarray(mp_x)).max())
print("dyn maxpool: dyn vs full-band:", np.abs(np.asarray(mp_x) - np.asarray(mp_full)).max())
assert np.abs(np.asarray(mp_pl) - np.asarray(mp_x)).max() == 0.0
assert np.abs(np.asarray(mp_x) - np.asarray(mp_full)).max() == 0.0

w_pl, c_pl = jax.jit(
    lambda ff, qq, ss: banded_kpconv_aggregate_pallas(
        ff, qq, qq, RADIUS, SIGMA, KS, 128, width, jnp.float32, ss
    )
)(f, q, starts)
w_x, c_x = jax.jit(
    jax.vmap(
        lambda ff, p, st: banded_kpconv_aggregate(
            ff, p, p, RADIUS, SIGMA, KS, 128, width, starts=st
        )
    )
)(f, q, starts)
cnt_diff = np.abs(np.asarray(c_pl) - np.asarray(c_x)).max()
w64 = np.asarray(w_x).astype(np.float64)
rel = np.abs(np.asarray(w_pl).astype(np.float64) - w64) / np.maximum(
    np.abs(w64), np.sqrt((w64**2).mean()) + 1e-12
)
print("dyn agg: count diff:", cnt_diff, "weighted rel:", rel.max())
assert cnt_diff == 0
assert rel.max() < 5e-2
print("DRIVE_OK")
