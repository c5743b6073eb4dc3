"""Drive: maxpool tie-even backward on real TPU with duplicated points."""
import numpy as np, jax, jax.numpy as jnp
from cofii2p_tpu.ops.banded import banded_maxpool, kernel_reach, banded_knn_tau
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas, banded_maxpool_tau_pallas
from cofii2p_tpu.ops.pyramid import morton_order

print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(11)
nu, nd, c = 384, 128, 128  # TPU-shaped: c=128 chunk path, 512 pts
pts_u = np.concatenate([rng.uniform(0, 20.0, (nu, 2)), rng.uniform(0, 2.0, (nu, 1))], 1).astype(np.float32)
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
    return jnp.sum(jax.vmap(lambda ff, q, s: banded_maxpool(ff, q, s, R, **kw))(f, pts, pts) * g)
def loss_full(f):
    return jnp.sum(banded_maxpool_pallas(f, pts, pts, R, kw["tile"], kw["band_width"], False) * g)

g_pl = np.asarray(jax.jit(jax.grad(loss_pl))(feats))
g_xla = np.asarray(jax.jit(jax.grad(loss_xla))(feats))
g_full = np.asarray(jax.jit(jax.grad(loss_full))(feats))
print("radius: tie_even vs XLA max abs diff:", np.abs(g_pl - g_xla).max())
print("radius: tie_full vs XLA max abs diff:", np.abs(g_full - g_xla).max(), "(expected >0: ties are real)")
assert np.abs(g_pl - g_xla).max() < 1e-4, "tie_even backward does not match XLA"
assert np.abs(g_full - g_xla).max() > 1e-3, "duplicates produced no ties?!"

tau = jax.vmap(lambda q, s: banded_knn_tau(q, s, k=16, **kw))(pts, pts)
def loss_tpl(f):
    return jnp.sum(banded_maxpool_tau_pallas(f, pts, pts, tau, **kw) * g)
def loss_txla(f):
    out = jax.vmap(lambda ff, q, s, t: banded_maxpool(ff, q, s, 0.0, tau=t, **kw))(f, pts, pts, tau)
    return jnp.sum(out * g)
g_tpl = np.asarray(jax.jit(jax.grad(loss_tpl))(feats))
g_txla = np.asarray(jax.jit(jax.grad(loss_txla))(feats))
print("tau: tie_even vs XLA max abs diff:", np.abs(g_tpl - g_txla).max())
assert np.abs(g_tpl - g_txla).max() < 1e-4
print("DRIVE_OK")
