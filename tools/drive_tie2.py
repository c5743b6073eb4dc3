"""Diagnose: does the tau FORWARD already differ on TPU with duplicates?"""
import numpy as np, jax, jax.numpy as jnp
from cofii2p_tpu.ops.banded import banded_maxpool, banded_knn_tau
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_tau_pallas
from cofii2p_tpu.ops.pyramid import morton_order

rng = np.random.default_rng(11)
nu, nd, c = 384, 128, 128
pts_u = np.concatenate([rng.uniform(0, 20.0, (nu, 2)), rng.uniform(0, 2.0, (nu, 1))], 1).astype(np.float32)
feats_u = rng.normal(size=(nu, c)).astype(np.float32)
pts = np.concatenate([pts_u, pts_u[:nd]], 0)
feats = np.concatenate([feats_u, feats_u[:nd]], 0)
order = np.asarray(morton_order(jnp.asarray(pts)))
pts = jnp.asarray(pts[order])[None]
feats = jnp.asarray(feats[order])[None]
kw = dict(tile=128, band_width=128)
tau = jax.vmap(lambda q, s: banded_knn_tau(q, s, k=16, **kw))(pts, pts)
out_pl = np.asarray(banded_maxpool_tau_pallas(feats, pts, pts, tau, **kw))
out_xla = np.asarray(jax.vmap(lambda ff, q, s, t: banded_maxpool(ff, q, s, 0.0, tau=t, **kw))(feats, pts, pts, tau))
d = np.abs(out_pl - out_xla)
print("tau forward max abs diff:", d.max(), " rows differing:", int((d.max(-1) > 0).sum()))
# how many queries have a zero k/k+1 gap (duplicate straddle)?
taur = np.asarray(tau)[0]
print("tau sample:", taur[:4])
