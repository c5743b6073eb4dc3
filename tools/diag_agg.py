import jax, jax.numpy as jnp, numpy as np
from cofii2p_tpu.config import KITTIConfig
import bench
cfg = KITTIConfig(compute_dtype='bfloat16')
from cofii2p_tpu.ops.banded import banded_kpconv_aggregate
from cofii2p_tpu.ops.kpconv_kernel import banded_kpconv_aggregate_pallas
from cofii2p_tpu.ops.pyramid import morton_order

rng = np.random.RandomState(0)
n, c = 5120, 128
band = int(cfg.kpconv_band_plan[2]); r = cfg.init_radius*4; s = cfg.init_sigma*4
pts = np.concatenate([rng.uniform(-40,40,(n,1)), rng.uniform(-2,2,(n,1)), rng.uniform(0,80,(n,1))],1).astype(np.float32)
order = np.asarray(morton_order(jnp.asarray(pts), ordering='xz'))
pts_np = pts[order]; feats_np = rng.randn(n,c).astype(np.float32)
pts_j = jnp.asarray(pts_np)[None]; feats_j = jnp.asarray(feats_np)[None]
w_true, c_true = bench._truth_aggregate(pts_np, feats_np, r, s, cfg.kernel_size, cfg.kpconv_tile, band)
rms = float(np.sqrt(np.mean(w_true**2)))
w_pl, c_pl = banded_kpconv_aggregate_pallas(feats_j, pts_j, pts_j, r, s, cfg.kernel_size, cfg.kpconv_tile, band, jnp.float32)
w_x, c_x = jax.vmap(lambda f,q,ss: banded_kpconv_aggregate(f,q,ss,r,s,cfg.kernel_size,cfg.kpconv_tile,band))(feats_j, pts_j, pts_j)
for name, w in (("pallas", w_pl), ("xla", w_x)):
    w = np.asarray(w)[0].astype(np.float64)
    err = np.abs(w - w_true)
    rel = err / np.maximum(np.abs(w_true), rms)
    i = np.unravel_index(np.argmax(rel), rel.shape)
    print(f"{name}: rel max {rel.max():.2e} p99.99 {np.percentile(rel,99.99):.2e} abs max {err.max():.2e}")
    print(f"   worst at m={i[0]} k={i[1]} c={i[2]}: dev={w[i]:.5f} true={w_true[i]:.5f} count={c_true[i[0]]}")
    # error vs magnitude structure: top-20 rel entries
    flat = np.argsort(rel, axis=None)[-10:]
    for j in flat[::-1][:5]:
        ii = np.unravel_index(j, rel.shape)
        print(f"   m={ii[0]:5d} k={ii[1]:2d} c={ii[2]:3d} true={w_true[ii]:+.4f} dev={w[ii]:+.4f}")
