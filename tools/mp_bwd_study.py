import numpy as np, jax, jax.numpy as jnp
from cofii2p_tpu.config import KITTIConfig
from cofii2p_tpu.data.loader import _collate
from cofii2p_tpu.data.synthetic import SyntheticDataset
from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.ops.banded import kernel_reach
from cofii2p_tpu.ops.maxpool_kernel import banded_maxpool_pallas
from cofii2p_tpu.utils.profiling import timeit_sync

cfg = KITTIConfig(); b = 8
ds = SyntheticDataset(cfg, 'val', length=b)
host = _collate([ds[i] for i in range(b)])
batch = jax.block_until_ready(prepare_samples(host['pc'], host['attrs'], host['P'], host['K'], jax.random.PRNGKey(0), host['img'], cfg, has_normals=True))
pyr = [jnp.asarray(p) for p in batch['points']]
rng = np.random.default_rng(0)
r0, s0 = cfg.init_radius, cfg.init_sigma
plan = cfg.kpconv_band_plan
sizes = cfg.pyramid_sizes
d = cfg.kpconv_init_dim

tiny = jnp.zeros((8,128)); fl = jax.jit(lambda x: jnp.sum(x*2.0))
floor = timeit_sync(lambda: fl(tiny), warmup=2, iters=10)
print(f'floor {floor*1e3:.2f} ms', flush=True)

def chain_bwd(one, x0, g0, inner=8):
    def body(i, acc):
        gr = one(acc, g0)
        return acc + 1e-12 * gr
    fn = jax.jit(lambda x, gg: jnp.sum(jax.lax.fori_loop(0, inner, lambda i, a: a + 1e-12*one(a, gg), x)))
    dt = timeit_sync(lambda: fn(x0, g0), warmup=2, iters=10)
    return (dt-floor)/inner*1e3

pools = [(2, sizes[1], sizes[0], d*2, 0, 1), (3, sizes[2], sizes[1], d*4, 1, 2),
         (4, sizes[3], sizes[2], d*8, 2, 4), (5, sizes[4], sizes[3], d*16, 3, 8)]
total = 0.0
for stage, m, n, c, sl, rs in pools:
    q = pyr[sl+1]; s = pyr[sl]
    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    ra = kernel_reach(r0*rs, s0*rs, 15)
    one = jax.grad(lambda ff, gg: jnp.sum(banded_maxpool_pallas(ff, q, s, ra, cfg.kpconv_tile, plan[sl]) * gg))
    ms = chain_bwd(one, f, g)
    total += ms
    print(f'maxpool bwd enc{stage}_1 m{m} n{n} C{c}: {ms:6.2f} ms', flush=True)
print(f'TOTAL maxpool f+b: {total:.2f} ms')
