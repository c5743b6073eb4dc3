"""Device mesh and sharding for data-parallel training over ICI.

The reference has no distributed support at all (SURVEY.md §2: no DDP, no
torch.distributed, batch size 1).  Here DP is the idiomatic JAX shape:
a 1-D ``Mesh`` over all devices, the batch axis sharded, parameters
replicated, and XLA inserting the psum gradient all-reduce over ICI during
SPMD partitioning of the jitted train step — no explicit communication code.

The model is ~51M params and fits on one chip, so TP/PP/EP are not warranted
(SURVEY.md §2 checklist); batch DP is the scaling axis that matters for the
eval-frames/sec north star.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("dp",))


def shard_host_batch(host_batch: dict, mesh: Mesh) -> dict:
    """Place a stacked host batch on the mesh, batch axis sharded over dp.

    Scalars / unbatched entries are replicated.
    """
    bsz = host_batch["img"].shape[0]
    ndev = mesh.devices.size
    batch_spec = P("dp") if bsz % ndev == 0 and bsz >= ndev else P()

    def put(x):
        x = np.asarray(x)
        spec = batch_spec if x.ndim >= 1 and x.shape[0] == bsz else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in host_batch.items()}
