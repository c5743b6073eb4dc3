"""Load the reference torch CoFiI2P on CPU for oracle/parity tests.

The reference tree (/root/reference) imports ``open3d`` at module scope
(model/network.py:12, model/kpconv/kernel_points.py:23) but only *uses* it
on paths the parity tests never take (KDTree search in the unused
``search_point_index``, .ply kernel-cache IO).  This helper installs a
minimal stub so the modules import, patches ``load_kernels`` with a
deterministic in-memory disposition (the reference would otherwise try to
write a .ply cache into the read-only tree, kernel_points.py:389-424), and
no-ops the hard-coded ``.cuda()`` calls inside ``forward``
(model/network.py:105,157) so the model runs on CPU.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REF = "/root/reference"


def _install_open3d_stub():
    if "open3d" in sys.modules:
        return
    o3d = types.ModuleType("open3d")
    o3d.geometry = types.SimpleNamespace(PointCloud=object, KDTreeFlann=object)
    o3d.utility = types.SimpleNamespace(Vector3dVector=np.asarray)
    o3d.io = types.SimpleNamespace(
        read_point_cloud=None, write_point_cloud=None
    )
    sys.modules["open3d"] = o3d


def load_reference():
    """Import the reference package; returns its top-level namespace lazily.

    Call once per process before touching reference modules.
    """
    _install_open3d_stub()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import torch

    # forward() calls .cuda() unconditionally (network.py:105,157); run on CPU
    if not getattr(torch.Tensor.cuda, "_parity_noop", False):
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._parity_noop = True
        torch.Tensor.cuda = _cuda_noop

    import model.kpconv.kpconv as ref_kpconv

    from cofii2p_tpu.models.kernel_points import load_kernel_points

    def _det_kernels(radius, num_kpoints, dimension=3, fixed="center", lloyd=False):
        # our canonical cached disposition, radius-scaled like the
        # reference's load_kernels but without the per-load random
        # rotation/jitter (kernel_points.py:429-453) or the .ply write
        return np.asarray(
            load_kernel_points(radius, num_kpoints, dimension), np.float32
        )

    ref_kpconv.load_kernels = _det_kernels
    return ref_kpconv


def make_reference_model(img_H=160, img_W=512, seed=0):
    """Construct the reference CoFiI2P on CPU with the given image geometry.

    Returns (model, opt).  The state_dict layout/keys are exactly what the
    released ``.t7`` checkpoints contain (model/network.py:14-46).
    """
    load_reference()
    import torch

    from data.options import Options_KITTI

    opt = Options_KITTI()
    opt.device = torch.device("cpu")
    opt.img_H = img_H
    opt.img_W = img_W

    from model.network import CoFiI2P as RefCoFiI2P

    torch.manual_seed(seed)
    m = RefCoFiI2P(opt)
    m.eval()
    return m, opt
