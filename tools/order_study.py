"""Space-filling-curve ordering study for the banded KPConv path (CPU).

The banded path's FPN cost is proportional to the band width needed for
~99% influence-mass coverage, which is set by how well the per-level point
ordering localizes radius balls in index space.  This compares candidate
orderings at several level-0 band widths (scaled x2 per support level, as
the FPN applies them):

  morton3d   current default (ops/pyramid.morton_order, z-order, voxel 0.4)
  morton3d-f finer z-order (voxel 0.1)
  hilbert3d  3-D Hilbert curve (Skilling transpose algorithm)
  morton2d   z-order on the ground plane (x, z) only
  hilbert2d  Hilbert on (x, z) only

Usage:  python -m tools.order_study [--widths 128,192,256] [--frames 2]

Results recorded in PERF.md.
"""

from __future__ import annotations

import argparse

import numpy as np

from tools.band_study import influence_mass_coverage, nearest_recall


def _spread3(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _spread2(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _quantize(pts: np.ndarray, voxel: float, bits: int) -> np.ndarray:
    lo = pts.min(axis=0)
    return np.clip(((pts - lo) / voxel).astype(np.int64), 0, (1 << bits) - 1)


def morton3d(pts: np.ndarray, voxel: float = 0.4) -> np.ndarray:
    q = _quantize(pts, voxel, 10)
    code = _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1) | (_spread3(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def morton2d(pts: np.ndarray, voxel: float = 0.4) -> np.ndarray:
    q = _quantize(pts[:, [0, 2]], voxel, 16)
    code = _spread2(q[:, 0]) | (_spread2(q[:, 1]) << 1)
    return np.argsort(code, kind="stable")


def _axes_to_transpose(X: np.ndarray, bits: int) -> np.ndarray:
    """Skilling's AxestoTranspose, vectorized over rows (public-domain
    algorithm, 'Programming the Hilbert curve', AIP Conf. Proc. 707)."""
    X = X.astype(np.int64).copy()
    n = X.shape[1]
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            cond = (X[:, i] & Q) != 0
            X[:, 0] = np.where(cond, X[:, 0] ^ P, X[:, 0])
            t = np.where(cond, 0, (X[:, 0] ^ X[:, i]) & P)
            X[:, 0] ^= t
            X[:, i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), np.int64)
    Q = 1 << (bits - 1)
    while Q > 1:
        t = np.where((X[:, n - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    return X ^ t[:, None]


def hilbert_code(q: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert index of quantized coords q (N, n) with `bits` bits/axis."""
    X = _axes_to_transpose(q, bits)
    n = X.shape[1]
    code = np.zeros(len(X), np.int64)
    for j in range(bits):
        for i in range(n):
            code |= ((X[:, i] >> j) & 1) << (j * n + (n - 1 - i))
    return code


def hilbert3d(pts: np.ndarray, voxel: float = 0.4) -> np.ndarray:
    return np.argsort(hilbert_code(_quantize(pts, voxel, 10), 10), kind="stable")


def hilbert2d(pts: np.ndarray, voxel: float = 0.4) -> np.ndarray:
    return np.argsort(
        hilbert_code(_quantize(pts[:, [0, 2]], voxel, 15), 15), kind="stable"
    )


ORDERINGS = {
    "morton3d": lambda p: morton3d(p, 0.4),
    "morton3d-f": lambda p: morton3d(p, 0.1),
    "hilbert3d": lambda p: hilbert3d(p, 0.4),
    "hilbert3d-f": lambda p: hilbert3d(p, 0.1),
    "morton2d": lambda p: morton2d(p, 0.4),
    "hilbert2d": lambda p: hilbert2d(p, 0.4),
}


def check_hilbert_adjacency():
    """Sanity: consecutive Hilbert indices are face-adjacent cells."""
    for n, bits in ((2, 3), (3, 2)):
        grid = np.stack(
            np.meshgrid(*[np.arange(1 << bits)] * n, indexing="ij"), -1
        ).reshape(-1, n)
        order = np.argsort(hilbert_code(grid, bits), kind="stable")
        steps = np.abs(np.diff(grid[order], axis=0)).sum(axis=1)
        assert (steps == 1).all(), f"hilbert {n}d not a hamiltonian path"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.ops.pyramid import build_pyramid

    check_hilbert_adjacency()

    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="128,192,256")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    cfg = KITTIConfig()
    ds = SyntheticDataset(cfg, "val", length=args.frames)
    r0, s0, ks = cfg.init_radius, cfg.init_sigma, cfg.kernel_size

    convs = [("enc1 self L0", 0, 0, 1)]
    for stage in range(2, 6):
        convs.append((f"enc{stage} strided L{stage-2}->L{stage-1}", stage - 1, stage - 2, 2 ** (stage - 2)))
        convs.append((f"enc{stage} self L{stage-1}", stage - 1, stage - 1, 2 ** (stage - 1)))
    ups = [(f"dec 1NN L{l}->L{l+1}", l, l + 1) for l in (1, 2, 3)]

    # raw (pre-Morton) levels: build the pyramid, then strip its ordering by
    # re-sorting with each candidate (ordering choice is semantics-free)
    levels_per_frame = []
    for i in range(args.frames):
        item = ds[i]
        pyr = build_pyramid(
            jnp.asarray(item["pc"]), jax.random.PRNGKey(i), cfg.pyramid_sizes,
            need_maps=False,
        )
        levels_per_frame.append([np.asarray(p) for p in pyr["points"]])

    for oname, order in ORDERINGS.items():
        frames = [[lv[order(lv)] for lv in lvs] for lvs in levels_per_frame]
        print(f"\n== {oname} ==  (widths are level-0; x2 per support level)")
        print(f"{'conv':28s} " + " ".join(f"bw={w:<5d}" for w in widths))
        worst = {w: 1.0 for w in widths}
        for name, ql, sl, rs in convs:
            row = []
            for w in widths:
                eff = w * (2**sl)
                masses = [
                    influence_mass_coverage(
                        lv[ql], lv[sl], r0 * rs, s0 * rs, ks, args.tile, eff
                    )[1]
                    for lv in frames
                ]
                v = float(np.mean(masses))
                worst[w] = min(worst[w], v)
                row.append(v)
            print(f"{name:28s} " + " ".join(f"{v:8.5f}" for v in row))
        for name, ql, sl in ups:
            row = []
            for w in widths:
                eff = w * (2**sl)
                rec = [nearest_recall(lv[ql], lv[sl], args.tile, eff) for lv in frames]
                row.append(float(np.mean(rec)))
            print(f"{name:28s} " + " ".join(f"{v:8.5f}" for v in row))
        print(f"{'WORST conv mass':28s} " + " ".join(f"{worst[w]:8.5f}" for w in widths))


if __name__ == "__main__":
    main()
