"""Band-width coverage study for the banded KPConv path (CPU).

For every convolution in the FPN (self and strided, all 5 levels) this
measures, on KITTI-scale synthetic clouds, the fraction of in-radius
influence mass whose support index falls inside the Morton band — i.e. how
close the banded op is to the exact radius-neighborhood op at a given
``kpconv_band_width``.  Also reports 1-NN recall for the decoder upsample
direction.

Usage:  python -m tools.band_study [--widths 256,512,1024,2048] [--frames 3]

Results are recorded in PERF.md.
"""

from __future__ import annotations

import argparse

import numpy as np


def influence_mass_coverage(q, s, radius, sigma, kernel_size, tile, band_width):
    """Coverage of banded vs full radius neighborhoods (scipy KDTree based)."""
    from scipy.spatial import cKDTree

    from cofii2p_tpu.models.kernel_points import load_kernel_points
    from cofii2p_tpu.ops.banded import _band_geometry, kernel_reach

    m, n = len(q), len(s)
    kp = np.asarray(load_kernel_points(radius, kernel_size, 3))
    r = kernel_reach(radius, sigma, kernel_size)
    tile, _, band, dense = _band_geometry(m, n, tile, band_width)
    if dense:
        return 1.0, 1.0

    pairs = cKDTree(q).query_ball_tree(cKDTree(s), r)
    t_idx = np.arange(m) // tile
    centers = ((2 * t_idx * tile + tile) * n) // (2 * m)
    starts = np.clip(centers - band // 2, 0, n - band)

    total_mass = in_mass = 0.0
    total_pairs = in_pairs = 0
    for i, js in enumerate(pairs):
        if not js:
            continue
        js = np.asarray(js)
        offs = s[js] - q[i]
        dk = np.linalg.norm(offs[:, None, :] - kp[None, :, :], axis=-1)
        mass = np.maximum(1.0 - dk / sigma, 0.0).sum(-1)
        inb = (js >= starts[i]) & (js < starts[i] + band)
        total_mass += mass.sum()
        in_mass += mass[inb].sum()
        total_pairs += len(js)
        in_pairs += int(inb.sum())
    return (
        in_pairs / max(total_pairs, 1),
        in_mass / max(total_mass, 1e-12),
    )


def influence_mass_coverage_dyn(q, s, radius, sigma, kernel_size, tile, width):
    """Same metric, but with the DYNAMIC per-tile window starts
    (ops/banded.dynamic_band_starts semantics: measure each query tile's
    exact in-reach index span, center a ``width`` window on it)."""
    from scipy.spatial import cKDTree

    from cofii2p_tpu.models.kernel_points import load_kernel_points
    from cofii2p_tpu.ops.banded import kernel_reach

    m, n = len(q), len(s)
    kp = np.asarray(load_kernel_points(radius, kernel_size, 3))
    r = kernel_reach(radius, sigma, kernel_size)
    width = min(width, n)
    if width >= n:
        return 1.0, 1.0

    pairs = cKDTree(q).query_ball_tree(cKDTree(s), r)
    nt = m // tile
    starts = np.zeros(m, np.int64)
    for t in range(nt):
        js_all = [j for i in range(t * tile, (t + 1) * tile) for j in pairs[i]]
        if js_all:
            # in-reach centroid (multiplicity-weighted), as on device
            st = int(np.mean(js_all)) - width // 2
        else:
            st = ((2 * t * tile + tile) * n) // (2 * m) - width // 2
        starts[t * tile : (t + 1) * tile] = np.clip(st, 0, n - width)

    total_mass = in_mass = 0.0
    total_pairs = in_pairs = 0
    for i, js in enumerate(pairs):
        if not js:
            continue
        js = np.asarray(js)
        offs = s[js] - q[i]
        dk = np.linalg.norm(offs[:, None, :] - kp[None, :, :], axis=-1)
        mass = np.maximum(1.0 - dk / sigma, 0.0).sum(-1)
        inb = (js >= starts[i]) & (js < starts[i] + width)
        total_mass += mass.sum()
        in_mass += mass[inb].sum()
        total_pairs += len(js)
        in_pairs += int(inb.sum())
    return (
        in_pairs / max(total_pairs, 1),
        in_mass / max(total_mass, 1e-12),
    )


def nearest_recall(q, s, tile, band_width):
    from scipy.spatial import cKDTree

    from cofii2p_tpu.ops.banded import _band_geometry

    m, n = len(q), len(s)
    tile, _, band, dense = _band_geometry(m, n, tile, band_width)
    if dense:
        return 1.0
    _, true = cKDTree(s).query(q)
    t_idx = np.arange(m) // tile
    centers = ((2 * t_idx * tile + tile) * n) // (2 * m)
    starts = np.clip(centers - band // 2, 0, n - band)
    return float(((true >= starts) & (true < starts + band)).mean())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cofii2p_tpu.config import KITTIConfig
    from cofii2p_tpu.data.synthetic import SyntheticDataset
    from cofii2p_tpu.ops.pyramid import build_pyramid

    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="256,512,1024,2048")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--scaled", action="store_true",
                    help="interpret widths as level-0 widths, x2 per support level")
    ap.add_argument("--dynamic", action="store_true",
                    help="use dynamic per-tile span-centered window starts "
                    "(ops/banded.dynamic_band_starts) instead of the static "
                    "proportional plan")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    cfg = KITTIConfig()
    ds = SyntheticDataset(cfg, "val", length=args.frames)
    r0, s0, ks = cfg.init_radius, cfg.init_sigma, cfg.kernel_size

    # conv plan: (name, q_level, s_level, radius_scale)
    convs = [("enc1 self L0", 0, 0, 1)]
    for stage in range(2, 6):
        convs.append((f"enc{stage} strided L{stage-2}->L{stage-1}", stage - 1, stage - 2, 2 ** (stage - 2)))
        convs.append((f"enc{stage} self L{stage-1}", stage - 1, stage - 1, 2 ** (stage - 1)))
    ups = [(f"dec 1NN L{l}->L{l+1}", l, l + 1) for l in (1, 2, 3)]

    levels_per_frame = []
    for i in range(args.frames):
        item = ds[i]
        pyr = build_pyramid(
            jnp.asarray(item["pc"]), jax.random.PRNGKey(i), cfg.pyramid_sizes,
            need_maps=False, ordering=cfg.pyramid_ordering,
        )
        levels_per_frame.append([np.asarray(p) for p in pyr["points"]])

    scale = "(scaled: bw * 2^support_level, as the FPN applies it)" if args.scaled else ""
    print(f"{'conv':28s} " + " ".join(f"bw={w:<5d}" for w in widths) + f" {scale}")
    for name, ql, sl, rs in convs:
        row = []
        for w in widths:
            eff = w * (2**sl) if args.scaled else w
            cov_fn = (
                influence_mass_coverage_dyn
                if args.dynamic
                else influence_mass_coverage
            )
            masses = [
                cov_fn(
                    lv[ql], lv[sl], r0 * rs, s0 * rs, ks, args.tile, eff
                )[1]
                for lv in levels_per_frame
            ]
            row.append(float(np.mean(masses)))
        print(f"{name:28s} " + " ".join(f"{v:8.5f}" for v in row))
    for name, ql, sl in ups:
        row = []
        for w in widths:
            eff = w * (2**sl) if args.scaled else w
            rec = [nearest_recall(lv[ql], lv[sl], args.tile, eff) for lv in levels_per_frame]
            row.append(float(np.mean(rec)))
        print(f"{name:28s} " + " ".join(f"{v:8.5f}" for v in row))


if __name__ == "__main__":
    main()
