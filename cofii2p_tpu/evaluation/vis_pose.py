"""Visualize a registration result: project the cloud with GT and predicted
poses and overlay both on the frame dump.

Capability match for the reference's pose-visualization notebook
(vis_nuscenes_pose.ipynb) as a scriptable CLI over eval_all dumps.

Usage: ``python -m cofii2p_tpu.evaluation.vis_pose <frame.npy> [--out f.png]``
"""

from __future__ import annotations

import argparse

import numpy as np


def project(P: np.ndarray, K: np.ndarray, pts: np.ndarray):
    """World points -> pixels under camera pose P (world->cam is inv(P))."""
    Pi = np.linalg.inv(P)
    cam = pts @ Pi[:3, :3].T + Pi[:3, 3]
    uvz = cam @ K.T
    z = uvz[:, 2]
    uv = uvz[:, :2] / np.maximum(z[:, None], 1e-9)
    return uv, z


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("frame", help="a per-frame .npy dump from eval_all")
    parser.add_argument("--out", default="pose_vis.png")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.load(args.frame, allow_pickle=True).item()
    K = np.asarray(d["K"], np.float64)
    obj = np.asarray(d["object_points"], np.float64)
    mask = np.asarray(d.get("corr_mask", np.ones(len(obj), bool))) > 0

    fig, axes = plt.subplots(1, 2, figsize=(12, 4), sharex=True, sharey=True)
    for ax, key, title in [
        (axes[0], "GT_P", "ground-truth pose"),
        (axes[1], "pred_P", "predicted pose"),
    ]:
        uv, z = project(np.asarray(d[key], np.float64), K, obj[mask])
        front = z > 0
        sc = ax.scatter(uv[front, 0], uv[front, 1], c=z[front], s=4, cmap="turbo")
        ax.set_title(title)
        ax.invert_yaxis()
        ax.set_aspect("equal")
    fig.colorbar(sc, ax=axes, label="depth (m)", shrink=0.8)
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
