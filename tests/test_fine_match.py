"""Fine-matching consistency: the eval decode must invert the training
labeling (rel_index = rel_y*4 + rel_x over the extracted patch), closing the
axis-swap bug documented in models/network.py::fine_match_xy."""

import jax.numpy as jnp
import numpy as np

from cofii2p_tpu.models.network import fine_match_xy
from cofii2p_tpu.ops.patch import extract_patches


def test_fine_match_recovers_planted_cell():
    rng = np.random.RandomState(0)
    H, W, C = 32, 64, 8
    fmap = rng.randn(H, W, C).astype(np.float32)
    K = 6
    centers = np.stack(
        [rng.randint(4, W - 4, K), rng.randint(4, H - 4, K)], -1
    ).astype(np.float32)  # (K, 2) as (x, y)

    # plant a distinctive feature at a known cell offset inside each patch
    target = rng.randn(K, C).astype(np.float32) * 10
    off = rng.randint(0, 4, (K, 2))  # (dx, dy)
    planted_xy = np.floor(centers - 2) + off
    for i in range(K):
        x, y = int(planted_xy[i, 0]), int(planted_xy[i, 1])
        fmap[y, x] = target[i]

    patches = extract_patches(jnp.asarray(fmap), jnp.asarray(centers), 4)
    got_xy = np.asarray(
        fine_match_xy(
            jnp.asarray(patches)[None], jnp.asarray(target)[None],
            jnp.asarray(centers)[None],
        )
    )[0]
    np.testing.assert_array_equal(got_xy, planted_xy)


def test_fine_match_training_label_consistency():
    """A patch whose argmax cell has training label r must decode to the
    pixel whose (rel_y*4 + rel_x) == r (train.py:268-269 convention)."""
    rng = np.random.RandomState(1)
    C = 4
    patch = rng.randn(1, 1, 4, 4, C).astype(np.float32)
    pc = patch[0, 0, 2, 1][None, None]  # cell rel_y=2, rel_x=1 -> label 9
    center = np.asarray([[[10.0, 20.0]]], np.float32)
    xy = np.asarray(fine_match_xy(jnp.asarray(patch), jnp.asarray(pc), jnp.asarray(center)))[0, 0]
    # decode: x = cx - 2 + rel_x, y = cy - 2 + rel_y
    np.testing.assert_array_equal(xy, [10 - 2 + 1, 20 - 2 + 2])


def test_fine_match_reference_decode_swaps_axes():
    """decode='reference' reproduces the reference eval's swapped decode
    (eval_all.py:104-105 adds idx//4, the row offset, to x) — the published
    numbers were measured with this swap, so the compat mode must keep it."""
    rng = np.random.RandomState(2)
    C = 4
    patch = rng.randn(1, 1, 4, 4, C).astype(np.float32)
    pc = patch[0, 0, 2, 1][None, None]  # argmax at rel_y=2, rel_x=1 -> idx 9
    center = np.asarray([[[10.0, 20.0]]], np.float32)
    xy = np.asarray(
        fine_match_xy(
            jnp.asarray(patch), jnp.asarray(pc), jnp.asarray(center),
            decode="reference",
        )
    )[0, 0]
    # reference decode: x = cx - 2 + idx // 4, y = cy - 2 + idx % 4
    np.testing.assert_array_equal(xy, [10 - 2 + 2, 20 - 2 + 1])
