"""Golden tests: batched closed-form small linalg vs NumPy/LAPACK."""

import numpy as np
import jax.numpy as jnp

from cofii2p_tpu.ops import small_linalg as sl


def _sym(rng, b, n):
    A = rng.normal(size=(b, n, n)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


class TestEigh3x3:
    def test_matches_lapack(self):
        rng = np.random.default_rng(0)
        A = _sym(rng, 256, 3)
        vals, vecs = sl.eigh3x3(jnp.asarray(A))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        ref_vals = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)
        # columns are unit eigenvectors: A v = lambda v
        for j in range(3):
            av = np.einsum("bij,bj->bi", A, vecs[:, :, j])
            lv = vals[:, j : j + 1] * vecs[:, :, j]
            np.testing.assert_allclose(av, lv, atol=5e-3)
        # orthonormal
        vtv = np.einsum("bji,bjk->bik", vecs, vecs)
        np.testing.assert_allclose(vtv, np.tile(np.eye(3), (256, 1, 1)), atol=1e-4)

    def test_degenerate_repeated_eigenvalues(self):
        A = np.stack([np.eye(3, dtype=np.float32) * 2.0] * 4)
        vals, vecs = sl.eigh3x3(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-5)
        vtv = np.einsum("bji,bjk->bik", np.asarray(vecs), np.asarray(vecs))
        np.testing.assert_allclose(vtv, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)


class TestCholesky:
    def test_solve_psd(self):
        rng = np.random.default_rng(1)
        for n in (3, 6, 12):
            B = rng.normal(size=(64, n, n)).astype(np.float32)
            A = np.einsum("bij,bkj->bik", B, B) + 0.1 * np.eye(n, dtype=np.float32)
            b = rng.normal(size=(64, n)).astype(np.float32)
            x = np.asarray(sl.solve_psd(jnp.asarray(A), jnp.asarray(b)))
            ref = np.linalg.solve(A, b[..., None])[..., 0]
            np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)


class TestSmallestEigvecs:
    def test_near_null_space(self):
        rng = np.random.default_rng(2)
        # build PSD 12x12 with a known tiny-eigenvalue subspace
        Q, _ = np.linalg.qr(rng.normal(size=(32, 12, 12)))
        lam = rng.uniform(1.0, 10.0, size=(32, 12)).astype(np.float32)
        lam[:, 0] = 1e-6
        lam[:, 1] = 1e-5
        A = np.einsum("bik,bk,bjk->bij", Q, lam, Q).astype(np.float32)
        V = np.asarray(sl.smallest_eigvecs(jnp.asarray(A), num=2))
        # each returned column must lie in span(Q[:, :2])
        for j in range(2):
            v = V[:, :, j]
            proj = np.einsum("bik,bk->bi", Q[:, :, :2],
                             np.einsum("bik,bi->bk", Q[:, :, :2], v))
            cos = np.abs(np.sum(proj * v, -1))
            assert (cos > 0.999).all(), cos.min()


class TestRigidAlign:
    def test_recovers_random_rigid_transform(self):
        rng = np.random.default_rng(3)
        from scipy.spatial.transform import Rotation

        R_true = Rotation.random(16, random_state=0).as_matrix().astype(np.float32)
        t_true = rng.normal(size=(16, 3)).astype(np.float32)
        src = rng.normal(size=(16, 20, 3)).astype(np.float32)
        dst = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None]
        w = np.abs(rng.normal(size=(16, 20))).astype(np.float32) + 0.1
        R, t = sl.rigid_align_weighted(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-3)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_near_180_degree_rotations(self):
        """Quaternions with w ~ 0 are ~orthogonal to the canonical start; a
        naive power iteration converges to the wrong eigenvector here."""
        rng = np.random.default_rng(7)
        from scipy.spatial.transform import Rotation

        axes = rng.normal(size=(8, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        R_true = Rotation.from_rotvec(axes * (np.pi - 1e-3)).as_matrix().astype(np.float32)
        src = rng.normal(size=(8, 24, 3)).astype(np.float32)
        dst = np.einsum("bij,bnj->bni", R_true, src)
        w = np.ones((8, 24), np.float32)
        R, t = sl.rigid_align_weighted(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-3)

    def test_weights_exclude_outliers(self):
        rng = np.random.default_rng(4)
        from scipy.spatial.transform import Rotation

        R_true = Rotation.random(1, random_state=1).as_matrix()[0].astype(np.float32)
        t_true = np.array([1.0, -2.0, 3.0], np.float32)
        src = rng.normal(size=(30, 3)).astype(np.float32)
        dst = src @ R_true.T + t_true
        dst[25:] += 100.0  # gross outliers
        w = np.ones(30, np.float32)
        w[25:] = 0.0
        R, t = sl.rigid_align_weighted(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-3)


class TestSolve3x3:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(128, 3, 3)).astype(np.float32)
        A += np.eye(3) * 0.5
        b = rng.normal(size=(128, 3)).astype(np.float32)
        x = np.asarray(sl.solve3x3(jnp.asarray(A), jnp.asarray(b)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=2e-2, atol=2e-3)
