"""Batched closed-form small-matrix linear algebra for the pose solvers.

``jnp.linalg.{eigh, svd, lstsq}`` on TPU lower to generic iterative
decompositions (Jacobi/QDWH) built from many sequential XLA ops — fine for
one big matrix, terrible for 4096 tiny ones under vmap (the RANSAC
hypothesis stage, pose/ransac.py).  Every routine here is straight-line
elementwise/matmul code: it vmaps and runs at VPU speed with no loops other
than short, statically unrolled ones.

Used by pose/epnp.py; each routine is golden-tested against NumPy/LAPACK in
tests/test_small_linalg.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jax.Array):
    """Eigen-decomposition of a symmetric (..., 3, 3) matrix, ascending.

    Analytic eigenvalues (Cardano / trigonometric form, the standard
    noniterative method for symmetric 3x3) + eigenvectors from cross
    products of (A - lambda I) rows, with degeneracy-safe fallbacks.

    Returns (eigvals (..., 3) ascending, eigvecs (..., 3, 3) columns).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    Aq = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    B = Aq / p[..., None, None]
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues of B are 2cos(phi + 2k pi/3); descending order mapping
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    vals = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    def eigvec(lam):
        # (A - lam I) has rank <= 2; its row-space spans the orthogonal
        # complement of the eigenvector -> cross products of two rows give
        # the eigenvector.  Pick the largest of the three cross products.
        M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
        norms = jnp.sum(cands * cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)[
            ..., 0, :
        ]
        n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
        # degenerate (repeated eigenvalue): cross products vanish; fall back
        # to an arbitrary unit vector — orthogonalized below
        fallback = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0], A.dtype), v.shape
        )
        return jnp.where(n > 1e-6, v / n, fallback)

    v0 = eigvec(vals[..., 0])
    v2 = eigvec(vals[..., 2])
    # enforce orthogonality (exact for distinct eigenvalues; repairs the
    # degenerate cases): v2 <- v2 - (v2.v0)v0, middle vector = v0 x v2
    v2 = v2 - jnp.sum(v2 * v0, -1, keepdims=True) * v0
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, -1, keepdims=True), _EPS))
    alt = jnp.cross(v0, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], A.dtype), v0.shape))
    altn = alt / jnp.sqrt(jnp.maximum(jnp.sum(alt * alt, -1, keepdims=True), _EPS))
    v2 = jnp.where(n2 > 1e-6, v2 / n2, altn)
    v1 = jnp.cross(v2, v0)
    return vals, jnp.stack([v0, v1, v2], axis=-1)


def cholesky_unrolled(A: jax.Array, n: int) -> jax.Array:
    """Cholesky of a PD (..., n, n) matrix, statically unrolled (n small).

    Straight-line code: n(n+1)/2 batched scalar ops, no XLA loops.
    """
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, _EPS))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0]) for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(L: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """Solve A x = b given L = cholesky(A); statically unrolled."""
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def solve_psd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve a small PD system via the unrolled Cholesky (static n)."""
    n = A.shape[-1]
    return cho_solve_unrolled(cholesky_unrolled(A, n), b, n)


def smallest_eigvecs(
    A: jax.Array, num: int = 2, shift: float = 1e-4, iters: int = 8
):
    """The ``num`` eigenvectors of smallest eigenvalue of a symmetric PSD
    (..., n, n) matrix, by shifted inverse iteration with deflation.

    One Cholesky factorization of (A + shift*scale*I) (unrolled, static n)
    + ``iters`` triangular solves per vector.  Accuracy concentrates exactly
    where the EPnP kernel needs it: the near-null directions.

    Returns (..., n, num), columns orthonormal, ascending eigenvalue order.
    """
    n = A.shape[-1]
    scale = jnp.maximum(jnp.trace(A, axis1=-2, axis2=-1) / n, 1.0)
    M = A + (shift * scale)[..., None, None] * jnp.eye(n, dtype=A.dtype)
    L = cholesky_unrolled(M, n)

    vecs = []
    for j in range(num):
        # deterministic start vector, de-correlated across j
        v = jnp.broadcast_to(
            jnp.eye(n, dtype=A.dtype)[:, j % n], A.shape[:-2] + (n,)
        ) + 0.1 * jnp.ones(A.shape[:-2] + (n,), A.dtype)
        for _ in range(iters):
            for u in vecs:  # deflate previously found directions
                v = v - jnp.sum(v * u, -1, keepdims=True) * u
            v = cho_solve_unrolled(L, v, n)
            v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), _EPS))
        for u in vecs:
            v = v - jnp.sum(v * u, -1, keepdims=True) * u
        v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), _EPS))
        vecs.append(v)
    return jnp.stack(vecs, axis=-1)


def _det3(a, idx_r, idx_c):
    r0, r1, r2 = idx_r
    c0, c1, c2 = idx_c
    return (
        a[..., r0, c0] * (a[..., r1, c1] * a[..., r2, c2] - a[..., r1, c2] * a[..., r2, c1])
        - a[..., r0, c1] * (a[..., r1, c0] * a[..., r2, c2] - a[..., r1, c2] * a[..., r2, c0])
        + a[..., r0, c2] * (a[..., r1, c0] * a[..., r2, c1] - a[..., r1, c1] * a[..., r2, c0])
    )


def _adj4(A: jax.Array) -> jax.Array:
    """Adjugate of a (..., 4, 4) matrix via cofactors (straight-line)."""
    idx = [0, 1, 2, 3]
    cols = []
    for j in range(4):
        col = []
        for i in range(4):
            rows = [r for r in idx if r != i]
            cs = [c for c in idx if c != j]
            sign = -1.0 if (i + j) % 2 else 1.0
            col.append(sign * _det3(A, rows, cs))
        cols.append(jnp.stack(col, axis=-1))
    # adj(A)[j, i] = cofactor(i, j): stack cols as rows of the transpose
    return jnp.stack(cols, axis=-2)


def rigid_align_weighted(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted rigid alignment dst ~= R @ src + t via Horn's quaternion
    method — the SVD-free Umeyama.  The optimal quaternion is the largest
    eigenvector of the symmetric 4x4 N-matrix; found by a short power
    iteration (shifted to make the target eigenvalue dominant), which is
    straight-line batched code unlike jnp.linalg.svd.

    src, dst: (..., N, 3); w: (..., N) nonnegative.
    Returns (R (..., 3, 3), t (..., 3)).
    """
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), _EPS)
    mu_s = jnp.einsum("...n,...ni->...i", wn, src)
    mu_d = jnp.einsum("...n,...ni->...i", wn, dst)
    S = jnp.einsum(
        "...n,...ni,...nj->...ij", wn, src - mu_s[..., None, :], dst - mu_d[..., None, :]
    )  # 3x3 correlation (src x dst)

    sxx, sxy, sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    syx, syy, syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    szx, szy, szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
        ],
        axis=-2,
    )  # (..., 4, 4) symmetric

    # shift so the max eigenvalue is the dominant in magnitude: eigenvalues
    # of N are bounded by its Frobenius norm (and trace(N) = 0)
    fro = jnp.sqrt(jnp.maximum(jnp.sum(N * N, (-2, -1)), _EPS))
    M = N + fro[..., None, None] * jnp.eye(4, dtype=N.dtype)
    # a single fixed start can be ~orthogonal to the optimal quaternion
    # (e.g. w ~ 0 for near-180-degree rotations) and stall the iteration on
    # the wrong eigenvector; propagate all 4 canonical starts through M^3
    # and keep the one with the largest Rayleigh quotient.
    P = M @ M @ M  # columns = M^3 e_j
    Pn = P / jnp.sqrt(
        jnp.maximum(jnp.sum(P * P, axis=-2, keepdims=True), _EPS)
    )
    ray = jnp.einsum("...ij,...ik,...kj->...j", Pn, N, Pn)  # per-column q^T N q
    best = jnp.argmax(ray, axis=-1)
    q = jnp.take_along_axis(
        Pn, best[..., None, None].repeat(4, -2), axis=-1
    )[..., 0]
    for _ in range(6):
        q = jnp.einsum("...ij,...j->...i", M, q)
        q = q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), _EPS))
    # Rayleigh-quotient inverse-iteration polish (cubic convergence): the
    # solve direction of (N - lam I)^-1 q equals adj(N - lam I) q, and the
    # 4x4 adjugate is straight-line cofactor math — no LAPACK loops.
    for _ in range(2):
        lam = jnp.einsum("...i,...ij,...j->...", q, N, q)
        A = N - (lam + 1e-6 * fro)[..., None, None] * jnp.eye(4, dtype=N.dtype)
        q = jnp.einsum("...ij,...j->...i", _adj4(A), q)
        q = q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), _EPS))

    w0, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w0), 2 * (x * z + y * w0)], -1),
            jnp.stack([2 * (x * y + z * w0), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w0)], -1),
            jnp.stack([2 * (x * z - y * w0), 2 * (y * z + x * w0), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Closed-form (adjugate) solve of a general (..., 3, 3) system."""
    c0 = jnp.cross(A[..., :, 1], A[..., :, 2])
    c1 = jnp.cross(A[..., :, 2], A[..., :, 0])
    c2 = jnp.cross(A[..., :, 0], A[..., :, 1])
    det = jnp.sum(A[..., :, 0] * c0, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _EPS, det, jnp.where(det >= 0, _EPS, -_EPS))
    x0 = jnp.sum(c0 * b, -1) * inv_det
    x1 = jnp.sum(c1 * b, -1) * inv_det
    x2 = jnp.sum(c2 * b, -1) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
