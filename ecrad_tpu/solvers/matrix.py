"""Batched small-matrix operations for the SPARTACUS solvers.

Reference: radiation/radiation_matrix.F90 (mat_x_vec L64, mat_x_mat L145,
solve_vec L737, solve_mat L769, expm L805, fast_expm_exchange_2 L914,
fast_expm_exchange_3 L952).

TPU formulation: matrices are (..., m, m) arrays with arbitrary leading
batch dims (typically (ncol, ng)); all ops are dense einsums / batched
``jnp.linalg.solve`` that XLA vectorizes over the batch.  The reference's
per-matrix variable squaring count in ``expm`` becomes a fixed-trip masked
squaring loop (data-independent control flow for jit).  The "shortwave"
sparsity pattern of radiation_matrix.F90:145-216 is a compile-time zero
structure that dense matmuls preserve, so no special-casing is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pade-7 coefficients (radiation_matrix.F90:813-818)
_THETA3 = 3.925724783138660
_C = (17297280.0, 8648640.0, 1995840.0, 277200.0, 25200.0, 1512.0, 56.0,
      1.0)
# Hard cap on the squaring count (norms up to ~2^60 * theta3); the loop
# below runs only to the batch-max exponent, so typical cost is ~5-16
# squarings.
_MAX_SQUARINGS = 60


def mat_x_vec(A, b):
    """out_i = sum_j A[...,i,j] b[...,j]."""
    return jnp.einsum("...ij,...j->...i", A, b)


def _lu_nopivot(A):
    """Unrolled LU factorization without pivoting, vectorized over the
    batch (radiation_matrix.F90:639-674 lu_factorization).  Returns the
    packed LU as a list-of-lists of (...,) arrays.

    No pivoting matches the reference; the SPARTACUS matrices are
    strongly diagonally dominant.  Unrolling to elementwise FMAs keeps
    the TPU path in true f32 (no bf16 dot_general) and compiles fast."""
    m = A.shape[-1]
    LU = [[A[..., i, j] for j in range(m)] for i in range(m)]
    for k in range(m - 1):
        inv_diag = 1.0 / LU[k][k]
        for i in range(k + 1, m):
            LU[i][k] = LU[i][k] * inv_diag
            for j in range(k + 1, m):
                LU[i][j] = LU[i][j] - LU[i][k] * LU[k][j]
    return LU


def _lu_sub(LU, b):
    """Forward/back substitution (radiation_matrix.F90:681-706);
    b is a list of (...,) arrays, returns the same."""
    m = len(LU)
    y = list(b)
    for i in range(1, m):
        for j in range(i):
            y[i] = y[i] - LU[i][j] * y[j]
    x = [None] * m
    x[m - 1] = y[m - 1] / LU[m - 1][m - 1]
    for i in range(m - 2, -1, -1):
        acc = y[i]
        for j in range(i + 1, m):
            acc = acc - LU[i][j] * x[j]
        x[i] = acc / LU[i][i]
    return x


def solve_vec(A, b):
    """Solve A x = b for batched small matrices
    (radiation_matrix.F90:737-762)."""
    LU = _lu_nopivot(A)
    m = A.shape[-1]
    x = _lu_sub(LU, [b[..., i] for i in range(m)])
    return jnp.stack(x, axis=-1)


def solve_mat(A, B):
    """Solve A X = B for batched small matrices
    (radiation_matrix.F90:769-792)."""
    LU = _lu_nopivot(A)
    m = A.shape[-1]
    cols = []
    for j in range(B.shape[-1]):
        x = _lu_sub(LU, [B[..., i, j] for i in range(m)])
        cols.append(jnp.stack(x, axis=-1))
    return jnp.stack(cols, axis=-1)


def expm(A):
    """Matrix exponential by Pade-7 scaling-and-squaring
    (radiation_matrix.F90:805-903), batched over leading dims."""
    m = A.shape[-1]
    eye = jnp.eye(m, dtype=A.dtype)
    # 1-norm: max over columns of sum over rows of |A|
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    # number of squarings: exponent such that norm/2^expo <= theta3,
    # matching Fortran fraction()/exponent() semantics (= ceil(log2 x))
    x = norm / _THETA3
    frac, expo = jnp.frexp(jnp.maximum(x, 1e-300))
    expo = jnp.where(frac == 0.5, expo - 1, expo)
    expo = jnp.maximum(expo, 0)
    A = A * jnp.exp2(-expo)[..., None, None].astype(A.dtype)

    A2 = A @ A
    A4 = A2 @ A2
    A6 = A2 @ A4
    V = _C[7] * A6 + _C[5] * A4 + _C[3] * A2 + _C[1] * eye
    U = A @ V
    V = _C[6] * A6 + _C[4] * A4 + _C[2] * A2 + _C[0] * eye
    R = solve_mat(V - U, 2.0 * U) + eye

    n_needed = jnp.minimum(jnp.max(expo), _MAX_SQUARINGS)

    def cond(state):
        i, _ = state
        return i < n_needed

    def body(state):
        i, R = state
        sq = R @ R
        return i + 1, jnp.where((i < expo)[..., None, None], sq, R)

    _, R = jax.lax.while_loop(cond, body, (jnp.int32(0), R))
    return R


def fast_expm_exchange_2(a, b):
    """expm of (-a b; a -b) via Putzer's algorithm
    (radiation_matrix.F90:914-938).  a, b (...,) -> (..., 2, 2)."""
    s = a + b
    factor = (1.0 - jnp.exp(-s)) / jnp.maximum(1.0e-12, s)
    R00 = 1.0 - factor * a
    R10 = factor * a
    R01 = factor * b
    R11 = 1.0 - factor * b
    return jnp.stack(
        [jnp.stack([R00, R01], -1), jnp.stack([R10, R11], -1)], -2)


def fast_expm_exchange_3(a, b, c, d):
    """expm of (-a b 0; a -b-c d; 0 c -d) by diagonalization
    (radiation_matrix.F90:952-1028).  Returns (..., 3, 3)."""
    eps = 1.0e-12
    dtype = jnp.result_type(a, b, c, d)
    tiny = jnp.finfo(dtype).eps
    tmp1 = 0.5 * (a + b + c + d)
    tmp2 = jnp.sqrt(jnp.maximum(0.0, tmp1 * tmp1 - (a * c + a * d + b * d)))
    tmp2 = jnp.maximum(tmp2, tiny * tmp1)
    lam1 = -tmp1 + tmp2
    lam2 = -tmp1 - tmp2

    def safe_div(num, den):
        return num / jnp.where(
            jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)

    one = jnp.ones_like(a)
    V = jnp.stack([
        jnp.stack([safe_div(jnp.maximum(eps, b), a + lam1),
                   safe_div(b, a + lam2),
                   b / jnp.maximum(eps, a)], -1),
        jnp.stack([one, one, one], -1),
        jnp.stack([safe_div(c, d + lam1),
                   safe_div(c, d + lam2),
                   jnp.maximum(eps, c) / jnp.maximum(eps, d)], -1),
    ], -2)
    diag = jnp.stack([jnp.exp(lam1), jnp.exp(lam2), jnp.ones_like(lam1)],
                     -1)
    # R = V @ diag(diag) @ V^-1; W = diag @ V^-1 solved as W^T = V^-T D
    # (radiation_matrix.F90:570-631 diag_mat_right_divide_3)
    D = diag[..., None] * jnp.eye(3, dtype=dtype)
    W = jnp.swapaxes(solve_mat(jnp.swapaxes(V, -1, -2), D), -1, -2)
    return V @ W
