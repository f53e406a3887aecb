"""SPD inverse + log-determinant — the REML inner-loop factorization.

Parity: Matrix::symmetricInvert = pdpotrf_ + pdpotri_ with log-det
accumulated from the Cholesky diagonal, optional fp32 variant
(matrix.cpp:3080-3153); Matrix::invert = pdgetrf_ + pdgetri_ LU with
GCTA-style absolute log-det fallback (matrix.cpp:3155-3300), used when
the Cholesky fails (reml.cpp:1859-1871).

TPU-first: XLA's native cholesky/triangular_solve run on-device; non-PD
detection is NaN-probing of the factor (no host round-trip inside jit).
The fp32-early / fp64-late policy of the reference maps to running these
at the Policy.solve dtype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def cholesky_logdet(v):
    """(L, logdet, ok): lower Cholesky factor, log|V|, and PD flag."""
    chol = jnp.linalg.cholesky(v)
    diag = jnp.diagonal(chol)
    ok = jnp.all(jnp.isfinite(diag)) & jnp.all(diag > 0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(diag > 0, diag, 1.0)))
    return chol, logdet, ok


@jax.jit
def spd_inverse_logdet(v):
    """Full SPD inverse + log-det via Cholesky (pdpotrf+pdpotri parity).

    Returns (v_inv, logdet, ok).  On non-PD input ok=False and the
    caller falls back to `lu_inverse_logdet` (reml.cpp:1859-1871) or an
    eigenvalue bend (Matrix::bendMatrix, matrix.cpp:3382+).
    """
    chol, logdet, ok = cholesky_logdet(v)
    eye = jnp.eye(v.shape[-1], dtype=v.dtype)
    linv = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True, transpose_a=False
    )
    v_inv = linv.T @ linv
    return v_inv, logdet, ok


@jax.jit
def spd_solve(v, b):
    """V^{-1} b via Cholesky solve; returns (x, logdet, ok)."""
    chol, logdet, ok = cholesky_logdet(v)
    y = jax.lax.linalg.triangular_solve(chol, b, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )
    return x, logdet, ok


@jax.jit
def lu_inverse_logdet(v):
    """General inverse + GCTA-style absolute log-det via LU.

    Parity: Matrix::invert (pdgetrf+pdgetri, matrix.cpp:3155-3300) which
    sums log|diag(U)| — the sign of the determinant is discarded, as in
    GCTA's REML fallback.
    """
    lu, piv = jax.scipy.linalg.lu_factor(v)
    diag = jnp.diagonal(lu)
    ok = jnp.all(jnp.isfinite(diag)) & jnp.all(diag != 0)
    logdet = jnp.sum(jnp.log(jnp.abs(jnp.where(diag != 0, diag, 1.0))))
    eye = jnp.eye(v.shape[-1], dtype=v.dtype)
    v_inv = jax.scipy.linalg.lu_solve((lu, piv), eye)
    return v_inv, logdet, ok


@partial(jax.jit, static_argnames=("min_eigenvalue_ratio",))
def bend_matrix(v, min_eigenvalue_ratio=1e-10):
    """Clip eigenvalues upward to repair a non-PD symmetric matrix.

    Parity: Matrix::bendMatrix (matrix.cpp:3382+): eigendecompose and
    raise small/negative eigenvalues to a floor relative to the largest.
    """
    w, q = jnp.linalg.eigh(v)
    floor = jnp.maximum(w[-1], 0.0) * min_eigenvalue_ratio
    w = jnp.maximum(w, floor)
    return (q * w[None, :]) @ q.T
