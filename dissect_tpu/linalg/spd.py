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


# XLA's TPU triangular_solve against a full identity (the explicit
# inverse) unrolls into per-panel ~1 GB remat temp clones at n = 20000
# — the whole chip's HBM in dead buffers.  Above this row count the
# inverse runs through the blocked block-cyclic Cholesky pipeline
# (linalg/distributed.py on a 1-device mesh): sequential fori_loop
# panels, bounded temps, same answer.
DENSE_INVERSE_MAX_N = 12288


def spd_inverse_logdet_auto(v, backend=None):
    """Cholesky inverse + logdet, sized for the hardware: XLA's fused
    potrf/trsm below DENSE_INVERSE_MAX_N, the blocked cyclic pipeline
    (identity-padded to the panel quantum) above it.

    `backend` (static) names the platform this trace targets, so the
    1-device mesh matches the operands' placement (the float64 endgame
    traces with CPU-committed operands).  The blocked pipeline is used
    on every backend above the threshold: XLA's explicit
    solve-against-identity mis-scales there on CPU too (observed: a
    20000^2 float64 endgame step dying with SIGSEGV)."""
    n = v.shape[-1]
    if n <= DENSE_INVERSE_MAX_N:
        return spd_inverse_logdet(v)
    import numpy as _np

    import jax as _jax
    from jax.sharding import Mesh

    from dissect_tpu.linalg.distributed import spd_inverse_logdet_cyclic

    block = 512
    pad = (-n) % block
    if pad:
        eye_tail = jnp.eye(n + pad, dtype=v.dtype)
        vp = eye_tail.at[:n, :n].set(v)
    else:
        vp = v
    mesh = Mesh(_np.asarray(_jax.devices(backend)[:1]), ("i",))
    vi, logdet = spd_inverse_logdet_cyclic(vp, mesh, block=block)
    if pad:
        vi = vi[:n, :n]
    ok = jnp.isfinite(logdet) & jnp.all(jnp.isfinite(jnp.diagonal(vi)))
    return vi, logdet, ok


# XLA's TPU LU custom call stages f32[n,128] panels in scoped VMEM and
# fails to COMPILE above roughly this many rows ("Ran out of memory in
# memory space vmem ... LuDecompositionBlock", observed at n=20000 on
# v5e) — and a lax.cond compiles BOTH branches, so merely carrying the
# LU fallback kills huge-V REML.  Above the limit the non-PD fallback
# is a ridge-jittered Cholesky instead.
LU_FALLBACK_MAX_N = 16384


def fallback_inverse_logdet(v, backend=None):
    """Non-PD fallback inverse for the REML covariance.

    Below LU_FALLBACK_MAX_N: general LU inverse with the GCTA
    absolute log-det (Matrix::invert parity, reml.cpp:1859-1871).
    Above it: Cholesky of V + sqrt(eps)*mean|diag| * I — the standard
    ridge repair for barely-indefinite covariances; genuinely singular
    V still reports ok=False and the engine stops gracefully.  Shape
    is static at trace time, so the choice costs nothing in-graph."""
    n = v.shape[-1]
    if n <= LU_FALLBACK_MAX_N:
        return lu_inverse_logdet(v)
    scale = jnp.mean(jnp.abs(jnp.diagonal(v)))
    eps = jnp.asarray(jnp.finfo(v.dtype).eps, v.dtype)
    jitter = scale * jnp.sqrt(eps)
    return spd_inverse_logdet_auto(
        v + jitter * jnp.eye(n, dtype=v.dtype), backend
    )


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
