"""Batched tiny-SPD solves, unrolled for the VPU.

The per-SNP mixed-model fits (gwas/mlm.py) solve millions of (q, q)
systems with q = #covariates+1 (typically 2-5) and a (2, 2) Fisher
system per Newton iteration.  `jnp.linalg.solve` lowers these to
batched LU with row pivoting — a `lax.while_loop`-heavy path that XLA
cannot vectorize well on TPU.  The systems are SPD (normal-equation
Gram matrices, ML-F information matrices; reference solves them with
LAPACK dpotrf/dposv, reml.cpp:1859-1871), so an UNROLLED Cholesky —
q(q+1)/2 elementwise vector ops over the batch axis, no pivoting, no
loops — is both exact and an order of magnitude faster at these sizes.

q is static at trace time, so the unrolled graph is fixed; every
operation is a (batch,)-shaped VPU op that XLA fuses freely.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cholesky_small", "cho_solve_small", "solve_spd_small",
           "inv_spd_small", "solve_spd_auto", "inv_spd_auto",
           "cholesky_diag_small", "MAX_UNROLL_Q"]

# Above this (static) size the unrolled graphs grow as q^2-q^3 ops and
# compile time dominates; batched LAPACK-style kernels win back.
MAX_UNROLL_Q = 8


def cholesky_small(a):
    """Unrolled Cholesky of (..., q, q) SPD; returns the factor entries
    as a dict {(i, j): (...)-array} for i >= j (no (…, q, q) scatter —
    consumers index entries directly, keeping everything fusible)."""
    q = a.shape[-1]
    l = {}
    for j in range(q):
        d = a[..., j, j]
        for k in range(j):
            d = d - l[(j, k)] * l[(j, k)]
        ljj = jnp.sqrt(d)
        l[(j, j)] = ljj
        for i in range(j + 1, q):
            off = a[..., i, j]
            for k in range(j):
                off = off - l[(i, k)] * l[(j, k)]
            l[(i, j)] = off / ljj
    return l


def cho_solve_small(l, b):
    """Solve L L' x = b for b of shape (..., q); returns (..., q)."""
    q = max(i for i, _ in l) + 1
    y = []
    for i in range(q):
        t = b[..., i]
        for k in range(i):
            t = t - l[(i, k)] * y[k]
        y.append(t / l[(i, i)])
    x = [None] * q
    for i in reversed(range(q)):
        t = y[i]
        for k in range(i + 1, q):
            t = t - l[(k, i)] * x[k]
        x[i] = t / l[(i, i)]
    return jnp.stack(x, axis=-1)


def solve_spd_small(a, b):
    """x = a^{-1} b for SPD (..., q, q) and (..., q) — unrolled, no LU."""
    return cho_solve_small(cholesky_small(a), b)


def inv_spd_small(a):
    """Full inverse of SPD (..., q, q) via q unrolled cho-solves against
    the identity columns."""
    q = a.shape[-1]
    l = cholesky_small(a)
    eye = jnp.eye(q, dtype=a.dtype)
    cols = [
        cho_solve_small(l, jnp.broadcast_to(eye[j], a.shape[:-2] + (q,)))
        for j in range(q)
    ]
    return jnp.stack(cols, axis=-1)


def cholesky_diag_small(a):
    """Just the Cholesky diagonal of SPD (..., q, q), stacked (..., q) —
    enough for logdet and the PD check (NaN/non-positive on failure)."""
    l = cholesky_small(a)
    q = a.shape[-1]
    return jnp.stack([l[(j, j)] for j in range(q)], axis=-1)


def solve_spd_auto(a, b):
    """Unrolled solve when q is small (static), batched LU otherwise."""
    if a.shape[-1] <= MAX_UNROLL_Q:
        return solve_spd_small(a, b)
    import jax.numpy as _jnp

    return _jnp.linalg.solve(a, b[..., None])[..., 0]


def inv_spd_auto(a):
    """Unrolled inverse when q is small (static), batched LU otherwise."""
    if a.shape[-1] <= MAX_UNROLL_Q:
        return inv_spd_small(a)
    import jax.numpy as _jnp

    return _jnp.linalg.inv(a)
