"""Symmetric eigensolver — kernel diagonalization and PCA.

Parity: Matrix::eigenDecomposition -> pdsyev_ with lwork query
(matrix.cpp:3327-3380), consumed by Kernel::diagonalizeKernel
(kernel.cpp:2106-2141), PCA (pca.cpp:36-102) and the diagonal REML fast
path (reml.cpp:480-545).

TPU-first: XLA lowers eigh to a QDWH-based spectral divide-and-conquer
built from matmuls — already MXU-friendly.  For top-k (PCA) a randomized
subspace iteration (matmul-rich) avoids the full O(N^3) solve when
k << N.  Eigenvalues are returned ascending (jnp.linalg.eigh order);
callers that need the reference's ordering handle it explicitly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def eigh_full(a):
    """Eigenvalues (ascending) + eigenvectors of a symmetric matrix."""
    return jnp.linalg.eigh(a)


@partial(jax.jit, static_argnames=("k", "n_iter", "seed"))
def eigh_topk(a, k, n_iter=12, seed=0):
    """Top-k eigenpairs via randomized subspace iteration.

    Matmul-rich (TPU-friendly) alternative to a full eigh for PCA when
    k << N (parity target: pca.cpp:36-102 keeps --num-eval vectors).
    Returns (w, v) with w descending, v of shape (N, k).
    """
    n = a.shape[0]
    over = min(n, k + 8)
    q = jax.random.normal(jax.random.PRNGKey(seed), (n, over), dtype=a.dtype)
    q, _ = jnp.linalg.qr(a @ q)

    def body(_, q):
        q, _ = jnp.linalg.qr(a @ q)
        return q

    q = jax.lax.fori_loop(0, n_iter, body, q)
    # Rayleigh–Ritz on the subspace
    t = q.T @ (a @ q)
    w, s = jnp.linalg.eigh(t)
    w = w[::-1][:k]
    v = (q @ s)[:, ::-1][:, :k]
    return w, v
