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

import os
from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def _eigh_full_device(a):
    return jnp.linalg.eigh(a)


def _host_eigh_preferred(n: int) -> bool:
    """True when the one-off dense eigh should run on HOST LAPACK.

    XLA's accelerator eigh is a trace-time-unrolled spectral D&C whose
    serialized executables grow super-linearly (measured v5e: 0.5 MB at
    n=256, 79 MB at n=512, 254 MB at n=1024, 359 MB at n=2048):
    compiling takes minutes, and even a persistent-cache HIT must push
    hundreds of MB into the runtime — the round-4 "warm-cache MLM GWAS
    still compiles 62 s" was exactly these loads.  For the one-off
    diagonalizations (kernel diagonalize, GWAS covariance rotation,
    PCA) at host-manageable sizes, LAPACK dsyevd wins end-to-end.
    Above `DISSECT_TPU_HOST_EIGH_MAX` (default 8192) the device solve
    — or the distributed D&C on a mesh — takes over."""
    if jax.default_backend() == "cpu":
        return False  # CPU jit eigh IS host LAPACK
    try:
        cap = int(os.environ.get("DISSECT_TPU_HOST_EIGH_MAX", "") or 8192)
    except ValueError:
        cap = 8192
    return 256 < n <= cap


def eigh_full(a):
    """Eigenvalues (ascending) + eigenvectors of a symmetric matrix.

    Backend-aware (see _host_eigh_preferred): giant-program accelerator
    eighs at host-manageable sizes run on host LAPACK in float64 and
    come back in the input dtype."""
    n = a.shape[0]
    if not isinstance(a, jax.core.Tracer) and _host_eigh_preferred(n):
        import numpy as np

        w, v = np.linalg.eigh(np.asarray(a, dtype=np.float64))
        dtype = getattr(a, "dtype", jnp.float64)
        return jnp.asarray(w, dtype=dtype), jnp.asarray(v, dtype=dtype)
    return _eigh_full_device(a)


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
