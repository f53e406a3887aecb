"""QR decomposition + dependent-column detection.

Parity: Matrix::QRDecomposition / getDependentColumns = pdgeqrf_ with an
R-diagonal threshold test (matrix.cpp:3501-3600, matrix.h:578-590), used
by grouped GWAS to drop linearly dependent SNP columns before the joint
fit (gwas.cpp:916-967).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def qr_r_diagonal(a):
    """|diag(R)| of the QR factorization of a."""
    r = jnp.linalg.qr(a, mode="r")
    return jnp.abs(jnp.diagonal(r))


def dependent_columns(a, threshold: float = 1e-8) -> np.ndarray:
    """Indices of linearly dependent columns of `a`.

    Greedy like the reference: a column is dependent when its pivot
    |R[j,j]| falls below threshold * max|R| (matrix.cpp:3501-3600).
    Returns a host int array of column indices to drop.
    """
    diag = np.asarray(qr_r_diagonal(jnp.asarray(a)))
    scale = diag.max() if diag.size else 1.0
    if scale == 0.0:
        return np.arange(a.shape[1])
    return np.nonzero(diag < threshold * scale)[0]
