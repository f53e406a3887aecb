"""Trace identities — avoiding O(N^3) products inside the REML loop.

Parity: Matrix::traceOfMatrixProduct computes tr(A B) as the local
elementwise sum A .* B^T + gather, never forming the product
(matrix.cpp:3835-3918); Matrix::diagonalOfABAt computes diag(A B A^T)
via the (A B) .* A row-sum trick (matrix.cpp:3920-3960).  Both are
einsums here; XLA fuses and shards them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def trace_of_product(a, b):
    """tr(a @ b) = sum(a * b.T) without forming the product."""
    return jnp.einsum("ij,ji->", a, b)


@jax.jit
def trace_of_product_symmetric(a, b):
    """tr(a @ b) when either operand is symmetric: sum(a * b)."""
    return jnp.einsum("ij,ij->", a, b)


@jax.jit
def diag_of_abat(a, b):
    """diag(A B A^T) as row-sums of (A B) .* A (matrix.cpp:3920-3960)."""
    return jnp.einsum("ij,jk,ik->i", a, b, a)


@jax.jit
def diag_of_aat(a):
    """diag(A A^T) = row squared norms."""
    return jnp.einsum("ij,ij->i", a, a)
