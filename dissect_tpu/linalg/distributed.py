"""Distributed blocked Cholesky + triangular solve via shard_map.

The reference's pdpotrf_/pdpotrs_ (matrix.cpp:3080-3153) factor the
N x N covariance cooperatively over the BLACS grid.  XLA's native
cholesky on a sharded operand all-gathers it per device, which at
100k x 100k fp32 (40 GB) exceeds a chip's HBM — so beyond-HBM scale
needs a genuinely distributed factorization.

Design (TPU-first): the matrix is sharded by contiguous row blocks over
mesh axis 'i'.  A right-looking blocked factorization runs ONE jitted
shard_map with a fori_loop over column blocks:

  1. the diagonal block A_kk is psum-broadcast, every device factors it
     redundantly (b x b, trivial);
  2. each device solves its local panel rows against L_kk^T (masked so
     finished rows stay put);
  3. the (N, b) panel is all-gathered over ICI and the trailing
     submatrix update is a local (n_loc, b) @ (b, N) GEMM — the MXU does
     all the O(N^3) work; per-step comm is one N*b all-gather.

The kernel itself uses contiguous row shards; LOAD BALANCE comes from
the block-CYCLIC symmetric permutation applied by the spd helpers
below (`cyclic_block_permutation`): factoring P A P^T, where shard d
holds row blocks d, d+D, 2D+d, ..., keeps every device busy through
the whole factorization — the reference's 64x64 block-cyclic BLACS
layout (communicator.cpp:82-96) — instead of devices with early rows
idling once their panel is done (~2x tail loss).  log|A| is invariant
under the symmetric permutation, and solves/inverses are returned in
ORIGINAL coordinates (A^-1 = W^T W with W = L~^-1 P).  Log-det
accumulates from the diagonal factors.  `distributed_triangular_solve`
implements the matching blocked forward substitution (psum-broadcast
of each X_k).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_block_cholesky(a_loc, n_loc, block, n_blocks, axis):
    """shard_map body: right-looking blocked Cholesky on row-sharded A."""
    dev = jax.lax.axis_index(axis)
    row0 = jnp.asarray(dev * n_loc, jnp.int32)  # first global row owned
    n = n_blocks * block
    local_rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)[:, 0]

    def body(k, carry):
        a_loc, logdet = carry
        col0 = jnp.asarray(k * block, jnp.int32)
        zero = jnp.int32(0)

        # -- 1. psum-broadcast the diagonal block ------------------------
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        cand = jax.lax.dynamic_slice(a_loc, (local_k0, col0), (block, block))
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)
        diag = jax.lax.psum(jnp.where(owns, cand, 0.0), axis)
        l_kk = jnp.linalg.cholesky(diag)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_kk)))

        # -- 2. local panel solve (rows strictly below the block) --------
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        solved = jax.lax.linalg.triangular_solve(
            l_kk, c_loc, left_side=False, lower=True, transpose_a=True
        )
        below = (local_rows >= col0 + block)[:, None]
        in_diag = ((local_rows >= col0) & (local_rows < col0 + block))[:, None]
        # diagonal rows receive L_kk; rows above keep old values (final)
        l_kk_rows = jnp.zeros((n_loc, block), a_loc.dtype)
        l_kk_scatter = jax.lax.dynamic_update_slice(
            l_kk_rows, l_kk, (local_k0, zero)
        )
        panel_loc = jnp.where(
            below, solved, jnp.where(in_diag & owns, l_kk_scatter, c_loc)
        )
        a_loc = jax.lax.dynamic_update_slice(a_loc, panel_loc, (zero, col0))

        # -- 3. all-gather the masked panel and update the trailing part -
        panel_masked = jnp.where(below, solved, 0.0)
        panel_full = jax.lax.all_gather(panel_masked, axis).reshape(
            -1, block
        )
        update = panel_masked @ panel_full.T  # (n_loc, N), zero cols <= k b
        # columns within [0, col0 + block) must not change:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        update = jnp.where(col_ids >= col0 + block, update, 0.0)
        a_loc = a_loc - update
        return a_loc, logdet

    a_loc, logdet = jax.lax.fori_loop(
        0, n_blocks, body, (a_loc, jnp.zeros((), a_loc.dtype))
    )
    # zero the strict upper triangle of the local rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_loc, n), 1)
    a_loc = jnp.where(col_ids <= local_rows[:, None], a_loc, 0.0)
    return a_loc, logdet


@partial(jax.jit, static_argnames=("mesh", "axis", "block"))
def distributed_cholesky(a, mesh: Mesh, axis: str = "i", block: int = 256):
    """Lower Cholesky factor + log-det of a row-sharded SPD matrix.

    a: (N, N) with N divisible by (devices * block).  Returns (L, logdet)
    with L sharded the same way.
    """
    n = a.shape[0]
    n_dev = mesh.shape[axis]
    if n % (n_dev * 1) != 0 or n % block != 0:
        raise ValueError(f"N={n} must be divisible by devices and block")
    n_loc = n // n_dev
    n_blocks = n // block

    fn = shard_map(
        partial(
            _local_block_cholesky,
            n_loc=n_loc,
            block=block,
            n_blocks=n_blocks,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(jax.lax.with_sharding_constraint(a, spec))


def _local_tri_solve(l_loc, b_loc, n_loc, block, n_blocks, axis):
    """Blocked forward substitution: solve L X = B, row-sharded operands."""
    dev = jax.lax.axis_index(axis)
    row0 = jnp.asarray(dev * n_loc, jnp.int32)
    local_rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)[:, 0]
    nrhs = b_loc.shape[1]

    def body(k, carry):
        b_loc, x_loc = carry
        col0 = jnp.asarray(k * block, jnp.int32)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)

        l_kk_cand = jax.lax.dynamic_slice(l_loc, (local_k0, col0), (block, block))
        l_kk = jax.lax.psum(jnp.where(owns, l_kk_cand, 0.0), axis)
        b_k_cand = jax.lax.dynamic_slice(b_loc, (local_k0, zero), (block, nrhs))
        b_k = jax.lax.psum(jnp.where(owns, b_k_cand, 0.0), axis)
        x_k = jax.lax.linalg.triangular_solve(
            l_kk, b_k, left_side=True, lower=True
        )
        # store into the owner's local X rows
        x_loc = jnp.where(
            owns,
            jax.lax.dynamic_update_slice(x_loc, x_k, (local_k0, zero)),
            x_loc,
        )
        # update remaining rows: B -= L[:, k-block] X_k, rows > (k+1) b
        l_col = jax.lax.dynamic_slice(l_loc, (zero, col0), (n_loc, block))
        below = (local_rows >= col0 + block)[:, None]
        b_loc = b_loc - jnp.where(below, l_col @ x_k, 0.0)
        return b_loc, x_loc

    _, x_loc = jax.lax.fori_loop(
        0, n_blocks, body, (b_loc, jnp.zeros_like(b_loc))
    )
    return x_loc


@partial(jax.jit, static_argnames=("mesh", "axis", "block"))
def distributed_triangular_solve(
    l, b, mesh: Mesh, axis: str = "i", block: int = 256
):
    """Solve L X = B for lower-triangular row-sharded L; B (N, nrhs)."""
    n = l.shape[0]
    n_dev = mesh.shape[axis]
    n_loc = n // n_dev
    n_blocks = n // block
    fn = shard_map(
        partial(
            _local_tri_solve,
            n_loc=n_loc,
            block=block,
            n_blocks=n_blocks,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(
        jax.lax.with_sharding_constraint(l, spec),
        jax.lax.with_sharding_constraint(b, spec),
    )


def cyclic_block_permutation(n: int, n_dev: int, block: int) -> np.ndarray:
    """Row permutation p with A_cyc[i, j] = A[p[i], p[j]]: contiguous
    shard d of the permuted matrix holds the ORIGINAL row blocks
    d, d+D, d+2D, ... — ScaLAPACK's block-cyclic assignment
    (communicator.cpp:82-96) expressed as a symmetric permutation, so
    the contiguous-shard kernels above get balanced trailing updates.

    Requires n divisible by n_dev*block (the factorization quantum)."""
    nb = n // block
    if n % block or nb % n_dev:
        raise ValueError(
            f"N={n} must be divisible by devices*block={n_dev * block}"
        )
    order = np.concatenate([np.arange(d, nb, n_dev) for d in range(n_dev)])
    return (
        order[:, None] * block + np.arange(block)[None, :]
    ).reshape(-1)


def spd_inverse_logdet_cyclic(v, mesh: Mesh, axis: str = "i", block: int = 256):
    """A^{-1} (in ORIGINAL coordinates) + log|A| via the block-cyclic
    blocked Cholesky: factor P A P^T, solve L~ W = P, return W^T W.

    Trace-time host work only depends on static shapes, so this is
    safe inside jit.  The pdpotrf_+pdpotri_ replacement
    (matrix.cpp:3080-3153) with the reference's balanced layout."""
    n = v.shape[0]
    perm = cyclic_block_permutation(n, mesh.shape[axis], block)
    vp = v[perm][:, perm]
    l, logdet = distributed_cholesky(vp, mesh, axis, block)
    row_spec = NamedSharding(mesh, P(axis, None))
    p_mat = jax.lax.with_sharding_constraint(
        jnp.eye(n, dtype=v.dtype)[perm], row_spec
    )
    w = distributed_triangular_solve(l, p_mat, mesh, axis, block)  # L~^-1 P
    vi = jax.lax.with_sharding_constraint(w.T @ w, row_spec)
    return vi, logdet


def spd_solve_cyclic(a, b, mesh: Mesh, axis: str = "i", block: int = 256):
    """A^{-1} B (original coordinates) + logdet via the block-cyclic
    factorization and two blocked triangular solves."""
    n = a.shape[0]
    perm = cyclic_block_permutation(n, mesh.shape[axis], block)
    inv_perm = np.argsort(perm)
    ap = a[perm][:, perm]
    l, logdet = distributed_cholesky(ap, mesh, axis, block)
    y = distributed_triangular_solve(l, b[perm], mesh, axis, block)
    lt_flipped = jnp.flip(l.T, (0, 1))
    x = distributed_triangular_solve(
        lt_flipped, jnp.flip(y, 0), mesh, axis, block
    )
    return jnp.flip(x, 0)[inv_perm], logdet


def distributed_spd_solve(a, b, mesh: Mesh, axis: str = "i", block: int = 256):
    """A^{-1} B + logdet via distributed Cholesky + two blocked solves.

    The backward substitution reuses the forward solver on the reversed
    problem: L^T x = y  <=>  (J L J)^T-reversed system with J the
    anti-identity — implemented by flipping rows/cols.
    """
    l, logdet = distributed_cholesky(a, mesh, axis, block)
    y = distributed_triangular_solve(l, b, mesh, axis, block)
    # L^T x = y: flip to turn the upper-triangular solve into a lower one
    lt_flipped = jnp.flip(l.T, (0, 1))
    x = distributed_triangular_solve(
        lt_flipped, jnp.flip(y, 0), mesh, axis, block
    )
    return jnp.flip(x, 0), logdet
