"""Distributed blocked Cholesky / inverse / solves via shard_map.

The reference's pdpotrf_/pdpotri_/pdpotrs_ (matrix.cpp:3080-3153)
factor the N x N covariance cooperatively over the BLACS grid.  XLA's
native cholesky on a sharded operand all-gathers it per device, which
at 100k x 100k fp32 (40 GB) exceeds a chip's HBM — so beyond-HBM scale
needs a genuinely distributed factorization.

Design (TPU-first): the matrix is sharded by contiguous row blocks
over mesh axis 'i'.  A right-looking blocked factorization runs ONE
jitted shard_map with a fori_loop over elimination steps:

  1. the diagonal block is psum-broadcast, every device factors it
     redundantly (b x b, trivial);
  2. each device solves its local panel rows against L_kk^T (masked so
     finished rows stay put);
  3. the (N, b) panel is all-gathered over ICI and the trailing
     submatrix update is a local (n_loc, b) @ (b, N) GEMM — the MXU
     does all the O(N^3) work; per-step comm is one N*b all-gather.

LOAD BALANCE comes from the INTERLEAVED ELIMINATION ORDER
(`interleave=G`): elimination step k processes column block
sigma(k) = (k mod G) * (n_blocks/G) + k // G, so with G = n_devices
consecutive steps cycle across the devices' contiguous shards and
every device keeps ~equal trailing rows through the whole
factorization — the role ScaLAPACK's 64x64 block-cyclic BLACS layout
plays (communicator.cpp:82-96), but expressed in the *elimination
schedule* instead of a data permutation.  (A symmetric data
permutation alone cannot balance contiguous shards: whichever device
owns the early elimination positions drains first regardless of which
original rows it holds.)  Eliminating an SPD matrix in any symmetric
order is exact; the returned inverse is in the caller's ORIGINAL
coordinates, and log|A| is order-invariant.  With interleave=1 the
kernels reduce to the plain sequential blocked algorithms and the
Cholesky factor is an ordinary lower-triangular matrix.

The in-place trtri + lauum pipeline (`spd_inverse_logdet_cyclic`)
replaces the solve-against-identity inverse: every stage morphs one
row-sharded (N, N) loop-carry buffer, so the factor->inverse path
holds ~2 resident (N^2/D) buffers per device instead of 4 — the
difference between fitting and OOMing a 100k-individual REML on
8 v5e chips (see reml/distributed_engine.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _elim_geometry(n, n_loc, block, n_blocks, interleave, axis):
    """Per-row / per-column elimination steps for the interleaved order.

    Block b is eliminated at step es(b) = (b mod nbpg)*G + b//nbpg
    (the inverse of sigma); with G = n_devices this makes consecutive
    elimination steps land on consecutive devices' shards."""
    G = interleave
    nbpg = n_blocks // G
    dev = jax.lax.axis_index(axis)
    row0 = jnp.asarray(dev * n_loc, jnp.int32)
    local_rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)[:, 0]
    rblk = local_rows // block
    es_rows = (rblk % nbpg) * G + rblk // nbpg  # (n_loc,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    cblk = cols // block
    es_cols = (cblk % nbpg) * G + cblk // nbpg  # (n,)
    return row0, es_rows, es_cols


def _sigma_col0(k, block, n_blocks, interleave):
    """First column of the block eliminated at step k."""
    G = interleave
    nbpg = n_blocks // G
    blk = (k % G) * nbpg + k // G
    return (blk * block).astype(jnp.int32)


def _local_block_cholesky(a_loc, n_loc, block, n_blocks, axis, interleave):
    """shard_map body: right-looking blocked Cholesky on row-sharded A,
    eliminating in the interleaved order."""
    n = n_blocks * block
    row0, es_r, es_c = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )

    def body(k, carry):
        a_loc, logdet = carry
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)

        # -- 1. psum-broadcast the diagonal block ------------------------
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        cand = jax.lax.dynamic_slice(a_loc, (local_k0, col0), (block, block))
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)
        diag = jax.lax.psum(jnp.where(owns, cand, 0.0), axis)
        l_kk = jnp.linalg.cholesky(diag)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_kk)))

        # -- 2. local panel solve (rows not yet eliminated) --------------
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        solved = jax.lax.linalg.triangular_solve(
            l_kk, c_loc, left_side=False, lower=True, transpose_a=True
        )
        trailing = (es_r > k)[:, None]
        in_diag = (es_r == k)[:, None]
        # diagonal rows receive L_kk; finished rows keep old values
        l_kk_rows = jnp.zeros((n_loc, block), a_loc.dtype)
        l_kk_scatter = jax.lax.dynamic_update_slice(
            l_kk_rows, l_kk, (local_k0, zero)
        )
        panel_loc = jnp.where(
            trailing, solved, jnp.where(in_diag & owns, l_kk_scatter, c_loc)
        )
        a_loc = jax.lax.dynamic_update_slice(a_loc, panel_loc, (zero, col0))

        # -- 3. all-gather the masked panel and update the trailing part -
        panel_masked = jnp.where(trailing, solved, 0.0)
        panel_full = jax.lax.all_gather(panel_masked, axis).reshape(
            -1, block
        )
        update = panel_masked @ panel_full.T  # (n_loc, N)
        # already-eliminated columns must not change:
        update = jnp.where(es_c[None, :] > k, update, 0.0)
        a_loc = a_loc - update
        return a_loc, logdet

    a_loc, logdet = jax.lax.fori_loop(
        0, n_blocks, body, (a_loc, jnp.zeros((), a_loc.dtype))
    )
    # zero the es-space strict upper triangle of the local rows
    a_loc = jnp.where(es_c[None, :] <= es_r[:, None], a_loc, 0.0)
    return a_loc, logdet


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_cholesky(
    a, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """Cholesky factor + log-det of a row-sharded SPD matrix.

    a: (N, N) with N divisible by (devices * block) and n_blocks
    divisible by `interleave`.  Returns (L, logdet) with L sharded the
    same way.  With interleave=1, L is ordinary lower-triangular; with
    interleave=G>1, L is triangular in elimination-step space (entry
    (r, c) nonzero iff es(r) >= es(c)) and must be consumed by the
    matching interleave-aware trtri/solve below.
    """
    n = a.shape[0]
    n_dev = mesh.shape[axis]
    if n % (n_dev * 1) != 0 or n % block != 0:
        raise ValueError(f"N={n} must be divisible by devices and block")
    n_loc = n // n_dev
    n_blocks = n // block
    if n_blocks % interleave != 0:
        raise ValueError(
            f"n_blocks={n_blocks} must be divisible by interleave={interleave}"
        )

    fn = shard_map(
        partial(
            _local_block_cholesky,
            n_loc=n_loc,
            block=block,
            n_blocks=n_blocks,
            axis=axis,
            interleave=interleave,
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(jax.lax.with_sharding_constraint(a, spec))


def _local_tri_solve(l_loc, b_loc, n_loc, block, n_blocks, axis, interleave):
    """Blocked forward substitution: solve L X = B, row-sharded operands,
    visiting blocks in the same interleaved elimination order as the
    factorization that produced L."""
    n = n_blocks * block
    row0, es_r, _ = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )
    nrhs = b_loc.shape[1]

    def body(k, carry):
        b_loc, x_loc = carry
        col0 = _sigma_col0(k, block, n_blocks, interleave)
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
        # update not-yet-solved rows: B -= L[:, k-block] X_k
        l_col = jax.lax.dynamic_slice(l_loc, (zero, col0), (n_loc, block))
        trailing = (es_r > k)[:, None]
        b_loc = b_loc - jnp.where(trailing, l_col @ x_k, 0.0)
        return b_loc, x_loc

    _, x_loc = jax.lax.fori_loop(
        0, n_blocks, body, (b_loc, jnp.zeros_like(b_loc))
    )
    return x_loc


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_triangular_solve(
    l, b, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """Solve L X = B for a row-sharded factor L from
    `distributed_cholesky` (same `interleave`); B (N, nrhs)."""
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
            interleave=interleave,
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


def _local_tri_solve_t(l_loc, b_loc, n_loc, block, n_blocks, axis, interleave):
    """Blocked BACKWARD substitution: solve L^T X = B for a factor in
    interleaved elimination order, visiting steps from last to first.

    x_k = L_kk^-T (b_k - sum_{es_j > k} L[j, cols_k]^T x_j): the inner
    sum is a local (b, n_loc) x (n_loc, nrhs) product psum-reduced over
    devices — the comm dual of the forward solve's broadcast."""
    n = n_blocks * block
    row0, es_r, _ = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )
    nrhs = b_loc.shape[1]

    def body(step, x_loc):
        k = n_blocks - 1 - step
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)

        l_kk_cand = jax.lax.dynamic_slice(l_loc, (local_k0, col0), (block, block))
        l_kk = jax.lax.psum(jnp.where(owns, l_kk_cand, 0.0), axis)
        b_k_cand = jax.lax.dynamic_slice(b_loc, (local_k0, zero), (block, nrhs))
        b_k = jax.lax.psum(jnp.where(owns, b_k_cand, 0.0), axis)

        # sum over already-solved rows (es > k) of L[:, cols_k]^T x
        l_col = jax.lax.dynamic_slice(l_loc, (zero, col0), (n_loc, block))
        solved_rows = (es_r > k)[:, None]
        contrib = (jnp.where(solved_rows, l_col, 0.0)).T @ jnp.where(
            solved_rows, x_loc, 0.0
        )
        s = jax.lax.psum(contrib, axis)
        x_k = jax.lax.linalg.triangular_solve(
            l_kk, b_k - s, left_side=True, lower=True, transpose_a=True
        )
        return jnp.where(
            owns,
            jax.lax.dynamic_update_slice(x_loc, x_k, (local_k0, zero)),
            x_loc,
        )

    return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros_like(b_loc))


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_triangular_solve_t(
    l, b, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """Solve L^T X = B for a row-sharded factor L from
    `distributed_cholesky` (same `interleave`)."""
    n = l.shape[0]
    n_dev = mesh.shape[axis]
    fn = shard_map(
        partial(
            _local_tri_solve_t,
            n_loc=n // n_dev,
            block=block,
            n_blocks=n // block,
            axis=axis,
            interleave=interleave,
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


def _local_block_trtri(l_loc, n_loc, block, n_blocks, axis, interleave):
    """shard_map body: IN-PLACE W = L^{-1} on a row-sharded factor (the
    pdtrtri step of pdpotri_, matrix.cpp:3080-3153).

    LAPACK's blocked dtrtri, last elimination step to first: when step
    k is processed the blocks with es > k already hold THEIR inverse,
    so  W[trail, k] = -T_inv @ L[trail, k] @ L_kk^{-1}  and the
    diagonal block inverts in place.  One (N, b) all-gather per step;
    the O(N^3) work is a full-width local GEMM on the MXU.  The single
    loop-carry buffer is what keeps the beyond-HBM inverse at ~one
    resident (N^2/D) matrix per device instead of the
    solve-against-identity form's three (L, identity RHS, W)."""
    n = n_blocks * block
    row0, es_r, _ = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )

    def body(step, a_loc):
        k = n_blocks - 1 - step
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)

        # original (not yet inverted) diagonal block, psum-broadcast
        cand = jax.lax.dynamic_slice(a_loc, (local_k0, col0), (block, block))
        l_kk = jax.lax.psum(jnp.where(owns, cand, 0.0), axis)

        # original column panel, masked to not-yet-processed rows
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        trailing = (es_r > k)[:, None]
        c_trail = jnp.where(trailing, c_loc, 0.0)
        c_full = jax.lax.all_gather(c_trail, axis).reshape(-1, block)
        # trmm with the already-inverted trailing triangle: the zeroed
        # rows es <= k make this full-width GEMM read only the trailing
        # columns (es-upper entries are zero by construction)
        upd = a_loc @ c_full  # (n_loc, block)
        # trsm against the original diagonal block, with the minus sign
        solved = jax.lax.linalg.triangular_solve(
            l_kk, -upd, left_side=False, lower=True
        )
        # invert the diagonal block (redundantly on every device)
        w_kk = jax.lax.linalg.triangular_solve(
            l_kk, jnp.eye(block, dtype=a_loc.dtype), left_side=True, lower=True
        )
        w_kk_scatter = jax.lax.dynamic_update_slice(
            jnp.zeros((n_loc, block), a_loc.dtype), w_kk, (local_k0, zero)
        )
        in_diag = (es_r == k)[:, None]
        panel_new = jnp.where(
            trailing, solved, jnp.where(in_diag & owns, w_kk_scatter, c_loc)
        )
        return jax.lax.dynamic_update_slice(a_loc, panel_new, (zero, col0))

    return jax.lax.fori_loop(0, n_blocks, body, l_loc)


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_trtri(
    l, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """In-place W = L^{-1} of a row-sharded factor from
    `distributed_cholesky` (same `interleave`)."""
    n = l.shape[0]
    n_dev = mesh.shape[axis]
    fn = shard_map(
        partial(
            _local_block_trtri,
            n_loc=n // n_dev,
            block=block,
            n_blocks=n // block,
            axis=axis,
            interleave=interleave,
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(jax.lax.with_sharding_constraint(l, spec))


def _local_lauum_full(w_loc, n_loc, block, n_blocks, axis, interleave):
    """shard_map body: R = W^T W written FULL (both triangles) in place
    over the W buffer (the pdlauum step of pdpotri_, extended to emit
    the symmetric full matrix so no mirror transient is needed).

    Elimination-order row panels, first to last:
    R[rows_k, :] = W[es>=k rows, cols_k]^T @ W[es>=k rows, :] only
    reads W rows not yet overwritten.  One (b, N) psum per step."""
    n = n_blocks * block
    row0, es_r, _ = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )

    def body(k, a_loc):
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)

        remaining = (es_r >= k)[:, None]
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        c_mask = jnp.where(remaining, c_loc, 0.0)
        # c_mask is zero on the already-overwritten rows, so the second
        # operand needs NO mask (a masked copy of a_loc would cost a
        # full (n_loc, N) temp per iteration — dot operands are
        # materialized, not fused)
        contrib = c_mask.T @ a_loc  # (block, N) local partial products
        r_panel = jax.lax.psum(contrib, axis)
        return jnp.where(
            owns,
            jax.lax.dynamic_update_slice(a_loc, r_panel, (local_k0, zero)),
            a_loc,
        )

    return jax.lax.fori_loop(0, n_blocks, body, w_loc)


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_lauum_full(
    w, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """In-place full-symmetric W^T W of a row-sharded factor-inverse
    from `distributed_trtri` (same `interleave`)."""
    n = w.shape[0]
    n_dev = mesh.shape[axis]
    fn = shard_map(
        partial(
            _local_lauum_full,
            n_loc=n // n_dev,
            block=block,
            n_blocks=n // block,
            axis=axis,
            interleave=interleave,
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(jax.lax.with_sharding_constraint(w, spec))


def _local_spd_inverse_fused(
    v_loc, n_loc, block, n_blocks, axis, interleave
):
    """shard_map body: Cholesky -> trtri -> lauum as ONE fori_loop over
    3*n_blocks steps with a phase switch, so the whole pdpotri pipeline
    lives in a SINGLE loop-carry buffer.

    Run as three separate loops, XLA's buffer assignment (CPU backend,
    measured) keeps v, L and W as three distinct (N^2/D) temps; fused,
    the carry is updated in place and peak temp drops to ~one buffer —
    at 100k x 8 v5e fp32 that is 10 GB resident (kernel + carry)
    instead of 20+, the difference between fitting and OOMing."""
    n = n_blocks * block
    row0, es_r, es_c = _elim_geometry(
        n, n_loc, block, n_blocks, interleave, axis
    )
    # trailing-update column chunking: a full-width GEMM result is an
    # (n_loc, N) temp per iteration — at beyond-HBM N a whole extra
    # N^2/D buffer per device.  Chunked, the temp is N^2/(chunks*D).
    # Below HBM-relevant sizes the chunking is pure loop overhead
    # (measured 3x at n=4096 on one chip), so it only engages at scale.
    n_chunks = 1
    if n >= 16384:
        for d in (8, 4, 2):
            if n_blocks % d == 0:
                n_chunks = d
                break
    chunk_cols = n // n_chunks

    def chol_step(k, a_loc):
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)
        cand = jax.lax.dynamic_slice(a_loc, (local_k0, col0), (block, block))
        diag = jax.lax.psum(jnp.where(owns, cand, 0.0), axis)
        l_kk = jnp.linalg.cholesky(diag)
        inc = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_kk)))
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        solved = jax.lax.linalg.triangular_solve(
            l_kk, c_loc, left_side=False, lower=True, transpose_a=True
        )
        trailing = (es_r > k)[:, None]
        in_diag = (es_r == k)[:, None]
        l_kk_scatter = jax.lax.dynamic_update_slice(
            jnp.zeros((n_loc, block), a_loc.dtype), l_kk, (local_k0, zero)
        )
        panel_loc = jnp.where(
            trailing, solved, jnp.where(in_diag & owns, l_kk_scatter, c_loc)
        )
        a_loc = jax.lax.dynamic_update_slice(a_loc, panel_loc, (zero, col0))
        panel_masked = jnp.where(trailing, solved, 0.0)
        panel_full = jax.lax.all_gather(panel_masked, axis).reshape(-1, block)

        def upd_chunk(j, a_l):
            c0 = (j * chunk_cols).astype(jnp.int32)
            seg = jax.lax.dynamic_slice(a_l, (zero, c0), (n_loc, chunk_cols))
            pf = jax.lax.dynamic_slice(
                panel_full, (c0, zero), (chunk_cols, block)
            )
            es_seg = jax.lax.dynamic_slice(
                es_c[None, :], (jnp.int32(0), c0), (1, chunk_cols)
            )
            upd = panel_masked @ pf.T
            seg = seg - jnp.where(es_seg > k, upd, 0.0)
            return jax.lax.dynamic_update_slice(a_l, seg, (zero, c0))

        a_loc = jax.lax.fori_loop(0, n_chunks, upd_chunk, a_loc)
        # zero this step's es-upper row entries (rows es == k, columns
        # es > k): the standalone kernel does this in one pass after
        # its loop; here trtri/lauum need it done before they run.
        # Row-panel-local so the temp is (block, N), not (n_loc, N).
        row_seg = jax.lax.dynamic_slice(a_loc, (local_k0, zero), (block, n))
        row_seg = jnp.where((es_c[None, :] > k) & owns, 0.0, row_seg)
        a_loc = jax.lax.dynamic_update_slice(a_loc, row_seg, (local_k0, zero))
        return a_loc, inc

    def trtri_step(step, a_loc):
        k = n_blocks - 1 - step
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)
        cand = jax.lax.dynamic_slice(a_loc, (local_k0, col0), (block, block))
        l_kk = jax.lax.psum(jnp.where(owns, cand, 0.0), axis)
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        trailing = (es_r > k)[:, None]
        c_trail = jnp.where(trailing, c_loc, 0.0)
        c_full = jax.lax.all_gather(c_trail, axis).reshape(-1, block)
        upd = a_loc @ c_full
        solved = jax.lax.linalg.triangular_solve(
            l_kk, -upd, left_side=False, lower=True
        )
        w_kk = jax.lax.linalg.triangular_solve(
            l_kk, jnp.eye(block, dtype=a_loc.dtype), left_side=True, lower=True
        )
        w_kk_scatter = jax.lax.dynamic_update_slice(
            jnp.zeros((n_loc, block), a_loc.dtype), w_kk, (local_k0, zero)
        )
        in_diag = (es_r == k)[:, None]
        panel_new = jnp.where(
            trailing, solved, jnp.where(in_diag & owns, w_kk_scatter, c_loc)
        )
        return (
            jax.lax.dynamic_update_slice(a_loc, panel_new, (zero, col0)),
            jnp.zeros((), a_loc.dtype),
        )

    def lauum_step(k, a_loc):
        col0 = _sigma_col0(k, block, n_blocks, interleave)
        zero = jnp.int32(0)
        local_k0 = jnp.clip(col0 - row0, 0, n_loc - block).astype(jnp.int32)
        owns = (col0 >= row0) & (col0 + block <= row0 + n_loc)
        remaining = (es_r >= k)[:, None]
        c_loc = jax.lax.dynamic_slice(a_loc, (zero, col0), (n_loc, block))
        c_mask = jnp.where(remaining, c_loc, 0.0)
        # no second-operand mask: c_mask's zero rows already exclude the
        # overwritten rows, and a masked a_loc copy would cost a full
        # (n_loc, N) temp per iteration
        contrib = c_mask.T @ a_loc
        r_panel = jax.lax.psum(contrib, axis)
        a_loc = jnp.where(
            owns,
            jax.lax.dynamic_update_slice(a_loc, r_panel, (local_k0, zero)),
            a_loc,
        )
        return a_loc, jnp.zeros((), a_loc.dtype)

    def body(i, carry):
        a_loc, logdet = carry
        phase = i // n_blocks
        k = i % n_blocks
        a_loc, inc = jax.lax.switch(
            phase,
            [chol_step, trtri_step, lauum_step],
            k,
            a_loc,
        )
        return a_loc, logdet + inc

    return jax.lax.fori_loop(
        0, 3 * n_blocks, body, (v_loc, jnp.zeros((), v_loc.dtype))
    )


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "interleave"))
def distributed_spd_inverse_fused(
    v, mesh: Mesh, axis: str = "i", block: int = 256, interleave: int = 1
):
    """A^{-1} + log|A| of a row-sharded SPD matrix in ONE fused
    single-carry kernel (see `_local_spd_inverse_fused`)."""
    n = v.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev != 0 or n % block != 0:
        raise ValueError(f"N={n} must be divisible by devices and block")
    n_blocks = n // block
    if n_blocks % interleave != 0:
        raise ValueError(
            f"n_blocks={n_blocks} must be divisible by interleave={interleave}"
        )
    fn = shard_map(
        partial(
            _local_spd_inverse_fused,
            n_loc=n // n_dev,
            block=block,
            n_blocks=n_blocks,
            axis=axis,
            interleave=interleave,
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P()),
    )
    spec = NamedSharding(mesh, P(axis, None))
    return fn(jax.lax.with_sharding_constraint(v, spec))


def _pick_interleave(n: int, n_dev: int, block: int) -> int:
    """Largest balanced interleave factor: n_dev when the shapes allow
    (the requirement is n_blocks % G == 0; with N divisible by
    n_dev*block that always holds), else 1."""
    n_blocks = n // block
    if n_dev > 1 and n % (n_dev * block) == 0 and n_blocks % n_dev == 0:
        return n_dev
    return 1


def cyclic_block_permutation(n: int, n_dev: int, block: int) -> np.ndarray:
    """Row permutation p with A_cyc[i, j] = A[p[i], p[j]]: contiguous
    shard d of the permuted matrix holds the ORIGINAL row blocks
    d, d+D, 2D+d, ... — ScaLAPACK's block-cyclic data assignment
    (communicator.cpp:82-96) expressed as a symmetric permutation.

    Kept for data-layout consumers (tests, re-sharding helpers); the
    factorization kernels above get their balance from the interleaved
    ELIMINATION order instead, which needs no data movement.

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
    """A^{-1} + log|A| of a row-sharded SPD matrix, in the caller's
    coordinates: interleaved-elimination blocked Cholesky -> in-place
    trtri -> in-place full lauum (the pdpotrf_+pdpotri_ replacement,
    matrix.cpp:3080-3153, with the reference's balanced layout).

    The three stages run as ONE fused single-carry kernel, so peak
    memory is ~1 resident (N^2/D) working buffer per device beyond the
    inputs (XLA keeps separate stage outputs alive otherwise — measured
    3x) — the difference between fitting and OOMing a 100k x 8-chip
    v5e REML iteration.  Below HBM-relevant sizes the memory economy
    is irrelevant and the fused kernel's thin per-step ops lose to one
    big triangular solve + syrk (measured 2-3x at n=4096), so small
    operands take the solve-identity form.  Trace-time host work only
    depends on static shapes, so this is safe inside jit."""
    n = v.shape[0]
    G = _pick_interleave(n, mesh.shape[axis], block)
    if n < 16384:
        l, logdet = distributed_cholesky(v, mesh, axis, block, interleave=G)
        eye = jax.lax.with_sharding_constraint(
            jnp.eye(n, dtype=v.dtype), NamedSharding(mesh, P(axis, None))
        )
        w = distributed_triangular_solve(
            l, eye, mesh, axis, block, interleave=G
        )
        vi = jax.lax.with_sharding_constraint(
            w.T @ w, NamedSharding(mesh, P(axis, None))
        )
        return vi, logdet
    return distributed_spd_inverse_fused(v, mesh, axis, block, interleave=G)


# the engine-facing alias: same function, named for the call site
spd_inverse_logdet_presharded = spd_inverse_logdet_cyclic


def spd_solve_cyclic(a, b, mesh: Mesh, axis: str = "i", block: int = 256):
    """A^{-1} B + log|A| (caller's coordinates) via the interleaved
    factorization and forward + backward blocked triangular solves."""
    n = a.shape[0]
    G = _pick_interleave(n, mesh.shape[axis], block)
    l, logdet = distributed_cholesky(a, mesh, axis, block, interleave=G)
    y = distributed_triangular_solve(l, b, mesh, axis, block, interleave=G)
    x = distributed_triangular_solve_t(l, y, mesh, axis, block, interleave=G)
    return x, logdet


def distributed_spd_solve(a, b, mesh: Mesh, axis: str = "i", block: int = 256):
    """A^{-1} B + logdet via the sequential-order distributed Cholesky
    + two blocked solves (interleave=1: L is plainly triangular).

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
