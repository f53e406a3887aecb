"""Pallas TPU kernel: triangle-only blocked syrk (Z^T Z).

The GRM Gram matrix is symmetric, but XLA's dot_general computes all
N^2 output tiles — 2x the needed MXU work at large N (the reference
gets the same economy from pdsyrk_, matrix.cpp:2682).  This kernel
walks only the lower-triangle tile pairs: a scalar-prefetched
(t -> (i, j)) tile map drives a packed 1D grid of T = nt(nt+1)/2 tile
pairs with the SNP-axis contraction as the inner grid dimension,
accumulating each (BN, BN) output tile in place across contraction
steps (double-buffered DMA handled by the Pallas pipeline).  The full
symmetric matrix is restored by a cheap mirror (tril + tril^T - diag).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _syrk_kernel(imap_ref, jmap_ref, zi_ref, zj_ref, out_ref):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        zi_ref[:],
        zj_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=("block_n", "block_m", "interpret"),
)
def syrk_triangle(z, block_n: int = 512, block_m: int = 1024, interpret: bool = False):
    """Full symmetric Z^T Z (float32) computing only lower-triangle tiles.

    z: (M, N) float32/bfloat16; M and N are padded to the block sizes
    (zero rows/columns contribute nothing).
    """
    m, n = z.shape
    n_pad = (-n) % block_n
    m_pad = (-m) % block_m
    if n_pad or m_pad:
        z = jnp.pad(z, ((0, m_pad), (0, n_pad)))
    mp, np_ = z.shape
    nt = np_ // block_n
    kc = mp // block_m

    pairs = [(i, j) for i in range(nt) for j in range(i + 1)]
    imap = jnp.asarray([p[0] for p in pairs], dtype=jnp.int32)
    jmap = jnp.asarray([p[1] for p in pairs], dtype=jnp.int32)
    t = len(pairs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, kc),
        in_specs=[
            pl.BlockSpec(
                (block_m, block_n),
                index_map=lambda ti, kb, imap, jmap: (kb, imap[ti]),
            ),
            pl.BlockSpec(
                (block_m, block_n),
                index_map=lambda ti, kb, imap, jmap: (kb, jmap[ti]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, block_n),
            index_map=lambda ti, kb, imap, jmap: (ti, 0, 0),
        ),
    )

    tiles = pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, block_n, block_n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * block_m * kc * block_n * block_n,
            bytes_accessed=int(2 * z.size * z.dtype.itemsize),
            transcendentals=0,
        ),
    )(imap, jmap, z, z)

    # reconstruct the full symmetric matrix with ONE gather over the packed
    # tile index (per-tile dynamic_update_slice chains serialize badly)
    tile_idx = np.zeros((nt, nt), dtype=np.int32)
    needs_t = np.zeros((nt, nt), dtype=bool)
    for ti, (i, j) in enumerate(pairs):
        tile_idx[i, j] = ti
        tile_idx[j, i] = ti
        needs_t[j, i] = i != j
    full4 = tiles[jnp.asarray(tile_idx)]  # (nt, nt, bn, bn)
    full4 = jnp.where(
        jnp.asarray(needs_t)[:, :, None, None],
        jnp.swapaxes(full4, 2, 3),
        full4,
    )
    sym = full4.transpose(0, 2, 1, 3).reshape(np_, np_)
    return sym[:n, :n]


def _kernel_out_squeeze(out_ref):
    return out_ref


def syrk_triangle_reference(z):
    """Plain XLA syrk for correctness comparison."""
    return jax.lax.dot_general(
        z, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
