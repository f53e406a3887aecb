"""Pallas TPU kernel: triangle-only blocked syrk (Z^T Z).

The GRM Gram matrix is symmetric, but XLA's dot_general computes all
N^2 output tiles — 2x the needed MXU work at large N (the reference
gets the same economy from pdsyrk_, matrix.cpp:2682).  This kernel
walks only the lower-triangle tile pairs: a scalar-prefetched
(t -> (i, j)) tile map drives a packed 1D grid of T = nt(nt+1)/2 tile
pairs with the SNP-axis contraction as the inner grid dimension,
accumulating each (BN, BN) output tile in place across contraction
steps (double-buffered DMA handled by the Pallas pipeline).

Layout note (measured on v5e): the packed output MUST be a plain 2D
(T*BN, BN) buffer.  With a (1, BN, BN) leading-unit-dim block Mosaic
picks a layout that caps the kernel at ~55% of the MXU; the 2D layout
reaches ~65% per tile, which — computing only half the tiles — beats
XLA's full syrk: 258 vs 180 effective TF/s at N=8192 bf16 (XLA's full
dot runs at ~90% of the 197 TF/s bf16 peak, so the triangle walk is
the only way past it).

For streaming GRM accumulation keep the tiles PACKED across chunk
updates and mirror once at the end (`unpack_triangle`): the
reconstruction is a pure-bandwidth gather (~1.3 ms at N=8192) that
would otherwise be paid per chunk.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

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


def _pair_maps(nt: int):
    pairs = [(i, j) for i in range(nt) for j in range(i + 1)]
    imap = np.asarray([p[0] for p in pairs], dtype=np.int32)
    jmap = np.asarray([p[1] for p in pairs], dtype=np.int32)
    return pairs, imap, jmap


@partial(jax.jit, static_argnames=("block_n", "block_m", "interpret"))
def syrk_triangle_packed(
    z, block_n: int = 512, block_m: int = 2048, interpret: bool = False
):
    """Lower-triangle tiles of Z^T Z, packed as (T*BN, BN) float32.

    z: (M, N); M and N are padded to the block sizes (zero rows/columns
    contribute nothing).  Tile t of the packed buffer is rows
    [t*BN, (t+1)*BN) and holds output tile (imap[t], jmap[t]) in the
    row-block ordering (0,0), (1,0), (1,1), (2,0), ...
    """
    m, n = z.shape
    n_pad = (-n) % block_n
    m_pad = (-m) % block_m
    if n_pad or m_pad:
        z = jnp.pad(z, ((0, m_pad), (0, n_pad)))
    mp, np_ = z.shape
    nt = np_ // block_n
    kc = mp // block_m
    _, imap, jmap = _pair_maps(nt)
    t = len(imap)

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
            (block_n, block_n),
            index_map=lambda ti, kb, imap, jmap: (ti, 0),
        ),
    )

    return pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * block_n, block_n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * block_m * kc * block_n * block_n,
            bytes_accessed=int(2 * z.size * z.dtype.itemsize),
            transcendentals=0,
        ),
    )(jnp.asarray(imap), jnp.asarray(jmap), z, z)


@partial(jax.jit, static_argnames=("n", "block_n"))
def unpack_triangle(tiles, n: int, block_n: int = 512):
    """(T*BN, BN) packed lower-triangle tiles -> full symmetric (n, n).

    One gather over the packed tile index (per-tile
    dynamic_update_slice chains serialize badly on TPU)."""
    np_ = -(-n // block_n) * block_n
    nt = np_ // block_n
    pairs, _, _ = _pair_maps(nt)
    t = len(pairs)
    tiles = tiles.reshape(t, block_n, block_n)
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


@partial(jax.jit, static_argnames=("block_n", "block_m", "interpret"))
def syrk_triangle(z, block_n: int = 512, block_m: int = 2048, interpret: bool = False):
    """Full symmetric Z^T Z (float32) computing only lower-triangle tiles."""
    n = z.shape[1]
    tiles = syrk_triangle_packed(z, block_n, block_m, interpret)
    return unpack_triangle(tiles, n, block_n)


def packed_shape(n: int, block_n: int = 512) -> Tuple[int, int]:
    """Shape of the packed tile buffer for an n-column operand."""
    nt = -(-n // block_n)
    return (nt * (nt + 1) // 2 * block_n, block_n)


def _grm_fused_kernel(
    imap_ref, jmap_ref, d_i_ref, d_j_ref, mean_ref, istd_ref,
    kern_acc_ref, cnt_acc_ref, kern_ref, cnt_ref, *, compute_dtype,
):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        kern_ref[:] = kern_acc_ref[:]
        cnt_ref[:] = cnt_acc_ref[:]

    mean = mean_ref[:].astype(compute_dtype)  # (bm, 1) broadcasts over cols
    istd = istd_ref[:].astype(compute_dtype)
    one = jnp.asarray(1.0, compute_dtype)
    zero = jnp.asarray(0.0, compute_dtype)
    # obs = (d >= 0) as clip(d+1, 0, 1): Mosaic lacks int8 vector cmp,
    # and d is in {-1, 0, 1, 2} so the arithmetic form is exact
    d_i = d_i_ref[:].astype(compute_dtype)
    obs_i = jnp.clip(d_i + one, zero, one)
    z_i = obs_i * (d_i - mean) * istd
    d_j = d_j_ref[:].astype(compute_dtype)
    obs_j = jnp.clip(d_j + one, zero, one)
    z_j = obs_j * (d_j - mean) * istd
    dims = (((0,), (0,)), ((), ()))
    kern_ref[:] += jax.lax.dot_general(
        z_i, z_j, dims, preferred_element_type=jnp.float32
    )
    cnt_ref[:] += jax.lax.dot_general(
        obs_i, obs_j, dims, preferred_element_type=jnp.float32
    )


@partial(
    jax.jit,
    static_argnames=("block_n", "block_m", "interpret", "compute_dtype"),
    donate_argnums=(3, 4),
)
def grm_fused_triangle_update(
    dosage, mean, inv_std, kernel_tiles, counts_tiles,
    block_n: int = 512, block_m: int = 2048, interpret: bool = False,
    compute_dtype=jnp.bfloat16,
):
    """One streaming-GRM step, fully fused in a single Pallas pass.

    Loads int8 dosage tiles (-1 = missing; 1 byte/elem vs 4 for a
    pre-standardized fp32 Z), standardizes (d - mean) * inv_std with
    missing -> 0 in VMEM (genotype.cpp:888-970), and accumulates BOTH
    the lower-triangle tiles of Z^T Z and of obs^T obs in place
    (input/output aliasing — no separate HLO add pass over the packed
    buffers).  This is the production GRM hot loop: one HBM read of
    the dosage chunk per output-tile row, all O(M N^2) work on the MXU.
    """
    m, n = dosage.shape
    n_pad = (-n) % block_n
    m_pad = (-m) % block_m
    if n_pad or m_pad:
        # pad with missing (-1): contributes nothing to either product
        dosage = jnp.pad(dosage, ((0, m_pad), (0, n_pad)), constant_values=-1)
        mean = jnp.pad(mean, (0, m_pad))
        inv_std = jnp.pad(inv_std, (0, m_pad))
    mp, np_ = dosage.shape
    nt = np_ // block_n
    kc = mp // block_m
    _, imap, jmap = _pair_maps(nt)
    t = len(imap)

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
            pl.BlockSpec(
                (block_m, 1), index_map=lambda ti, kb, imap, jmap: (kb, 0)
            ),
            pl.BlockSpec(
                (block_m, 1), index_map=lambda ti, kb, imap, jmap: (kb, 0)
            ),
            pl.BlockSpec(
                (block_n, block_n),
                index_map=lambda ti, kb, imap, jmap: (ti, 0),
            ),
            pl.BlockSpec(
                (block_n, block_n),
                index_map=lambda ti, kb, imap, jmap: (ti, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_n, block_n),
                index_map=lambda ti, kb, imap, jmap: (ti, 0),
            ),
            pl.BlockSpec(
                (block_n, block_n),
                index_map=lambda ti, kb, imap, jmap: (ti, 0),
            ),
        ],
    )
    shape = jax.ShapeDtypeStruct((t * block_n, block_n), jnp.float32)
    # the (block_m, 1) mean/istd blocks pad to 128 lanes in VMEM, which
    # together with the aliased accumulator tiles exceeds the default
    # 16 MB scoped-vmem budget — raise it (v5e has 128 MB of VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        partial(_grm_fused_kernel, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=[shape, shape],
        # inputs: imap jmap d_i d_j mean istd kern_acc cnt_acc
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t * block_m * kc * block_n * block_n,
            bytes_accessed=int(2 * dosage.size),
            transcendentals=0,
        ),
    )(
        jnp.asarray(imap),
        jnp.asarray(jmap),
        dosage,
        dosage,
        mean.astype(jnp.float32).reshape(-1, 1),
        inv_std.astype(jnp.float32).reshape(-1, 1),
        kernel_tiles,
        counts_tiles,
    )


def syrk_triangle_reference(z):
    """Plain XLA syrk for correctness comparison."""
    return jax.lax.dot_general(
        z, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
