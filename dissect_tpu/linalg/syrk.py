"""Symmetric rank-k accumulation — the GRM hot kernel.

Parity: Matrix::multiply(Z, 'T', Z, 'N') -> pdsyrk_ (matrix.cpp:2682),
consumed by the GRM build kernel = Z^T Z, N = missings^T missings
(kernel.cpp:92-109).

TPU-first design: the genotype matrix arrives as (M_chunk, N) blocks of
raw int8 dosages; standardization (d - 2p)/sqrt(2p(1-p)), missing -> 0
(genotype.cpp:888-970) fuses into the matmul input on device, and the
N x N Gram matrix accumulates across chunks — a lax.scan when the data
is resident, or a host-driven feed for the streaming 1M-SNP path.  On a
device mesh the (M, N) operand is sharded P('i', 'j') and XLA SPMD turns
the contraction over the SNP axis into local matmuls + psum over 'i'.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def standardize_chunk(dosage, mean, inv_std, dtype):
    """GCTA standardization of an (M, N) chunk: z = (d - 2p)/std.

    `mean` = 2 p2 and `inv_std` are per-SNP (M,) vectors; missing maps
    to 0 so it contributes nothing to the Gram matrix (parity:
    genotype.cpp:943-961 where missing stays 0 after centering/scaling).
    Integer chunks (PLINK hard calls) mark missing as -1; float chunks
    (BGEN expected dosages, genotypebgen.cpp) mark missing as NaN.
    Returns (Z, observed) both in `dtype`.
    """
    if jnp.issubdtype(dosage.dtype, jnp.floating):
        observed = jnp.isfinite(dosage).astype(dtype)
        d = jnp.where(jnp.isfinite(dosage), dosage, 0).astype(dtype)
    else:
        observed = (dosage >= 0).astype(dtype)
        d = dosage.astype(dtype)
    z = observed * (d - mean[:, None].astype(dtype)) * inv_std[:, None].astype(dtype)
    return z, observed


@partial(jax.jit, static_argnames=("accum_dtype",))
def syrk(z, accum_dtype=jnp.float32):
    """Z^T Z with explicit accumulation dtype (MXU-friendly)."""
    return jax.lax.dot_general(
        z,
        z,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    )


@partial(jax.jit, static_argnames=("compute_dtype", "accum_dtype"))
def grm_update(kernel, counts, dosage, mean, inv_std, compute_dtype=jnp.float32, accum_dtype=jnp.float32):
    """One accumulation step: kernel += Z_c^T Z_c, counts += O_c^T O_c."""
    z, observed = standardize_chunk(dosage, mean, inv_std, compute_dtype)
    kernel = kernel + jax.lax.dot_general(
        z, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    ).astype(kernel.dtype)
    counts = counts + jax.lax.dot_general(
        observed, observed, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    ).astype(counts.dtype)
    return kernel, counts


@partial(
    jax.jit,
    static_argnames=("compute_dtype", "block_n", "block_m", "interpret"),
)
def grm_update_packed(
    kernel_tiles, counts_tiles, dosage, mean, inv_std,
    compute_dtype=jnp.bfloat16, block_n=512, block_m=2048, interpret=False,
):
    """Packed-triangle accumulation step: only the lower-triangle tiles
    of Z_c^T Z_c / O_c^T O_c are computed (linalg/pallas_syrk.py; the
    pdsyrk_ economy, matrix.cpp:2682) and stay packed across chunks."""
    from dissect_tpu.linalg.pallas_syrk import syrk_triangle_packed

    z, observed = standardize_chunk(dosage, mean, inv_std, compute_dtype)
    kernel_tiles = kernel_tiles + syrk_triangle_packed(
        z, block_n, block_m, interpret
    )
    counts_tiles = counts_tiles + syrk_triangle_packed(
        observed, block_n, block_m, interpret
    )
    return kernel_tiles, counts_tiles


class grm_accumulator:
    """Streaming GRM builder: feed (chunk, N) dosage blocks, finalize to
    (kernel, counts).

    The host loop feeds decoded BED chunks; each `update` is one jitted
    fused standardize+syrk step.  This is the TPU equivalent of the
    reference's block-row BED streaming + pdsyrk accumulation
    (genotype.cpp:639-707, kernel.cpp:92-109).

    triangle=True switches to the Pallas triangle-only kernel: tiles
    accumulate PACKED (half the MXU work per chunk — measured 1.4x the
    XLA full-syrk throughput on v5e) and the symmetric matrix is
    mirrored once in finalize().  Requires a TPU backend (or
    interpret=True for testing).
    """

    def __init__(self, n_individuals: int, dtype=jnp.float32, accum_dtype=None,
                 compute_dtype=None, sharding: Optional[jax.sharding.Sharding] = None,
                 triangle: bool = False, block_n: int = 512,
                 block_m: int = 2048, interpret: bool = False):
        accum_dtype = accum_dtype or (jnp.float32 if dtype == jnp.bfloat16 else dtype)
        self.n = n_individuals
        self.triangle = triangle
        self.block_n = block_n
        self.block_m = block_m
        self.interpret = interpret
        self.accum_dtype = accum_dtype
        self.compute_dtype = compute_dtype or dtype
        self.dtype = dtype
        if triangle:
            from dissect_tpu.linalg.pallas_syrk import packed_shape

            shape = packed_shape(n_individuals, block_n)
            self.kernel = jnp.zeros(shape, jnp.float32)
            self.counts = jnp.zeros(shape, jnp.float32)
        else:
            self.kernel = jnp.zeros((n_individuals, n_individuals), dtype=dtype)
            self.counts = jnp.zeros((n_individuals, n_individuals), dtype=dtype)
            if sharding is not None:
                self.kernel = jax.device_put(self.kernel, sharding)
                self.counts = jax.device_put(self.counts, sharding)

    def update(self, dosage, mean, inv_std):
        if self.triangle:
            dosage = jnp.asarray(dosage)
            if jnp.issubdtype(dosage.dtype, jnp.integer):
                # hard calls: single fused standardize+dual-syrk pass
                from dissect_tpu.linalg.pallas_syrk import (
                    grm_fused_triangle_update,
                )

                self.kernel, self.counts = grm_fused_triangle_update(
                    dosage, jnp.asarray(mean), jnp.asarray(inv_std),
                    self.kernel, self.counts,
                    block_n=self.block_n, block_m=self.block_m,
                    interpret=self.interpret,
                    compute_dtype=self.compute_dtype,
                )
            else:  # imputed dosages (float/NaN): two-pass packed path
                self.kernel, self.counts = grm_update_packed(
                    self.kernel, self.counts, dosage,
                    jnp.asarray(mean), jnp.asarray(inv_std),
                    compute_dtype=self.compute_dtype,
                    block_n=self.block_n, block_m=self.block_m,
                    interpret=self.interpret,
                )
        else:
            self.kernel, self.counts = grm_update(
                self.kernel, self.counts, jnp.asarray(dosage),
                jnp.asarray(mean), jnp.asarray(inv_std),
                compute_dtype=self.compute_dtype, accum_dtype=self.accum_dtype,
            )
        return self

    def finalize(self):
        if self.triangle:
            from dissect_tpu.linalg.pallas_syrk import unpack_triangle

            return (
                unpack_triangle(self.kernel, self.n, self.block_n).astype(self.dtype),
                unpack_triangle(self.counts, self.n, self.block_n).astype(self.dtype),
            )
        return self.kernel, self.counts
