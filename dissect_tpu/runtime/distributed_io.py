"""Multi-host data ingestion — the collective-IO replacement.

The reference reads BED block-rows per MPI process and scatters them
over the BLACS grid (readBEDFile, genotype.cpp:548-787;
MPI_File_write_at_all, communicator.cpp:565-628).  The TPU equivalent
(SURVEY §2.5): every host memmaps the SAME .bed file but decodes only
its own SNP-row shard, then `jax.make_array_from_process_local_data`
assembles the global sharded array — no inter-host genotype traffic at
all; the DCN only carries the psum of GRM partial sums.

Axis mapping for a multi-host GRM run:
  mesh ('i', 'j') with 'i' = hosts x local-devices over the SNP axis
  (DCN-friendly: each host's shard stays local until the reduction)
  and 'j' over individuals (ICI collectives inside each host).

Single-process runs degrade to a plain device_put with the same
shardings, so every code path here is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dissect_tpu.runtime.mesh import MeshContext


def snp_shard_bounds(
    n_snps: int, process_index: Optional[int] = None, process_count: Optional[int] = None
) -> Tuple[int, int]:
    """The [start, stop) SNP-row range this host is responsible for.

    Contiguous equal shards (the per-process block-row segments of
    genotype.cpp:639-707); the last host absorbs the remainder.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_host = math.ceil(n_snps / process_count)
    start = min(process_index * per_host, n_snps)
    stop = min(start + per_host, n_snps)
    return start, stop


def global_sharded_array(
    local_rows: np.ndarray,
    global_shape: Tuple[int, ...],
    ctx: MeshContext,
    spec: P = P("i", None),
) -> jax.Array:
    """Assemble a globally sharded array from per-host row blocks.

    Multi-process: `jax.make_array_from_process_local_data` — each host
    contributes only its shard, XLA never moves genotypes over DCN.
    Single-process: a plain sharded device_put of the (complete) rows.
    """
    sharding = ctx.sharding(spec)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape
    )


def stream_grm_sharded(
    data,
    ctx: MeshContext,
    chunk_size: int = 4096,
    dtype=jnp.float32,
):
    """Streaming GRM with the N x N kernel sharded P('i','j') on the mesh.

    Each accumulation step ships one decoded SNP chunk to the devices
    (replicated over 'i', sharded over 'j' by individuals is handled by
    XLA's SPMD partitioner) and adds Z_c^T Z_c into the sharded kernel.
    This is the multi-chip path of kernel.cpp:92-109; per-chunk comm is
    one psum-equivalent inserted by SPMD.
    """
    from dissect_tpu.linalg.syrk import grm_accumulator

    stats = data.stats()
    if bool(stats.monomorphic.any()):
        raise ValueError("monomorphic SNPs present; filter them first")
    mean = stats.mean
    inv_std = 1.0 / stats.std
    acc = grm_accumulator(
        data.n_individuals,
        dtype=dtype,
        sharding=ctx.sharding(P("i", "j")),
    )
    with ctx.mesh:
        for start, stop, chunk in data.iter_chunks(chunk_size):
            mu, istd = mean[start:stop], inv_std[start:stop]
            if stop - start < chunk_size:
                pad = chunk_size - (stop - start)
                fill = np.nan if np.issubdtype(chunk.dtype, np.floating) else -1
                chunk = np.concatenate(
                    [chunk, np.full((pad, chunk.shape[1]), fill, dtype=chunk.dtype)]
                )
                mu = np.concatenate([mu, np.zeros(pad)])
                istd = np.concatenate([istd, np.ones(pad)])
            acc.update(chunk, mu, istd)
        kernel, counts = acc.finalize()
        normalized = kernel / jnp.where(counts == 0, 1.0, counts)
    return normalized, counts
