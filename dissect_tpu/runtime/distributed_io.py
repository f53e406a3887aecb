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


def put_replicated_host_data(arr: np.ndarray, sharding) -> jax.Array:
    """Place host data every process already holds onto a (possibly
    multi-host) sharding WITHOUT a collective.

    Multi-process `jax.device_put` to a non-fully-addressable sharding
    runs a cross-process equality check (an allgather) — and the very
    first such collective triggers the CPU backend's Gloo context
    rendezvous, whose hard 30 s key-value timeout any compile-skewed
    worker can blow on a loaded box.  Model state (kernels, y, X) is
    loaded identically by every process (the single-controller
    discipline, misc.cpp:203), so each process can just materialize its
    addressable shards via make_array_from_callback — no rendezvous,
    no data movement."""
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def is_root() -> bool:
    """True on the process that writes result files (the reference's
    root-only Message discipline, message.h:65-83)."""
    return jax.process_index() == 0


def to_host(array) -> np.ndarray:
    """A full host copy of a (possibly multi-host sharded) jax.Array.

    Single-process (or fully-addressable) arrays go straight to numpy;
    otherwise every process reassembles the global value from the
    addressable shards of all hosts (the gatherMatrix analog,
    matrix.cpp:196-340).
    """
    if not hasattr(array, "is_fully_addressable") or array.is_fully_addressable:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def stream_grm_sharded(
    data,
    ctx: MeshContext,
    chunk_size: int = 4096,
    dtype=jnp.float32,
    flat_normalization: bool = False,
):
    """Streaming GRM with the N x N kernel sharded P('i','j') on the mesh.

    Each accumulation step ships one decoded SNP chunk to the devices
    (replicated over 'i', sharded over 'j' by individuals is handled by
    XLA's SPMD partitioner) and adds Z_c^T Z_c into the sharded kernel.
    This is the multi-chip path of kernel.cpp:92-109; per-chunk comm is
    one psum-equivalent inserted by SPMD.

    Multi-process runs decode only the SNP rows owned by this host's
    devices (the per-process BED block-row segments of
    genotype.cpp:639-707): each chunk is assembled as a globally
    sharded array via `make_array_from_callback`, so genotypes never
    cross hosts — only the SPMD-inserted reduction of partial Gram
    matrices does.
    """
    from dissect_tpu.linalg.syrk import grm_accumulator

    stats = data.stats()
    if bool(stats.monomorphic.any()):
        raise ValueError("monomorphic SNPs present; filter them first")
    mean = stats.mean
    inv_std = 1.0 / stats.std
    if jax.process_count() > 1:
        return _stream_grm_multiprocess(
            data, ctx, chunk_size, dtype, flat_normalization, mean, inv_std
        )
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
        if flat_normalization:
            # --grm-flat-normalization: constant SNP count denominator
            # (kernel.cpp:382-460)
            counts = jnp.full_like(counts, float(data.n_snps))
        normalized = kernel / jnp.where(counts == 0, 1.0, counts)
    return normalized, counts


def _stream_grm_multiprocess(
    data, ctx, chunk_size, dtype, flat_normalization, mean, inv_std
):
    """Multi-host GRM: per-host SNP-row decode + SPMD syrk accumulation.

    Every chunk of SNP rows is a global jax.Array sharded P('i', None);
    `make_array_from_callback` hands each addressable shard's global
    row range to the host that owns it, which decodes exactly those
    rows from its memmap of the (shared) .bed file.  The jitted
    accumulation contracts over the sharded SNP axis — XLA inserts the
    cross-host reduction (the MPI_Allreduce of partial Gram matrices).
    """
    from dissect_tpu.linalg.syrk import grm_update

    n, m = data.n_individuals, data.n_snps
    i_size = ctx.mesh.shape["i"]
    g = max(chunk_size // i_size, 1) * i_size  # rows per global chunk
    rows_spec = ctx.sharding(P("i", None))
    kernel = jax.make_array_from_callback(
        (n, n), ctx.sharding(P("i", "j")),
        lambda idx: np.zeros((len(range(*idx[0].indices(n))),
                              len(range(*idx[1].indices(n)))), dtype),
    )
    counts = jax.make_array_from_callback(
        (n, n), ctx.sharding(P("i", "j")),
        lambda idx: np.zeros((len(range(*idx[0].indices(n))),
                              len(range(*idx[1].indices(n)))), dtype),
    )
    with ctx.mesh:
        for start in range(0, m, g):
            def decode(idx, start=start):
                lo, hi, _ = idx[0].indices(g)
                s, e = start + lo, min(start + hi, m)
                block = np.full((hi - lo, n), -1, dtype=np.int8)
                if s < e:
                    block[: e - s] = data.decode_chunk(s, e)
                return block

            dosage = jax.make_array_from_callback((g, n), rows_spec, decode)
            stop = min(start + g, m)
            mu = np.zeros(g)
            istd = np.ones(g)
            mu[: stop - start] = mean[start:stop]
            istd[: stop - start] = inv_std[start:stop]
            kernel, counts = grm_update(
                kernel, counts, dosage, jnp.asarray(mu), jnp.asarray(istd),
                compute_dtype=dtype, accum_dtype=jnp.float32,
            )
        if flat_normalization:
            counts = jnp.full_like(counts, float(m))
        normalized = jax.jit(
            lambda k, c: k / jnp.where(c == 0, 1.0, c)
        )(kernel, counts)
    return normalized, counts


def shard_snp_rows(z: np.ndarray, ctx: MeshContext):
    """Shard an (M, ...) per-SNP block over the WHOLE mesh on axis 0.

    The reference distributes the per-SNP GWAS loop by dealing SNP rows
    round-robin to grouped communicators (gwas.cpp:557-687,
    genotype.cpp:1623); the TPU analog is one NamedSharding over the
    flattened mesh — every batched per-SNP solver (ols/mlm/mp/igwas)
    leads with the SNP axis, so XLA SPMD splits the whole computation
    across chips with no further code changes.

    M is padded to a multiple of the device count by repeating the last
    row (a well-conditioned duplicate, not a singular zero row); the
    caller trims outputs back to M.  Returns (sharded_array, M).
    """
    m = z.shape[0]
    pad = (-m) % ctx.n_devices
    if pad:
        z = np.concatenate([z, np.repeat(z[-1:], pad, axis=0)])
    return jax.device_put(z, ctx.rows), m
