"""One process of an N-process CPU multi-host simulation.

Launched by tests/test_multiprocess.py: each worker owns a slice of
virtual CPU devices, initializes jax.distributed against a shared local
coordinator, and runs

  1. a global_sharded_array round trip (the
     make_array_from_process_local_data branch that single-process runs
     never reach; parity: the per-process BED segment reads + collective
     assembly of genotype.cpp:639-707);
  2. the PRODUCTION CLI with --force-distributed: --make-grm streaming
     per-host SNP-row shards through _stream_grm_multiprocess, --reml on
     the row-sharded engine, --pca, --gwas with SNP-axis mesh sharding
     (the grouped-communicator analog, gwas.cpp:557-687) and
     --bivar-reml on the sharded multi-trait engine
     (multireml.cpp:57-137) — root-only artifact writes throughout
     (communicator.cpp:565-628's MPI-IO analog).

Usage: multiproc_worker.py <idx> <nprocs> <devs_per_proc> <coordinator>
       <bfile> <out>
"""

import os
import sys


def main():
    idx, nprocs, devs, coordinator, bfile, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5], sys.argv[6],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=idx
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * devs, len(jax.devices())

    import numpy as np
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dissect_tpu.runtime.distributed_io import (
        global_sharded_array,
        snp_shard_bounds,
        to_host,
    )
    from dissect_tpu.runtime.mesh import MeshContext

    # --- 1. global_sharded_array round trip ------------------------------
    ctx = MeshContext.create()
    m, n = 16, 24
    full = np.arange(m * n, dtype=np.float64).reshape(m, n)
    # per-host contiguous row shard (snp_shard_bounds semantics); the
    # mesh 'i' axis is the leading (process-major) device axis, so the
    # host's local rows are its contiguous slice
    i_size = ctx.mesh.shape["i"]
    assert m % i_size == 0
    rows_per_i = m // i_size
    # addressable 'i' coordinates of this process
    local_rows = []
    for di in range(i_size):
        row_devices = ctx.mesh.devices[di]
        if any(d.process_index == idx for d in np.ravel(row_devices)):
            local_rows.append(full[di * rows_per_i : (di + 1) * rows_per_i])
    local = np.concatenate(local_rows) if local_rows else np.empty((0, n))
    arr = global_sharded_array(local, (m, n), ctx, P("i", None))
    back = to_host(arr)
    np.testing.assert_array_equal(back, full)

    lo, hi = snp_shard_bounds(100)
    per = -(-100 // nprocs)
    assert (lo, hi) == (min(idx * per, 100), min((idx + 1) * per, 100))

    # --- 2. the production CLI, distributed end to end -------------------
    from dissect_tpu.analysis.dispatcher import main as cli_main

    dist = ["--mesh", "auto", "--force-distributed"]
    cli_main(["--make-grm", "--bfile", bfile, "--out", out] + dist)
    # phenotype files written beside the out prefix by the launcher
    cli_main(
        ["--reml", "--grm", out, "--pheno", f"{out}.pheno.txt",
         "--reml-maxit", "40", "--out", f"{out}.r"] + dist
    )
    cli_main(
        ["--pca", "--grm", out, "--num-eval", "4",
         "--out", f"{out}.p"] + dist
    )
    # mixed-model GWAS with the SNP axis sharded over the multi-host
    # mesh (gwas.cpp:557-687's grouped communicators) — exercises the
    # to_host materialization of not-fully-addressable results
    cli_main(
        ["--gwas", "--bfile", bfile, "--grm", out, "--pheno",
         f"{out}.pheno.txt", "--parallel-gwas", "--out", f"{out}.g"]
        + dist
    )
    # bivariate REML through the sharded multi-trait engine
    cli_main(
        ["--bivar-reml", "--grm", out, "--pheno", f"{out}.pheno2.txt",
         "--pheno-cols", "1,2", "--reml-maxit", "40",
         "--out", f"{out}.b"] + dist
    )
    print(f"WORKER_{idx}_OK", flush=True)


if __name__ == "__main__":
    main()
