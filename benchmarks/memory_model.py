"""Per-device memory model of the distributed REML iteration.

The reference exists for cohorts where one node cannot hold the (N, N)
covariance (matrix.cpp:3080-3153 factors it over the BLACS grid with
pre-allocated block-cyclic storage).  The TPU build's equivalent claim
— a 100k-individual REML fits 8 v5e chips — must rest on measured
numbers, not arithmetic.  This script produces them two ways:

1. `analyze`: lower + compile `_distributed_dense_quantities` for a
   given (N, D, dtype) against ShapeDtypeStructs (no data allocated)
   and report XLA's OWN buffer-assignment statistics
   (`compiled.memory_analysis()`): argument bytes, output bytes, and
   PEAK TEMP bytes per device.  This is the compiler's exact
   allocation plan — the same accounting that decides whether the
   program OOMs on a real chip.  The single-chip dense path is
   analyzed alongside for the contrast.

2. `run`: execute a full --reml-equivalent fit (and a randomized
   top-k PCA) at beyond-single-chip N on an 8-virtual-device CPU mesh,
   recording wall-clock, convergence and host peak RSS — proof the
   sharded program actually runs end to end at scale, not just
   compiles.

Usage:
  python benchmarks/memory_model.py analyze --n 16384,32768 --devices 8
  python benchmarks/memory_model.py run --n 16384 --devices 8

Each worker runs in a fresh subprocess so XLA_FLAGS can pin the
virtual device count.  Results print as JSON lines and append to
SCALING.md by hand (see the memory-model section there).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _force_cpu():
    """The image's site hook re-forces JAX_PLATFORMS=axon (the TPU
    tunnel), so the env var alone does NOT select the CPU backend —
    switch via jax.config before any backend touch (the tests'
    conftest does the same)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def _analyze_worker(
    n: int, n_devices: int, use_f64: bool, axon: bool = False,
    bivar: bool = False,
):
    """axon=True: keep the TPU tunnel backend and let the v5e AOT
    compiler report ITS buffer assignment (single chip) — the
    authoritative accounting for the HBM-fit claim; CPU-mesh numbers
    bound the multi-device partitioning."""
    if not axon:
        _force_cpu()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dissect_tpu.reml.distributed_engine import (
        ShardedCovariance,
        _distributed_dense_quantities,
        pick_block,
    )

    dtype = jnp.float64 if use_f64 else jnp.float32
    if use_f64:
        jax.config.update("jax_enable_x64", True)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("i",))
    block = pick_block(n, n_devices)
    quantum = n_devices * block
    n_pad = n + (-n) % quantum
    row = NamedSharding(mesh, P("i", None))
    rep = NamedSharding(mesh, P())

    def st(shape, sharding):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    if bivar:
        # uniform bivariate model (multireml.cpp:57-137, reml.cpp:750-780):
        # ONE n/2 x n/2 GRM shared by the (0,0)/(0,1)/(1,1) blocks — a
        # single deduplicated argument buffer (Tn^2/4 resident, not
        # 3 Tn^2/4) — plus per-trait identity E and the cross-trait
        # environmental indicator, all stored as diagonal vectors
        h = n // 2 + (-(n // 2)) % quantum
        n_pad = 2 * h
        g = st((h, h), row)
        sc = ShardedCovariance.from_elements(
            trait_sizes=(h, h),
            blocks=((0, 0), (0, 1), (1, 1), (0, 0), (1, 1), (0, 1)),
            is_diag=(False, False, False, True, True, True),
            element_matrices=(g, g, g, st((h,), rep), st((h,), rep),
                              st((h,), rep)),
            powers=st((6, 6), rep),
            factors=st((6,), rep),
        )
        k_params, c_cols = 6, 2
    else:
        # single-trait model: one dense GRM + the identity E (stored as
        # a vector — the engine's diagonal-element special-casing)
        sc = ShardedCovariance.from_elements(
            trait_sizes=(n_pad,),
            blocks=((0, 0), (0, 0)),
            is_diag=(False, True),
            element_matrices=(st((n_pad, n_pad), row), st((n_pad,), rep)),
            powers=st((2, 2), rep),
            factors=st((2,), rep),
        )
        k_params, c_cols = 2, 1
    args = (
        sc,
        st((k_params,), rep),   # theta
        st((n_pad,), rep),      # y
        st((n_pad, c_cols), rep),  # x
        st((n_pad,), rep),      # pad_diag
    )
    lowered = _distributed_dense_quantities.lower(
        *args, mesh=mesh, block=block, use_ml=False
    )
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    out = {
        "what": "distributed_quantities",
        "model": "bivariate" if bivar else "single_trait",
        "n": n,
        "n_pad": n_pad,
        "devices": n_devices,
        "backend": jax.default_backend(),
        "block": block,
        "dtype": "f64" if use_f64 else "f32",
        "argument_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "output_gb": round(ma.output_size_in_bytes / 1e9, 3),
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "argument_bytes": ma.argument_size_in_bytes,
        "output_bytes": ma.output_size_in_bytes,
        "temp_bytes": ma.temp_size_in_bytes,
        "peak_gb": round(
            (
                ma.argument_size_in_bytes
                + ma.output_size_in_bytes
                + ma.temp_size_in_bytes
            )
            / 1e9,
            3,
        ),
    }
    print(json.dumps(out), flush=True)


def _run_worker(n: int, n_devices: int, max_iter: int, pca_k: int,
                checkpoint: str = "", refine_steps: int = 8):
    _force_cpu()
    import os
    import resource
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.distributed_engine import DistributedREMLEngine
    from dissect_tpu.reml.engine import REMLOptions

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("i",))
    rng = np.random.default_rng(0)
    # synthetic GRM: low-rank + jitter, with a known planted h2
    r = 512
    t0 = time.time()
    b = (rng.standard_normal((n, r)) / np.sqrt(r)).astype(np.float32)
    k = b @ b.T
    d = np.sqrt(np.maximum(np.diagonal(k), 1e-3))
    k = (k / d[:, None] / d[None, :]).astype(np.float64)  # unit diagonal
    h2 = 0.6
    g = b @ rng.standard_normal(r).astype(np.float32) / d
    y = np.sqrt(h2) * g / g.std() + np.sqrt(1 - h2) * rng.standard_normal(n)
    x = np.ones((n, 1))
    build_s = time.time() - t0

    t0 = time.time()
    model = build_variance_model(
        [k], ["GRM"], [float(np.var(y, ddof=1))], [0.5]
    )
    refine = os.environ.get("MEMMODEL_NO_REFINE", "") != "1"
    # enough float64 Newton steps to actually CONVERGE in f64 at big n
    # (the default 2-step polish left theta moving 4.6%/step at n=16k:
    # fp32 trace noise biases the fp32 optimum there) — the loop still
    # breaks early on the convergence window / Newton decrement
    opts = REMLOptions(max_iterations=max_iter, float64_refine=refine,
                      float64_refine_max_n=n + 1,
                      float64_refine_steps=refine_steps)
    eng = DistributedREMLEngine(model, y, x, mesh, opts)
    # --checkpoint: per-iteration REMLCheckpoint (runtime/checkpoint.py)
    # so a watchdog-killed long window RESUMES from its last Newton step
    # instead of restarting (the data above is deterministic from seed
    # 0, so a resumed process sees the identical problem)
    res = eng.fit(checkpoint_path=checkpoint or None)
    fit_s = time.time() - t0
    vg, ve = res.variances[0], res.variances[1]

    pca_s = None
    evals = None
    if pca_k:
        from dissect_tpu.linalg.eigen import eigh_topk

        t0 = time.time()
        kj = jax.device_put(
            jnp.asarray(k, jnp.float32), NamedSharding(mesh, P("i", None))
        )
        w, v = eigh_topk(kj, k=pca_k)
        evals = np.asarray(w)[:4].round(3).tolist()
        pca_s = round(time.time() - t0, 1)

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "what": "distributed_reml_run",
        "n": n,
        "devices": n_devices,
        "success": bool(res.success),
        "iterations": res.n_iterations,
        "h2_fit": round(float(vg / (vg + ve)), 4),
        "h2_true": 0.6,
        "logL": round(float(res.log_likelihood), 3),
        "fit_seconds": round(fit_s, 1),
        "data_seconds": round(build_s, 1),
        "pca_seconds": pca_s,
        "pca_top_evals": evals,
        "host_peak_rss_gb": round(rss_gb, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["analyze", "run", "_analyze_worker", "_run_worker"])
    ap.add_argument("--n", default="16384")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--bivar", action="store_true",
                    help="analyze the uniform bivariate program (n = Tn "
                    "total rows over two traits, one shared GRM)")
    ap.add_argument("--axon", action="store_true",
                    help="analyze on the TPU tunnel backend (1 chip)")
    ap.add_argument("--max-iter", type=int, default=25)
    ap.add_argument("--pca-k", type=int, default=16)
    ap.add_argument("--checkpoint", default="",
                    help="run: REML checkpoint file for resume across "
                    "watchdog windows")
    args = ap.parse_args()

    if args.cmd == "_analyze_worker":
        _analyze_worker(
            int(args.n), args.devices, args.f64, args.axon, args.bivar
        )
        return
    if args.cmd == "_run_worker":
        _run_worker(
            int(args.n), args.devices, args.max_iter, args.pca_k,
            args.checkpoint,
        )
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    if not args.axon:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    for n in str(args.n).split(","):
        cmd = [
            sys.executable, str(pathlib.Path(__file__)),
            f"_{args.cmd}_worker", "--n", n, "--devices",
            str(1 if args.axon else args.devices),
            "--max-iter", str(args.max_iter), "--pca-k", str(args.pca_k),
            "--checkpoint", args.checkpoint,
        ]
        if args.f64:
            cmd.append("--f64")
        if args.bivar:
            cmd.append("--bivar")
        if args.axon:
            cmd.append("--axon")
        subprocess.run(cmd, env=env, check=True)


if __name__ == "__main__":
    main()
