"""The sharded-sign-iteration eigensolver branch, timed at scale.

dc_eigen.py's m > batch_threshold branch (sharded sign iterations, one
shift candidate at a time) is the whole reason the D&C solver exists —
it is the pdsyev_ replacement at beyond-one-device N
(matrix.cpp:3327-3380) — and through round 4 it had correctness tests
but zero wall-clock numbers.  This script produces them on the REAL
v5e chip: n=16384 fp32 (a 1 GB operand; sign-iteration intermediates
~6 GB — fits one chip's HBM) through distributed_eigh with the default
batch_threshold=8192, so the TOP split runs the sharded branch while
sub-splits take the batched-candidates path, vs the one-device XLA
eigh anchor.  Eigenvalue agreement against XLA is asserted alongside
the timing so the number measures a CORRECT decomposition.

Usage:  python benchmarks/eigh_at_scale.py [--n 16384] [--trials 2]
Emits one JSON line.  The chip sits behind a network tunnel: a float()
fetch is the completion barrier and the min over trials is reported
with the full trial list (tunnel swing is visible in the record).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--rank", type=int, default=1024)
    args = ap.parse_args()

    from dissect_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    n = args.n
    rng = np.random.default_rng(0)
    # GRM-like spectrum: low-rank signal + ridge (the spectrum PCA and
    # kernel diagonalization actually see, kernel.cpp:2106-2141)
    a = rng.normal(size=(n, args.rank)).astype(np.float32) / np.sqrt(args.rank)
    spd = (a @ a.T + 0.5 * np.eye(n, dtype=np.float32)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("i",))
    dev = jnp.asarray(spd)

    def dce(m):
        w, v = distributed_eigh(m, mesh=mesh, allow_local_fallback=True)
        return w, v

    # compile + correctness: top-k eigenvalues agree with XLA eigh
    w_dc, _ = dce(dev)
    w_dc = np.sort(np.asarray(jax.device_get(w_dc)))[::-1]

    xla = jax.jit(lambda m: jnp.linalg.eigh(m)[0])
    w_x = np.sort(np.asarray(jax.device_get(xla(dev))))[::-1]
    top_err = float(np.max(np.abs(w_dc[:64] - w_x[:64]) / np.abs(w_x[:64])))
    assert top_err < 5e-3, f"top-64 eigenvalue mismatch {top_err}"

    def timed(fn):
        ts = []
        for i in range(args.trials):
            t0 = time.perf_counter()
            out = fn(dev + 1e-6 * (i + 1))
            jax.block_until_ready(out)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            ts.append(time.perf_counter() - t0)
        return ts

    ts_dc = timed(dce)
    ts_x = timed(xla)
    print(json.dumps({
        "what": "eigh_at_scale",
        "n": n,
        "dtype": "f32",
        "backend": jax.devices()[0].platform,
        "branch": "sharded sign iterations at the top split "
                  "(m > batch_threshold=8192), batched candidates below",
        "dc_eigh_s": round(min(ts_dc), 2),
        "dc_eigh_trials_s": [round(t, 2) for t in ts_dc],
        "xla_eigh_s": round(min(ts_x), 2),
        "xla_eigh_trials_s": [round(t, 2) for t in ts_x],
        "ratio_vs_xla": round(min(ts_dc) / min(ts_x), 2),
        "top64_eigenvalue_rel_err_vs_xla": top_err,
    }), flush=True)


if __name__ == "__main__":
    main()
