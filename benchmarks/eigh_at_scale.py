"""The sharded-sign-iteration eigensolver branch, timed at scale.

dc_eigen.py's m > batch_threshold branch (sharded sign iterations, one
shift candidate at a time) is the whole reason the D&C solver exists —
it is the pdsyev_ replacement at beyond-one-device N
(matrix.cpp:3327-3380) — and through round 4 it had correctness tests
but zero wall-clock numbers.  This script produces them on the REAL
v5e chip at n=16384 fp32, where the branch runs at the top split.

The operand is a GRM with a realistic spectrum: K = Z^T Z / m for
m = 2n standardized markers — a spread Marchenko-Pastur bulk, which is
what PCA / kernel diagonalization actually decompose
(kernel.cpp:2106-2141).  (A low-rank + ridge operand puts 90%+ of the
spectrum in ONE point cluster; no spectral divide-and-conquer can
split inside a cluster — those spectra are the local-fallback tests'
job, not a throughput benchmark.)

The XLA one-device eigh anchor is ATTEMPTED at every size and its
compile REJECTION is recorded as a result when it happens: measured
round 5, XLA's unrolled eigh at n=16384 fp32 asks the v5e compiler for
33.5 GB of HBM temps and is refused — at this size the D&C is not
merely faster or slower than XLA, it is the only solver that runs.
Correctness at sizes without an XLA anchor: trace and Frobenius
identities plus per-column eigen-residuals, all O(n^2).

Usage:  python benchmarks/eigh_at_scale.py [--n 16384] [--trials 2]
Emits one JSON line.  The chip sits behind a network tunnel: a fetch
is the completion barrier and min-over-trials is reported with the
full trial list.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from dissect_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    n = args.n
    m_snps = 2 * n
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("i",))

    # GRM with a spread (Marchenko-Pastur) spectrum, assembled ON
    # DEVICE in SNP chunks (the host OpenBLAS sgemm segfaults on big
    # products in this image; a real pipeline streams chunks anyway)
    chunk = 4096

    @jax.jit
    def add_chunk(kern, seed):
        z = jax.random.normal(jax.random.PRNGKey(seed), (chunk, n), jnp.float32)
        return kern + z.T @ z / m_snps

    kern = jnp.zeros((n, n), jnp.float32)
    for s in range(m_snps // chunk):
        kern = add_chunk(kern, s)
    jax.block_until_ready(kern)
    dev = kern

    def dce(mtx):
        w, v = distributed_eigh(mtx, mesh=mesh, allow_local_fallback=True)
        return w, v

    t0 = time.perf_counter()
    w_dc, v_dc = dce(dev)
    jax.block_until_ready((w_dc, v_dc))
    cold_s = time.perf_counter() - t0

    # correctness without a full reference solve: trace + Frobenius
    # identities and per-column eigen-residuals for the extreme pairs
    tr = float(jnp.trace(dev))
    fro2 = float(jnp.sum(dev * dev))
    sum_w = float(jnp.sum(w_dc))
    sum_w2 = float(jnp.sum(w_dc * w_dc))
    idx = jnp.asarray([0, 1, n // 2, n - 2, n - 1])
    vv = v_dc[:, idx]
    res = jnp.linalg.norm(dev @ vv - vv * w_dc[idx][None, :], axis=0)
    scale = float(jnp.max(jnp.abs(w_dc)))
    res_max = float(jnp.max(res)) / scale
    assert abs(sum_w - tr) / abs(tr) < 1e-3, (sum_w, tr)
    assert abs(sum_w2 - fro2) / fro2 < 1e-3, (sum_w2, fro2)
    assert res_max < 5e-3, res_max

    ts_dc = []
    for i in range(args.trials):
        t0 = time.perf_counter()
        out = dce(dev + 1e-6 * (i + 1))
        jax.block_until_ready(out)
        ts_dc.append(time.perf_counter() - t0)

    xla_s = None
    xla_note = None
    try:
        xla = jax.jit(lambda mtx: jnp.linalg.eigh(mtx)[0])
        wx = xla(dev)
        jax.block_until_ready(wx)
        ts_x = []
        for i in range(args.trials):
            t0 = time.perf_counter()
            out = xla(dev + 1e-6 * (i + 1))
            jax.block_until_ready(out)
            ts_x.append(time.perf_counter() - t0)
        xla_s = round(min(ts_x), 2)
    except Exception as exc:
        xla_note = repr(exc)[:300]

    print(json.dumps({
        "what": "eigh_at_scale",
        "n": n,
        "dtype": "f32",
        "backend": jax.devices()[0].platform,
        "spectrum": "GRM Z^T Z / m, m = 2n (Marchenko-Pastur bulk)",
        "branch": "sharded sign iterations at the top split "
                  "(m > batch_threshold=8192), batched candidates below, "
                  "host-LAPACK leaves",
        "dc_eigh_cold_s": round(cold_s, 2),
        "dc_eigh_s": round(min(ts_dc), 2),
        "dc_eigh_trials_s": [round(t, 2) for t in ts_dc],
        "xla_eigh_s": xla_s,
        "xla_eigh_note": xla_note,
        "eigen_residual_rel": res_max,
        "trace_rel_err": abs(sum_w - tr) / abs(tr),
    }), flush=True)


if __name__ == "__main__":
    main()
