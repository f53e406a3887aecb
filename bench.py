"""Benchmark: GRM construction throughput on one TPU chip.

The GRM syrk (Z^T Z over the SNP axis, kernel.cpp:92-109 /
matrix.cpp:2682) is DISSECT's hottest kernel — O(M N^2) MACs.  This
bench streams a synthetic (M, N) dosage matrix through the fused
standardize+syrk accumulator in the production fast policy (bf16 MXU
inputs, fp32 accumulation) and reports sustained TFLOP/s.

Prints ONE JSON line:
  {"metric": "grm_tflops_per_chip", "value": ..., "unit": "TFLOP/s",
   "vs_baseline": <fraction of v5e bf16 peak (197 TFLOP/s) — the
                   analytic speed-of-light anchor; the reference
                   publishes no numbers (BASELINE.md)>, "details": {...}}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dissect_tpu.linalg.syrk import grm_update

    n_individuals = 8192
    n_snps = 32768
    chunk = 4096

    rng = np.random.default_rng(0)
    dosage = rng.integers(0, 3, size=(n_snps, n_individuals)).astype(np.int8)
    p2 = np.clip(dosage.mean(1) / 2.0, 0.05, 0.95)
    mean = (2.0 * p2).astype(np.float32)
    inv_std = (1.0 / np.sqrt(2.0 * p2 * (1.0 - p2))).astype(np.float32)

    kernel = jnp.zeros((n_individuals, n_individuals), jnp.float32)
    counts = jnp.zeros((n_individuals, n_individuals), jnp.float32)

    chunks = [
        (
            jnp.asarray(dosage[s : s + chunk]),
            jnp.asarray(mean[s : s + chunk]),
            jnp.asarray(inv_std[s : s + chunk]),
        )
        for s in range(0, n_snps, chunk)
    ]

    def run(kernel, counts):
        for d, mu, istd in chunks:
            kernel, counts = grm_update(
                kernel, counts, d, mu, istd,
                compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32,
            )
        return kernel, counts

    # warmup (compile)
    k1, c1 = run(kernel, counts)
    jax.block_until_ready((k1, c1))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        k1, c1 = run(kernel, counts)
        jax.block_until_ready((k1, c1))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # useful MACs: Z^T Z and O^T O, each M*N^2 MACs = 2 flops
    flops = 2 * 2.0 * n_snps * n_individuals**2
    tflops = flops / dt / 1e12
    v5e_bf16_peak = 197.0
    print(
        json.dumps(
            {
                "metric": "grm_tflops_per_chip",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops / v5e_bf16_peak, 4),
                "details": {
                    "n_individuals": n_individuals,
                    "n_snps": n_snps,
                    "chunk": chunk,
                    "seconds": round(dt, 4),
                    "policy": "bf16-compute/fp32-accum",
                    "baseline_note": "vs analytic v5e bf16 peak 197 TFLOP/s; reference publishes no numbers",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
