"""Sharding-overhead measurement on a virtual device mesh.

The BASELINE.md config-5 row asks for scaling efficiency 1 chip -> N
chips; real multi-chip hardware is not reachable from this image, and
virtual CPU devices all share the same physical cores (XLA's intra-op
thread pool already saturates them at 1 device), so a true efficiency
number CANNOT be measured here.  What this script does measure is the
OVERHEAD the SPMD partitioning adds on an emulated mesh — the cost of
the inserted collectives, halo exchanges and per-shard dispatch for
the three production distributed kernels.  On real ICI-connected
chips each device brings its own FLOPs and the collectives ride
dedicated links, so these overheads are a pessimistic bound on the
sharding cost, not a scaling prediction.

Kernels measured (each through the production code path):
  1. streaming sharded GRM accumulation  (runtime/distributed_io.py)
  2. one DistributedREMLEngine quantities step (row-sharded dense V)
  3. the block-cyclic SPD inverse        (linalg/distributed.py)

Usage:  python benchmarks/scaling.py [--devices 1,2,4,8] [--n 2048]
Emits one JSON line per (kernel, devices) and a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def _worker(n_devices: int, n: int):
    """Runs inside a fresh process with n_devices virtual CPU devices."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == n_devices, len(jax.devices())
    results = {}

    # ---- 1. sharded GRM accumulation (weak: SNPs scale with devices)
    from dissect_tpu.linalg.syrk import grm_update

    mesh = Mesh(np.array(jax.devices()).reshape(n_devices, 1), ("i", "j"))
    chunk = 256 * n_devices
    rng = np.random.default_rng(0)
    dosage = rng.integers(-1, 3, size=(chunk, n)).astype(np.int8)
    mean = rng.uniform(0.5, 1.5, chunk)
    istd = rng.uniform(0.8, 1.2, chunk)
    with mesh:
        kern = jax.device_put(
            np.zeros((n, n), np.float32), NamedSharding(mesh, P("i", "j"))
        )
        cnts = jax.device_put(
            np.zeros((n, n), np.float32), NamedSharding(mesh, P("i", "j"))
        )
        dos = jax.device_put(dosage, NamedSharding(mesh, P("i", None)))

        def run():
            k, c = grm_update(
                kern, cnts, dos, jnp.asarray(mean), jnp.asarray(istd)
            )
            return float(jnp.sum(k) + jnp.sum(c))

        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        results["grm_update"] = min(ts)

    # ---- 2. distributed REML quantities step (strong: fixed n)
    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.distributed_engine import DistributedREMLEngine

    a = rng.normal(size=(n, 128)).astype(np.float32)
    k = (a @ a.T / 128 + 0.5 * np.eye(n)).astype(np.float32)
    y = rng.normal(size=n)
    x = np.ones((n, 1))
    model = build_variance_model([k], ["GRM"], [1.0], [0.5])
    flat = Mesh(np.array(jax.devices()), ("i",))
    eng = DistributedREMLEngine(model, y, x, mesh=flat, dtype=jnp.float32)
    theta = jnp.asarray([0.5, 0.5], jnp.float32)
    float(eng._quantities(theta)["ytpy"])
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(eng._quantities(theta + 1e-4 * i)["ytpy"])
        ts.append(time.perf_counter() - t0)
    results["reml_quantities"] = min(ts)

    # ---- 3. block-cyclic SPD inverse (strong: fixed n)
    from dissect_tpu.linalg.distributed import spd_inverse_logdet_cyclic

    spd = jnp.asarray(k + np.eye(n, dtype=np.float32))
    inv = jax.jit(
        lambda m: jnp.sum(spd_inverse_logdet_cyclic(m, mesh=flat, block=256)[0])
    )
    float(inv(spd))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(inv(spd + 1e-6 * i))
        ts.append(time.perf_counter() - t0)
    results["cyclic_spd_inverse"] = min(ts)

    # ---- 4. D&C eigensolver with the SHARDED sign-iteration branch
    # forced (dc_eigen.py m > batch_threshold path — the branch that
    # exists for beyond-one-device N, matrix.cpp:3327-3380), plus the
    # one-device XLA eigh anchor (strong: fixed n)
    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    forced = max(n // 4, 256)

    def dce(m):
        w, _ = distributed_eigh(
            m, mesh=flat, base_size=forced, batch_threshold=forced,
            allow_local_fallback=True,
        )
        return float(jnp.sum(w))

    dce(spd)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        dce(spd + 1e-6 * i)
        ts.append(time.perf_counter() - t0)
    results["dc_eigh_sharded_branch"] = min(ts)

    xla_eigh = jax.jit(lambda m: jnp.sum(jnp.linalg.eigh(m)[0]))
    float(xla_eigh(spd))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(xla_eigh(spd + 1e-6 * i))
        ts.append(time.perf_counter() - t0)
    results["xla_eigh_one_device"] = min(ts)

    print("SCALING_RESULT " + json.dumps(results), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        _worker(args.worker, args.n)
        return

    counts = [int(x) for x in args.devices.split(",")]
    table = {}
    for d in counts:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={d}"
        ).strip()
        env["PYTHONPATH"] = str(REPO)
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(d), "--n", str(args.n)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("SCALING_RESULT ")]
        if not line:
            print(f"devices={d} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            continue
        res = json.loads(line[0][len("SCALING_RESULT "):])
        table[d] = res
        print(json.dumps({"devices": d, **{k: round(v, 4) for k, v in res.items()}}),
              flush=True)

    if 1 in table:
        print("\n(emulated mesh: same physical cores for every device count —")
        print(" the x-factor is PARTITIONING OVERHEAD, not scaling)")
        print("\n| kernel | " + " | ".join(f"{d} dev" for d in counts) + " |")
        print("|---|" + "---|" * len(counts))
        for kernel in table[1]:
            cells = []
            for d in counts:
                if d in table:
                    t = table[d][kernel]
                    base = table[1][kernel]
                    if kernel == "grm_update":  # work scales with devices
                        over = t / (base * d)
                        cells.append(
                            f"{t * 1e3:.1f} ms ({over:.2f}x per-work overhead)"
                        )
                    else:  # fixed work
                        over = t / base
                        cells.append(f"{t * 1e3:.1f} ms ({over:.2f}x overhead)")
                else:
                    cells.append("—")
            print(f"| {kernel} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
