"""Measured baselines: run the BASELINE.json configs end-to-end via the CLI.

The reference C++ cannot be built in this image (no mpicxx/ScaLAPACK dev
packages — only runtime libs are present), so the "reference" column of
BASELINE.md stays unmeasured; this script produces the framework column:
wall-clock + throughput for each config on whatever backend JAX selects
(the real TPU chip by default), plus internal parity cross-checks
(GRM diagonal mean ~ 1 under GCTA standardization, fitted h2 within
sampling error of the simulation's true h2).

Usage:  python benchmarks/baselines.py [--configs 1,2,3,4] [--outdir DIR]
Emits one JSON line per config and a markdown table at the end.  Each
config builds (or lazily reuses) its own cohort, so any subset/order of
--configs works.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_cohort(outdir, n, m, seed, h2=0.5, n_causal=None, prefix="cohort",
                n_traits=1):
    from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo, write_plink

    rng = np.random.default_rng(seed)
    p = rng.uniform(0.05, 0.5, size=m)
    # generate dosages in SNP blocks to bound peak host memory (a full
    # (m, n) float64 temporary would be ~4 GB at 100k x 5k)
    d = np.empty((m, n), dtype=np.int8)
    block = 10000
    for s in range(0, m, block):
        e = min(s + block, m)
        pb = p[s:e, None]
        db = (rng.random((e - s, n)) < pb).astype(np.int8)
        db += (rng.random((e - s, n)) < pb).astype(np.int8)
        d[s:e] = db
    # guarantee polymorphism WITHOUT poisoning the GRM: the old hack
    # (individual 0 all-zeros, individual 1 all-twos across every SNP)
    # gave two individuals ~10x self-relatedness and drove the GWAS
    # null REML's Var(E) to the boundary — flip one entry per
    # monomorphic SNP instead
    alt = d.astype(np.int64).sum(1)
    mono = np.flatnonzero((alt == 0) | (alt == 2 * n))
    if mono.size:
        d[mono, mono % n] = 1
    data = PlinkData(
        snps=[SnpInfo(str(1 + i % 22), f"snp{i}", 0.0, 1000 + i, "A", "C")
              for i in range(m)],
        individuals=[IndividualInfo(f"F{i}", f"I{i}") for i in range(n)],
        _dosage=d,
    )
    path = str(outdir / prefix)
    write_plink(path, data)

    n_causal = n_causal or max(10, m // 100)
    ys = []
    for t in range(n_traits):
        idx = rng.choice(m, size=n_causal, replace=False)
        z = d[idx].astype(np.float64)
        z = (z - z.mean(1, keepdims=True)) / (z.std(1, keepdims=True) + 1e-9)
        g = z.sum(0) / np.sqrt(n_causal)
        e = rng.normal(size=n)
        y = np.sqrt(h2) * g + np.sqrt(1 - h2) * e
        ys.append(y)
    pheno = outdir / f"{prefix}.pheno.txt"
    with open(pheno, "w") as f:
        for i in range(n):
            vals = " ".join(f"{ys[t][i]:.6f}" for t in range(n_traits))
            f.write(f"F{i} I{i} {vals}\n")
    return path, str(pheno)


def run_cli(args, cwd):
    from dissect_tpu.analysis.dispatcher import main

    old = os.getcwd()
    os.chdir(cwd)
    t0 = time.perf_counter()
    try:
        main(args)
    finally:
        os.chdir(old)
    return time.perf_counter() - t0


def _ensure_c1(outdir):
    """Build the 1k x 10k cohort + its GRM once; reused by configs 1/2."""
    bfile = str(outdir / "cohort")
    pheno = str(outdir / "cohort.pheno.txt")
    if not (pathlib.Path(bfile + ".bed").exists()
            and pathlib.Path(pheno).exists()):
        bfile, pheno = make_cohort(outdir, 1000, 10000, seed=1)
    t_grm = None
    if not (outdir / "c1.grm.dat").exists():
        t_grm = run_cli(["--make-grm", "--bfile", bfile, "--out",
                         str(outdir / "c1")], outdir)
    return bfile, pheno, t_grm


def config1(outdir):
    """GRM + PCA, 1k individuals x 10k SNPs."""
    n, m = 1000, 10000
    bfile, _, t_grm = _ensure_c1(outdir)
    if t_grm is None:  # rebuilt for timing if a prior config made it
        t_grm = run_cli(["--make-grm", "--bfile", bfile, "--out",
                         str(outdir / "c1")], outdir)
    t_pca = run_cli(["--pca", "--grm", str(outdir / "c1"), "--out",
                     str(outdir / "c1")], outdir)
    # parity: mean GRM diagonal must be ~1 (GCTA standardization)
    from dissect_tpu.io.grm_io import read_grm
    k = read_grm(str(outdir / "c1"))
    diag_mean = float(np.mean(np.diag(np.asarray(k["kernel"]))))
    assert abs(diag_mean - 1.0) < 0.05, f"GRM diag mean {diag_mean} far from 1"
    return {
        "config": "GRM+PCA 1k x 10k",
        "grm_s": round(t_grm, 2),
        "pca_s": round(t_pca, 2),
        "grm_gflops": round(2 * m * n * n / t_grm / 1e9, 1),
        "grm_diag_mean": round(diag_mean, 4),
    }


def _oracle_h2(outdir):
    """float64 numpy/scipy REML of the c1 cohort via the eigenbasis —
    the parity target for the TPU fp32+f64-endgame pipeline (the
    simulated 'true' h2 carries sampling error of ~0.1 at n=1000, so it
    only anchors a loose sanity range)."""
    from scipy.optimize import minimize_scalar

    from dissect_tpu.io.grm_io import read_grm

    g = read_grm(str(outdir / "c1"))
    k = np.asarray(g["kernel"], dtype=np.float64)
    ph = {}
    for line in open(outdir / "cohort.pheno.txt"):
        p = line.split()
        ph[f"{p[0]}@{p[1]}"] = float(p[2])
    y = np.array([ph[kk] for kk in g["individual_keys"]])
    n = len(y)
    w, u = np.linalg.eigh(k)
    yr = u.T @ y
    xr = (u.T @ np.ones((n, 1)))[:, 0]

    def neg_remll(h2):
        d = h2 * w + (1 - h2)
        xtvx = (xr**2 / d).sum()
        b = (xr * yr / d).sum() / xtvx
        q = ((yr - xr * b) ** 2 / d).sum()
        s2 = q / (n - 1)
        return 0.5 * (np.log(d).sum() + np.log(xtvx)
                      + (n - 1) * np.log(s2) + (n - 1))

    return float(minimize_scalar(neg_remll, bounds=(1e-4, 1 - 1e-4),
                                 method="bounded").x)


def config2(outdir):
    """Single-trait AI-REML on the 1k-cohort GRM."""
    _, pheno, _ = _ensure_c1(outdir)
    t = run_cli(["--reml", "--grm", str(outdir / "c1"), "--pheno",
                 pheno, "--out", str(outdir / "c2")], outdir)
    h2 = None
    for line in open(outdir / "c2.reml"):
        if line.startswith("Var(GRM)/Var("):
            h2 = float(line.split()[1])
    # parity: the fitted h2 must match an independent float64 REML
    # recomputation (profile likelihood over the GRM eigenbasis)
    h2_oracle = _oracle_h2(outdir)
    assert h2 is not None and abs(h2 - h2_oracle) < 0.02, (
        f"h2={h2} vs float64 oracle {h2_oracle}"
    )
    return {"config": "AI-REML 1k", "reml_s": round(t, 2), "h2": h2,
            "h2_oracle": round(h2_oracle, 4), "h2_true": 0.5}


def config3(outdir):
    """GWAS 5k x 100k: OLS and GRM-corrected mixed model."""
    n, m = 5000, 100000
    bfile, pheno = make_cohort(outdir, n, m, seed=3, prefix="c3cohort")
    t_grm = run_cli(["--make-grm", "--bfile", bfile, "--out",
                     str(outdir / "c3")], outdir)
    t_ols = run_cli(["--gwas", "--bfile", bfile, "--pheno", pheno,
                     "--out", str(outdir / "c3ols")], outdir)
    t_mlm = run_cli(["--gwas", "--bfile", bfile, "--grm", str(outdir / "c3"),
                     "--pheno", pheno, "--out", str(outdir / "c3mlm")], outdir)
    return {
        "config": "GWAS 5k x 100k",
        "grm_s": round(t_grm, 2),
        "ols_s": round(t_ols, 2),
        "ols_snps_per_s": round(m / t_ols),
        "mlm_s": round(t_mlm, 2),
        "mlm_snps_per_s": round(m / t_mlm),
    }


def config4(outdir):
    """Bivariate REML, 10k individuals.  Cohort, GRM and per-iteration
    REML checkpoints are reused across invocations so the multi-hour
    f64 endgame can resume across harness windows (--checkpoint +
    runtime/checkpoint.py)."""
    n, m = 10000, 20000
    bfile = str(outdir / "c4cohort")
    pheno = str(outdir / "c4cohort.pheno.txt")
    if not (pathlib.Path(bfile + ".bed").exists()
            and pathlib.Path(pheno).exists()):
        bfile, pheno = make_cohort(outdir, n, m, seed=4, prefix="c4cohort",
                                   n_traits=2)
    t_grm = 0.0
    if not (outdir / "c4.grm.dat").exists():
        t_grm = run_cli(["--make-grm", "--bfile", bfile, "--out",
                         str(outdir / "c4")], outdir)
    t = run_cli(["--bivar-reml", "--grm", str(outdir / "c4"), "--pheno",
                 pheno, "--pheno-cols", "1,2",
                 "--checkpoint", str(outdir / "c4.reml.ckpt"),
                 "--out", str(outdir / "c4")], outdir)
    rg = None
    corr = outdir / "c4.correlations"
    if corr.exists():
        for line in open(corr):
            if line.startswith("Cor(GRM"):
                try:
                    rg = float(line.split()[1])
                except (IndexError, ValueError):
                    pass
    return {"config": "Bivar REML 10k", "grm_s": round(t_grm, 2),
            "reml_s": round(t, 2), "rg": rg}


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    from dissect_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    outdir = pathlib.Path(args.outdir or
                          pathlib.Path(os.environ.get("TMPDIR", "/tmp")) /
                          f"dissect_baselines_{os.getpid()}")
    outdir.mkdir(parents=True, exist_ok=True)
    backend = jax.devices()[0].platform

    results = []
    for c in [int(x) for x in args.configs.split(",")]:
        r = CONFIGS[c](outdir)
        r["backend"] = backend
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\n| config | metric | value |\n|---|---|---|")
    for r in results:
        for k, v in r.items():
            if k not in ("config", "backend"):
                print(f"| {r['config']} ({r['backend']}) | {k} | {v} |")


if __name__ == "__main__":
    main()
