"""Generate the golden parity fixture + stored outputs.

Run ONCE (python tests/golden/gen_fixture.py) and commit the results;
tests/test_golden.py then (a) re-runs the CLI and diffs against these
stored files byte-for-byte on structure and allclose on numbers, and
(b) re-derives the stored numbers with INDEPENDENT numpy/scipy oracles
(its own .bed decoder, closed-form OLS, brute-force REML likelihood
maximization, numpy eigh) — the substitute for diffing against the
C++ binary, which cannot be built in this image (no mpicxx/ScaLAPACK).

Format parity targets: .grm.* binary (kernel.cpp:893-1009), .reml
summary (reml.cpp:2761-2922), .gwas.* (storeResults,
gwas.cpp:1036-1154), .pca.* (pca.cpp:78-101).

The cohort is fully deterministic (PCG64 seed 20260820) and includes
missing genotypes so the per-pair counts matrix is non-constant.
"""

import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))
HERE = pathlib.Path(__file__).resolve().parent

N, M, SEED = 24, 20, 20260820


def make_cohort():
    from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo, write_plink

    rng = np.random.default_rng(SEED)
    p = rng.uniform(0.15, 0.5, size=M)
    d = (rng.random((M, N)) < p[:, None]).astype(np.int8)
    d += (rng.random((M, N)) < p[:, None]).astype(np.int8)
    d[:, 0] = 0
    d[:, 1] = 2  # guarantee polymorphism
    miss = rng.random((M, N)) < 0.05
    miss[:, :2] = False
    d = np.where(miss, np.int8(-1), d)
    # keep polymorphic after missingness
    obs = d >= 0
    alt = np.where(obs, d, 0).sum(1)
    assert ((alt > 0) & (alt < 2 * obs.sum(1))).all()

    data = PlinkData(
        snps=[SnpInfo(str(1 + i % 2), f"snp{i}", 0.0, 1000 + i, "A", "C")
              for i in range(M)],
        individuals=[IndividualInfo(f"F{i}", f"I{i}") for i in range(N)],
        _dosage=d,
    )
    write_plink(str(HERE / "cohort"), data)

    z = np.where(obs, d, 0).astype(np.float64)
    zc = np.where(obs, z - z.mean(1, keepdims=True), 0.0)
    g = zc[:6].sum(0)
    g = g / g.std()
    y = 0.8 * g + 0.75 * rng.normal(size=N)
    with open(HERE / "pheno.txt", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]:.10f}\n")
    # a second, genetically-correlated trait for the bivariate golden
    # (same causal SNPs, partly shared environment -> rg > 0).  Drawn
    # from a SEPARATE rng so the original fixture streams (testcovar,
    # groups, causal effects) stay byte-identical.
    rng2 = np.random.default_rng(SEED + 4)
    y2 = 0.75 * g + 0.65 * rng2.normal(size=N)
    with open(HERE / "pheno2.txt", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} {y[i]:.10f} {y2[i]:.10f}\n")
    # deterministic auxiliary inputs for the round-2 golden analyses
    tc = rng.normal(size=N)
    with open(HERE / "testcovar.txt", "w") as fh:
        for i in range(N):
            fh.write(f"F{i} I{i} {tc[i]:.10f}\n")
    with open(HERE / "groups.txt", "w") as fh:
        for i in range(M):
            fh.write(f"snp{i} g{i % 3}\n")
    with open(HERE / "causal.txt", "w") as fh:
        for i in range(0, M, 4):
            fh.write(f"snp{i} {rng.normal():.6g}\n")
    return d, y


def write_bgen_cohort():
    """The same cohort as BGEN (layout 2, 16-bit, zlib): hard calls get
    probability 1, missing stays missing — the BGEN-ingested GRM must
    match the .bed-ingested one to encoding precision."""
    from dissect_tpu.io.bed import read_plink
    from dissect_tpu.io.bgen import BgenData, write_bgen

    data = read_plink(str(HERE / "cohort"))
    d = data.dosages()  # (M, N) int8, -1 = missing
    dosages = np.where(d >= 0, d, np.nan).astype(np.float32)
    write_bgen(
        str(HERE / "cohort.bgen"),
        BgenData(snps=data.snps, individuals=data.individuals,
                 dosages=dosages),
        bits=16,
    )


def run_cli(args):
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    try:
        main(args)
    finally:
        set_mesh_context(None)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    make_cohort()
    base = ["--bfile", str(HERE / "cohort"), "--pheno",
            str(HERE / "pheno.txt"), "--mesh", "none"]
    run_cli(["--make-grm"] + base + ["--out", str(HERE / "golden")])
    run_cli(["--reml", "--grm", str(HERE / "golden"), "--blue",
             "--snp-blup"]
            + base + ["--out", str(HERE / "golden")])
    run_cli(["--pca", "--grm", str(HERE / "golden"), "--num-eval", "5"]
            + base + ["--out", str(HERE / "golden")])
    run_cli(["--gwas"] + base + ["--out", str(HERE / "golden.ols")])
    run_cli(["--gwas", "--grm", str(HERE / "golden")] + base
            + ["--out", str(HERE / "golden.mlm")])
    # round-2 golden surfaces: grouped GWAS, igwas, mp pipeline,
    # simulate/predict (all deterministic: fixed cohort + --random-seed)
    run_cli(["--gwas", "--groups", str(HERE / "groups.txt")] + base
            + ["--out", str(HERE / "golden.grp")])
    run_cli(["--igwas", "--bfile", str(HERE / "cohort"),
             "--igwas-qcovar", str(HERE / "testcovar.txt"),
             "--mesh", "none", "--out", str(HERE / "golden.ig")])
    run_cli(["--mpresiduals"] + base + ["--out", str(HERE / "golden.mp")])
    run_cli(["--mpgwas"] + base + ["--out", str(HERE / "golden.mp")])
    run_cli(["--simulate", "--bfile", str(HERE / "cohort"),
             "--effect-sizes", str(HERE / "causal.txt"),
             "--simu-h2", "0.6", "--random-seed", "7",
             "--mesh", "none", "--out", str(HERE / "golden.sim")])
    with open(HERE / "eff.txt", "w") as fh:
        fh.write("SNP ALLELE EFFECT\n")
        for line in (HERE / "golden.sim.simulated.effects").read_text().splitlines():
            snp, eff = line.split()
            fh.write(f"{snp} C {eff}\n")
    run_cli(["--predict", "--bfile", str(HERE / "cohort"),
             "--snp-effects", str(HERE / "eff.txt"),
             "--mesh", "none", "--out", str(HERE / "golden.pred")])
    # round-3 golden surfaces: bivariate .reml + .correlations
    # (reml.cpp:2838-2906), regional REML (.regional/.lrt,
    # singlereml.cpp:230-360), diagonalized GRM (.grm.diag eigenvalues
    # + eigenvector .dat, kernel.cpp:992-1002), .blup.snps above
    # (reml.cpp:3330-3346), and a BGEN-ingested GRM (genotypebgen.cpp)
    run_cli(["--bivar-reml", "--grm", str(HERE / "golden"),
             "--bfile", str(HERE / "cohort"),
             "--pheno", str(HERE / "pheno2.txt"), "--pheno-cols", "1,2",
             "--mesh", "none", "--out", str(HERE / "golden.bi")])
    run_cli(["--reml", "--groups", str(HERE / "groups.txt")] + base
            + ["--out", str(HERE / "golden.reg")])
    run_cli(["--make-grm", "--diagonalize"] + base
            + ["--out", str(HERE / "golden.diag")])
    write_bgen_cohort()
    run_cli(["--make-grm", "--bgen", str(HERE / "cohort.bgen"),
             "--mesh", "none", "--out", str(HERE / "golden.bgen")])
    # drop the run log (not a parity artifact)
    for log in HERE.glob("*.log"):
        log.unlink()
    print("golden fixture written to", HERE)


if __name__ == "__main__":
    main()
