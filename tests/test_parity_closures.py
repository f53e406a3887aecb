"""Round-2 parity closures: igwas per-SNP ML refits, GLMM's
REML-prepared covariance, and per-sub-covariance SNP BLUPs.

Parity targets: IGWAS::computeGLMWithCovariance (igwas.cpp:575-720),
GLMM::GLMM from a prepared REML (singlereml.cpp:193-200 +
glmm.cpp:40-55), REML::computeSNPsBLUP's loop over named
sub-covariances with genotype sources (reml.cpp:3098-3135,
auxiliar.cpp:754-790 grm-list parsing).
"""

import numpy as np

from tests.conftest import make_dosage, make_plink


def _run(args):
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    try:
        main(args)
    finally:
        set_mesh_context(None)


def test_igwas_ml_matches_dense_oracle(rng):
    """igwas with a covariance fits per-SNP variances by ML — pinned to
    an independent dense-space Fisher-scoring oracle."""
    from dissect_tpu.gwas.igwas import igwas
    from tests.test_gwas_covariance import _dense_ml_fit

    n, m = 72, 10
    d = make_dosage(rng, m + 30, n)
    zfull = (d - d.mean(1, keepdims=True)).astype(np.float64)
    k = zfull[m:].T @ zfull[m:] / 30.0
    k /= np.mean(np.diag(k))
    w, u = np.linalg.eigh(k)
    z = zfull[:m]
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    res = igwas(
        z, [f"s{i}" for i in range(m)], x, ["mean", "q1"],
        covariance=(w, u), initial_h2=0.5, n_iterations=40,
    )
    assert res.model == "MLM-ML"
    for i in [0, 4, 9]:
        y = z[i]
        var = y.var(ddof=1)
        b, ai_diag, theta, _ = _dense_ml_fit(
            y, x, k, (0.5 * var, 0.5 * var)
        )
        np.testing.assert_allclose(res.beta[i], b, rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(
            res.se[i], np.sqrt(ai_diag), rtol=1e-4
        )


def test_cli_igwas_with_grm_uses_ml_refits(tmp_path, rng):
    """--igwas --grm: base covariates come from --qcovar, the
    correction is per-SNP fitted variances (not a hardcoded V = K + I),
    and testing covariates are rejected under a covariance
    (igwas.cpp:70-76)."""
    import pytest

    d = make_dosage(rng, 30, 60)
    bfile, _ = make_plink(tmp_path, d, prefix="cohort")
    with open(tmp_path / "qc.txt", "w") as fh:
        for i in range(60):
            fh.write(f"F{i} I{i} {rng.normal():.6f}\n")
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp_path}/g",
          "--mesh", "none"])
    _run(["--igwas", "--bfile", bfile, "--igwas-qcovar",
          str(tmp_path / "qc.txt"), "--out", f"{tmp_path}/plain",
          "--mesh", "none"])
    _run(["--igwas", "--bfile", bfile, "--grm", f"{tmp_path}/g",
          "--qcovar", str(tmp_path / "qc.txt"),
          "--out", f"{tmp_path}/corrected", "--mesh", "none"])
    with pytest.raises(ValueError, match="igwas.cpp:70-76"):
        _run(["--igwas", "--bfile", bfile, "--grm", f"{tmp_path}/g",
              "--igwas-qcovar", str(tmp_path / "qc.txt"),
              "--out", f"{tmp_path}/bad", "--mesh", "none"])
    plain = open(f"{tmp_path}/plain.igwas").read().splitlines()
    corr = open(f"{tmp_path}/corrected.igwas").read().splitlines()
    assert len(plain) == len(corr) > 1
    p_plain = np.array([float(l.split()[4]) for l in plain[1:]])
    p_corr = np.array([float(l.split()[4]) for l in corr[1:]])
    assert np.isfinite(p_corr).all()
    assert not np.allclose(p_plain, p_corr, rtol=1e-3)

    # oracle check on one SNP: per-SNP ML refit in dense space
    from dissect_tpu.io.grm_io import read_grm
    from dissect_tpu.runtime.stats import chi2_sf
    from tests.test_gwas_covariance import _dense_ml_fit

    loaded = read_grm(f"{tmp_path}/g")
    k = np.asarray(loaded["kernel"], dtype=np.float64)
    stats_mean = d.mean(1)
    y = (d[0] - stats_mean[0]).astype(np.float64)
    qc = np.array([float(l.split()[2])
                   for l in open(tmp_path / "qc.txt").read().splitlines()])
    x = np.column_stack([np.ones(60), qc])
    var = y.var(ddof=1)
    b, ai_diag, _, _ = _dense_ml_fit(y, x, k, (0.5 * var, 0.5 * var))
    p_expect = chi2_sf(1, b[1] ** 2 / ai_diag[1])
    np.testing.assert_allclose(p_corr[1], p_expect, rtol=5e-3, atol=1e-10)


def test_igwas_reference_format_and_group_f_test(tmp_path, rng):
    """IGWAS::storeResults files (igwas.cpp:854-967): per-SNP groups in
    lexicographic order with NA SNP-effect columns, GROUPPV = the joint
    F-test of the tested covariates vs the base-only reduced fit,
    pinned to a numpy nested-model oracle."""
    from scipy.stats import f as f_dist

    n, m = 90, 12
    d = make_dosage(rng, m, n)
    bfile, _ = make_plink(tmp_path, d, prefix="cohort")
    with open(tmp_path / "qc.txt", "w") as fh:
        for i in range(n):
            fh.write(f"F{i} I{i} {rng.normal():.6f} {rng.normal():.6f}\n")
    _run(["--igwas", "--bfile", bfile, "--igwas-qcovar",
          str(tmp_path / "qc.txt"), "--out", f"{tmp_path}/ig",
          "--mesh", "none"])
    rows = open(f"{tmp_path}/ig.gwas.snps").read().splitlines()
    assert rows[0].split() == [
        "GROUP", "SNP", "ALLELE", "MEAN", "STDEV", "BETA", "NBETA",
        "SE", "PV", "GROUPPV",
    ]
    recs = {r.split()[1]: r.split() for r in rows[1:]}
    assert [r.split()[1] for r in rows[1:]] == sorted(recs)
    assert all(rec[5] == rec[8] == "NA" for rec in recs.values())
    mean_rows = open(f"{tmp_path}/ig.gwas.mean").read().splitlines()
    assert mean_rows[0].split() == ["GROUP", "NAME", "BETA", "SE", "PV"]
    assert len(mean_rows) == 1 + m  # one base 'mean' row per SNP group

    qc = np.loadtxt(tmp_path / "qc.txt", usecols=(2, 3))
    for i in [0, 5, 11]:
        y = (d[i] - d[i].mean()).astype(np.float64)
        x_base = np.ones((n, 1))
        x_full = np.column_stack([x_base, qc])
        b_f, *_ = np.linalg.lstsq(x_full, y, rcond=None)
        b_r, *_ = np.linalg.lstsq(x_base, y, rcond=None)
        sse_f = ((y - x_full @ b_f) ** 2).sum()
        sse_r = ((y - x_base @ b_r) ** 2).sum()
        h, q = 2.0, x_full.shape[1]
        f_stat = (sse_r - sse_f) / h / (sse_f / (n - q))
        p = float(f_dist.sf(f_stat, h, n - q))
        np.testing.assert_allclose(
            float(recs[f"snp{i}"][9]), p, rtol=1e-3, atol=1e-12
        )


def test_cli_glmm_covariance_from_prepared_model(tmp_path, rng):
    """--glmm builds V from the REML-prepared model (OLS residual
    variance split by --init-h2 over kernels + E), and accepts extra
    random-effect kernels."""
    d = make_dosage(rng, 40, 80)
    bfile, _ = make_plink(tmp_path, d, prefix="cohort")
    z = (d - d.mean(1, keepdims=True)) / (d.std(1, keepdims=True) + 1e-9)
    liab = z[:8].sum(0) / np.sqrt(8) + rng.normal(size=80)
    y12 = (liab > 0).astype(int) + 1
    with open(tmp_path / "pheno.txt", "w") as fh:
        for i in range(80):
            fh.write(f"F{i} I{i} {y12[i]}\n")
    with open(tmp_path / "re.txt", "w") as fh:
        for i in range(80):
            fh.write(f"F{i} I{i} b{i % 2}\n")
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp_path}/g",
          "--mesh", "none"])
    _run(["--glmm", "--grm", f"{tmp_path}/g",
          "--pheno", str(tmp_path / "pheno.txt"),
          "--random-effects", str(tmp_path / "re.txt"),
          "--out", f"{tmp_path}/gl", "--mesh", "none"])
    lines = open(f"{tmp_path}/gl.glmm").read().splitlines()
    assert lines[0] == "NAME BETA SE"
    vals = np.array([float(l.split()[1]) for l in lines[1:]])
    assert np.isfinite(vals).all()


def test_cli_snp_blup_per_named_subcovariance(tmp_path, rng):
    """--reml --grm-list with named GRMs + genotype sources writes one
    SNP-BLUP file per sub-covariance, each scaled by ITS fitted
    variance (reml.cpp:3098-3135)."""
    d = make_dosage(rng, 60, 90)
    bfile_a, _ = make_plink(tmp_path, d[:30], prefix="setA")
    bfile_b, _ = make_plink(tmp_path, d[30:], prefix="setB")
    z = (d - d.mean(1, keepdims=True)) / (d.std(1, keepdims=True) + 1e-9)
    y = (
        z[:10].sum(0) * 0.35
        + z[30:40].sum(0) * 0.1
        + rng.normal(size=90) * 0.6
    )
    with open(tmp_path / "pheno.txt", "w") as fh:
        for i in range(90):
            fh.write(f"F{i} I{i} {y[i]:.6f}\n")
    _run(["--make-grm", "--bfile", bfile_a, "--out", f"{tmp_path}/ga",
          "--mesh", "none"])
    _run(["--make-grm", "--bfile", bfile_b, "--out", f"{tmp_path}/gb",
          "--mesh", "none"])
    with open(tmp_path / "grms.txt", "w") as fh:
        fh.write(f"KA {tmp_path}/ga F {bfile_a}\n")
        fh.write(f"KB {tmp_path}/gb F {bfile_b}\n")
    _run(["--reml", "--grm-list", str(tmp_path / "grms.txt"),
          "--pheno", str(tmp_path / "pheno.txt"), "--snp-blup",
          "--skip-test-reduced-models",
          "--out", f"{tmp_path}/r", "--mesh", "none"])

    # the joint fit names both variances
    reml_text = open(f"{tmp_path}/r.reml").read()
    assert "Var(KA)" in reml_text and "Var(KB)" in reml_text

    import glob

    blup_files = sorted(glob.glob(f"{tmp_path}/r.*blup.snps"))
    assert len(blup_files) == 2, blup_files
    # each file carries its own sub-covariance's SNPs
    a_files = [f for f in blup_files if ".KA." in f]
    b_files = [f for f in blup_files if ".KB." in f]
    assert len(a_files) == 1 and len(b_files) == 1
    a_lines = open(a_files[0]).read().splitlines()
    b_lines = open(b_files[0]).read().splitlines()
    assert len(a_lines) - 1 == 30 and len(b_lines) - 1 == 30
    effects_a = np.array([float(l.split()[-1]) for l in a_lines[1:]])
    effects_b = np.array([float(l.split()[-1]) for l in b_lines[1:]])
    assert np.isfinite(effects_a).all() and np.isfinite(effects_b).all()
    assert not np.allclose(effects_a, 0) and not np.allclose(effects_b, 0)
