"""Mixed-model GWAS covariance machinery.

Parity targets: GWAS::computeCovariance (gwas.cpp:1400-1602) — extra
random-effect kernels, internal REML fit, V scaled by 1/sum(sigma2
genetic); computeGLMWithCovariance group fits (gwas.cpp:787-914) and
the MLModelType group LRT (gwas.cpp:940-957).  Oracles are independent
DENSE-space float64 numpy implementations (the repo paths run in the
covariance eigenbasis).
"""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


def _simulate(rng, m=40, n=96, n_groups_col=None):
    d = make_dosage(rng, m, n)
    z = (d - d.mean(1, keepdims=True)) / (d.std(1, keepdims=True) + 1e-9)
    g = z[:8].sum(0) / np.sqrt(8)
    cats = rng.integers(0, 3, size=n)  # environment batches
    batch_eff = np.array([-0.5, 0.0, 0.7])[cats]
    y = 0.6 * g + batch_eff + rng.normal(size=n) * 0.6
    return d, z, y, cats


def _dense_ml_fit(y, xg, k, theta0, iters=40):
    """Independent dense-space Fisher-scoring ML oracle for
    V = t1*K + t2*I (the embedded per-test REML of gwas.cpp:787-914)."""
    n = len(y)
    theta = np.array(theta0, dtype=np.float64)
    floor = 1e-6 * theta.sum()
    eye = np.eye(n)
    for _ in range(iters):
        v = theta[0] * k + theta[1] * eye
        vi = np.linalg.inv(v)
        a = xg.T @ vi @ xg
        ai = np.linalg.inv(a)
        b = ai @ (xg.T @ vi @ y)
        r = y - xg @ b
        pyr = vi @ r
        grad = 0.5 * np.array(
            [pyr @ k @ pyr - np.trace(vi @ k), pyr @ pyr - np.trace(vi)]
        )
        vik = vi @ k
        f = 0.5 * np.array(
            [
                [np.trace(vik @ vik), np.trace(vik @ vi)],
                [np.trace(vik @ vi), np.trace(vi @ vi)],
            ]
        )
        theta = np.maximum(theta + np.linalg.solve(f, grad), floor)
    v = theta[0] * k + theta[1] * eye
    vi = np.linalg.inv(v)
    a = xg.T @ vi @ xg
    ai = np.linalg.inv(a)
    b = ai @ (xg.T @ vi @ y)
    r = y - xg @ b
    sign, logdet = np.linalg.slogdet(v)
    logl = -0.5 * (logdet + r @ vi @ r)
    return b, np.diag(ai), theta, logl


def test_ml_refit_matches_dense_oracle(rng):
    """The eigenbasis per-SNP ML refit equals the dense-space fit."""
    from dissect_tpu.gwas.mlm import mlm_gwas_ml_refit

    d, z, y, _ = _simulate(rng, m=20, n=64)
    k = z.T @ z / z.shape[0]
    w, u = np.linalg.eigh(k)
    x = np.column_stack([np.ones(64), rng.normal(size=64)])
    theta0 = (0.5 * y.var(), 0.5 * y.var())
    res = mlm_gwas_ml_refit(z[:5], y, x, w, u, theta0, n_iterations=40)
    for i in range(5):
        xg = np.column_stack([x, z[i]])
        b, ai_diag, theta, logl = _dense_ml_fit(y, xg, k, theta0)
        np.testing.assert_allclose(res.snp_beta[i], b[-1], rtol=1e-5)
        np.testing.assert_allclose(
            res.snp_se[i], np.sqrt(ai_diag[-1]), rtol=1e-5
        )


def test_grouped_gwas_under_covariance_matches_dense_oracle(rng):
    """Grouped ML fits + chi2 LRT GROUPPV vs the dense-space oracle
    (gwas.cpp:314-478 group fits under computeGLMWithCovariance)."""
    from collections import OrderedDict

    from dissect_tpu.gwas.grouped import grouped_gwas
    from dissect_tpu.runtime.stats import chi2_sf

    d, z, y, _ = _simulate(rng, m=24, n=80)
    k = z.T @ z / z.shape[0]
    w, u = np.linalg.eigh(k)
    x = np.ones((80, 1))
    theta0 = (0.5 * y.var(), 0.5 * y.var())
    names = [f"snp{i}" for i in range(24)]
    grouping = OrderedDict(
        [("gA", names[:4]), ("gB", names[4:10]), ("gC", names[10:14])]
    )
    results, _ = grouped_gwas(
        z, names, grouping, y, x,
        covariance=(w, u, theta0), ml_iterations=40,
    )
    assert set(results) == {"gA", "gB", "gC"}

    # dense oracle for group gA (4 SNPs)
    xg = np.column_stack([x, z[:4].T])
    b, ai_diag, theta, logl = _dense_ml_fit(y, xg, k, theta0)
    _, _, _, logl0 = _dense_ml_fit(y, x, k, theta0)
    res = results["gA"]
    np.testing.assert_allclose(res.beta, b, rtol=1e-4)
    np.testing.assert_allclose(res.se, np.sqrt(ai_diag), rtol=1e-4)
    lrt = max(2 * (logl - logl0), 0.0)
    np.testing.assert_allclose(res.f_statistic, lrt, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        res.f_p_value, chi2_sf(4, lrt), rtol=1e-3, atol=1e-10
    )


def _write_cohort(tmp_path, rng):
    d, z, y, cats = _simulate(rng)
    bfile, data = make_plink(tmp_path, d, prefix="cohort")
    n = d.shape[1]
    with open(tmp_path / "pheno.txt", "w") as fh:
        for i in range(n):
            fh.write(f"F{i} I{i} {y[i]:.6f}\n")
    with open(tmp_path / "batches.txt", "w") as fh:
        for i in range(n):
            fh.write(f"F{i} I{i} batch{cats[i]}\n")
    return bfile, d, z, y, cats, n


def _run(args):
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    try:
        main(args)
    finally:
        set_mesh_context(None)


def test_cli_multikernel_gwas_covariance(tmp_path, rng):
    """GRM + random-effect kernel: the combined scaled covariance
    changes the p-values vs the GRM-only run, and the EMMAX path
    matches a numpy GLS oracle built from the SAME combined V
    (gwas.cpp:1400-1602)."""
    bfile, d, z, y, cats, n = _write_cohort(tmp_path, rng)
    base = ["--bfile", bfile, "--pheno", str(tmp_path / "pheno.txt"),
            "--mesh", "none"]
    _run(["--make-grm"] + base + ["--out", f"{tmp_path}/g"])

    _run(["--gwas", "--grm", f"{tmp_path}/g"] + base
         + ["--out", f"{tmp_path}/solo"])
    _run(["--gwas", "--grm", f"{tmp_path}/g",
          "--random-effects", str(tmp_path / "batches.txt")] + base
         + ["--out", f"{tmp_path}/multi"])
    def p_by_name(path):
        out = {}
        with open(path) as fh:
            next(fh)
            for line in fh:
                parts = line.split()
                out[parts[1]] = float(parts[8])
        return out

    p_solo = p_by_name(f"{tmp_path}/solo.gwas.snps")
    p_multi = p_by_name(f"{tmp_path}/multi.gwas.snps")
    shared = sorted(set(p_solo) & set(p_multi))
    assert len(shared) >= 10
    ps = np.array([p_solo[k] for k in shared])
    pm = np.array([p_multi[k] for k in shared])
    assert np.isfinite(pm).all()
    assert not np.allclose(ps, pm, rtol=1e-3)

    # EMMAX path vs a GLS oracle sharing the combined kernel + null fit
    _run(["--gwas", "--grm", f"{tmp_path}/g", "--gwas-use-null-variances",
          "--random-effects", str(tmp_path / "batches.txt")] + base
         + ["--out", f"{tmp_path}/fixedv"])

    from dissect_tpu.analysis.dispatcher import Analysis
    from dissect_tpu.io.covariate import read_covariates
    from dissect_tpu.io.phenotype import read_phenotype
    from dissect_tpu.runtime.options import Options

    opts = Options.parse(
        ["--gwas", "--grm", f"{tmp_path}/g",
         "--random-effects", str(tmp_path / "batches.txt")] + base
        + ["--out", f"{tmp_path}/oracle"]
    )
    ana = Analysis(opts)
    kern = ana.load_grm(allow_compute=False)
    extras = ana.extra_kernels(kern)
    assert len(extras) == 1  # the discrete batch kernel
    pheno = read_phenotype(str(tmp_path / "pheno.txt"), 1)
    covar = read_covariates(default_keys=pheno.keys)
    common = list(kern.individual_keys)
    lam, u, (vg, ve) = ana._gwas_covariance(
        [kern] + extras, common, pheno, covar
    )
    v = (u * (vg * lam + ve)) @ u.T
    vi = np.linalg.inv(v)
    x = np.ones((n, 1))
    p_fixedv = p_by_name(f"{tmp_path}/fixedv.gwas.snps")
    from dissect_tpu.runtime.stats import chi2_sf

    for i in [0, 7, 19]:
        xg = np.column_stack([x, z[i]])
        a = xg.T @ vi @ xg
        b = np.linalg.solve(a, xg.T @ vi @ y)
        se = np.sqrt(np.linalg.inv(a)[-1, -1])
        p = chi2_sf(1, (b[-1] / se) ** 2)
        np.testing.assert_allclose(
            p_fixedv[f"snp{i}"], p, rtol=2e-3, atol=1e-12
        )


def test_cli_grouped_gwas_with_grm(tmp_path, rng):
    """--gwas --groups with a GRM runs the group fits under the mixed
    model: GROUPPV is a chi2 LRT, not the OLS F-test."""
    bfile, d, z, y, cats, n = _write_cohort(tmp_path, rng)
    base = ["--bfile", bfile, "--pheno", str(tmp_path / "pheno.txt"),
            "--mesh", "none"]
    _run(["--make-grm"] + base + ["--out", f"{tmp_path}/g"])
    with open(tmp_path / "groups.txt", "w") as fh:
        for i in range(d.shape[0]):
            fh.write(f"snp{i} grp{i % 3}\n")
    _run(["--gwas", "--groups", str(tmp_path / "groups.txt")] + base
         + ["--out", f"{tmp_path}/gols"])
    _run(["--gwas", "--grm", f"{tmp_path}/g",
          "--groups", str(tmp_path / "groups.txt")] + base
         + ["--out", f"{tmp_path}/gmlm"])
    ols = np.loadtxt(f"{tmp_path}/gols.multi.gwas.snps", skiprows=1,
                     usecols=(9,))
    mlm = np.loadtxt(f"{tmp_path}/gmlm.multi.gwas.snps", skiprows=1,
                     usecols=(9,))
    assert np.isfinite(mlm).all()
    assert not np.allclose(ols, mlm, rtol=1e-3)


def test_cli_recursive_gwas_with_grm(tmp_path, rng):
    """--rgwas with a GRM: the recursive group fits run under the
    covariance and still converge to a SNP set."""
    bfile, d, z, y, cats, n = _write_cohort(tmp_path, rng)
    base = ["--bfile", bfile, "--pheno", str(tmp_path / "pheno.txt"),
            "--mesh", "none"]
    _run(["--make-grm"] + base + ["--out", f"{tmp_path}/g"])
    _run(["--rgwas", "--grm", f"{tmp_path}/g",
          "--rgwas-group-size", "8", "--significance-threshold", "0.01"]
         + base + ["--out", f"{tmp_path}/r"])
    lines = open(f"{tmp_path}/r.rgwas").read().splitlines()
    assert lines[0] == "SNP"


def test_moment_form_refit_matches_vmapped_oracle(rng):
    """The moment-form _ml_refit_core (two MXU matmuls per iteration)
    must reproduce the vmapped per-SNP formulation exactly: same
    Fisher-scoring trajectory, coefficients, SEs, logL, variances."""
    import jax.numpy as jnp

    from dissect_tpu.gwas.mlm import _ml_refit_core, _ml_refit_core_vmapped

    n, m = 96, 17
    d = make_dosage(rng, m + 40, n)
    z = (d - d.mean(1, keepdims=True)).astype(np.float64)
    k = z[m:].T @ z[m:] / 40.0
    k /= np.mean(np.diag(k))
    w, u = np.linalg.eigh(k)
    y = z[:3].sum(0) * 0.2 + rng.normal(size=n)
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    g_rot = jnp.asarray(z[:m] @ u)
    y_rot = jnp.asarray(u.T @ y)
    x_rot = jnp.asarray(u.T @ x)
    lam = jnp.asarray(w)
    theta0 = jnp.asarray([0.5 * y.var(), 0.5 * y.var()])

    b_f, ai_f, th_f, ll_f, gn_f = _ml_refit_core(
        g_rot, y_rot, x_rot, lam, theta0, 12
    )
    b_v, ai_v, th_v, ll_v, gn_v = _ml_refit_core_vmapped(
        g_rot, y_rot, x_rot, lam, theta0, 12
    )
    np.testing.assert_allclose(np.asarray(th_f), np.asarray(th_v), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_v), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ai_f), np.asarray(ai_v), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(ll_f), np.asarray(ll_v), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(gn_f), np.asarray(gn_v), rtol=1e-6, atol=1e-10
    )


def test_pallas_fused_moments_matches_xla_core(rng):
    """The fused Pallas moments kernel (gwas/pallas_moments.py,
    interpret mode on CPU) must reproduce the XLA moment-form core:
    same trajectories, coefficients, SEs, logL — including the n/M
    padding paths (deliberately unaligned shapes)."""
    import jax.numpy as jnp

    import dissect_tpu.gwas.pallas_moments as pm
    from dissect_tpu.gwas.mlm import _ml_refit_core

    n, m = 96, 17
    d = make_dosage(rng, m + 40, n)
    z = (d - d.mean(1, keepdims=True)).astype(np.float64)
    k = z[m:].T @ z[m:] / 40.0
    k /= np.mean(np.diag(k))
    w, u = np.linalg.eigh(k)
    y = z[:3].sum(0) * 0.2 + rng.normal(size=n)
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    g_rot = jnp.asarray((z[:m] @ u).astype(np.float32))
    y_rot = jnp.asarray((u.T @ y).astype(np.float32))
    x_rot = jnp.asarray((u.T @ x).astype(np.float32))
    lam = jnp.asarray(w.astype(np.float32))
    theta0 = jnp.asarray([0.5 * y.var(), 0.5 * y.var()], jnp.float32)

    b_x, ai_x, th_x, ll_x, _ = _ml_refit_core(
        g_rot, y_rot, x_rot, lam, theta0, 8, use_pallas=False
    )
    orig = pm.fused_refit_moments
    # CPU: run the real kernel through the interpreter with tiny blocks
    pm.fused_refit_moments = lambda *a, **kw: orig.__wrapped__(
        *a, block_m=8, block_k=32, interpret=True
    )
    try:
        b_p, ai_p, th_p, ll_p, _ = _ml_refit_core.__wrapped__(
            g_rot, y_rot, x_rot, lam, theta0, 8, use_pallas=True
        )
    finally:
        pm.fused_refit_moments = orig
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_x), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ai_p), np.asarray(ai_x), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(th_p), np.asarray(th_x), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_x), rtol=2e-3, atol=2e-2)
