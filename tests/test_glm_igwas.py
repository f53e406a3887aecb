"""Tests for logistic GLM, GLMM, inverse GWAS, SNP BLUP and their CLI paths."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


class TestLogistic:
    def test_matches_statsmodels_style_newton(self, rng):
        from dissect_tpu.glm.logistic import fit_logistic

        n = 400
        x = np.column_stack([np.ones(n), rng.normal(size=n), rng.normal(size=n)])
        beta_true = np.array([0.3, 1.2, -0.7])
        p = 1 / (1 + np.exp(-(x @ beta_true)))
        y = (rng.random(n) < p).astype(float)
        fit = fit_logistic(y, x)
        assert fit.success
        # reference numpy Newton
        beta = np.zeros(3)
        for _ in range(50):
            eta = x @ beta
            mu = 1 / (1 + np.exp(-eta))
            w = mu * (1 - mu)
            step = np.linalg.solve((x.T * w) @ x, x.T @ (y - mu))
            beta += step
            if np.abs(step).max() < 1e-12:
                break
        np.testing.assert_allclose(fit.betas, beta, rtol=1e-6)
        cov = np.linalg.inv((x.T * (1 / (1 + np.exp(-(x @ beta))) * (1 - 1 / (1 + np.exp(-(x @ beta)))))) @ x)
        np.testing.assert_allclose(fit.se, np.sqrt(np.diag(cov)), rtol=1e-5)

    def test_offset(self, rng):
        from dissect_tpu.glm.logistic import fit_logistic

        n = 300
        x = np.ones((n, 1))
        offset = rng.normal(size=n)
        y = (rng.random(n) < 1 / (1 + np.exp(-(0.5 + offset)))).astype(float)
        fit = fit_logistic(y, x, offset=offset)
        assert fit.success
        assert abs(fit.betas[0] - 0.5) < 0.3


class TestGlmm:
    def test_glmm_runs_and_recovers_direction(self, rng):
        from dissect_tpu.glm.glmm import GLMM

        n = 150
        z = rng.normal(size=(300, n))
        k = z.T @ z / 300
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        u = el @ rng.normal(size=n) * 1.0
        x = np.column_stack([np.ones(n), rng.normal(size=n)])
        eta = x @ [0.0, 1.0] + u
        y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
        result = GLMM(y, x, k + 0.5 * np.eye(n), seed=7).fit(
            n_outer=4, n_samples=30, burn_in=5
        )
        assert result.success
        assert result.betas[1] > 0  # direction of the covariate effect
        assert 0.0 <= result.acceptance_rate <= 1.0


class TestIGwas:
    def test_ols_matches_per_snp(self, rng):
        from dissect_tpu.gwas.igwas import igwas

        n, m = 120, 20
        dosage = make_dosage(rng, m, n)
        z = dosage - dosage.mean(1, keepdims=True)
        x = np.column_stack([np.ones(n), rng.normal(size=n)])
        res = igwas(z, [f"s{i}" for i in range(m)], x, ["mean", "q1"])
        for s in [0, 13]:
            b_ref, *_ = np.linalg.lstsq(x, z[s], rcond=None)
            np.testing.assert_allclose(res.beta[s], b_ref, rtol=1e-8, atol=1e-10)
            resid = z[s] - x @ b_ref
            mse = resid @ resid / (n - 2)
            se = np.sqrt(mse * np.diag(np.linalg.inv(x.T @ x)))
            np.testing.assert_allclose(res.se[s], se, rtol=1e-8)

    def test_gls_variant(self, rng):
        from dissect_tpu.gwas.igwas import igwas

        n, m = 60, 8
        dosage = make_dosage(rng, m, n)
        z = dosage - dosage.mean(1, keepdims=True)
        x = np.ones((n, 1))
        a = rng.normal(size=(n, n))
        v = a @ a.T / n + np.eye(n)
        vi = np.linalg.inv(v)
        res = igwas(z, [f"s{i}" for i in range(m)], x, ["mean"], v_inv=vi)
        b_ref = np.linalg.solve(x.T @ vi @ x, x.T @ vi @ z[3])
        assert res.beta[3, 0] == pytest.approx(float(b_ref[0]), rel=1e-8)


class TestSnpBlup:
    def test_blup_identity(self, tmp_path, rng):
        """Z' (snp blups) should reconstruct the individual BLUPs:
        u = s2 K Py with K = Z'Z/M  =>  Z'(s2 Z Py / M) = u."""
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import grm_from_plink
        from dissect_tpu.reml.single import SingleREML
        from dissect_tpu.reml.snp_blup import compute_snp_blup

        import jax.numpy as jnp

        n, m = 100, 200
        dosage = make_dosage(rng, m, n)
        _, data = make_plink(tmp_path, dosage)
        kern = grm_from_plink(data, dtype=jnp.float64)
        stats = data.stats()
        z = (dosage - stats.mean[:, None]) / stats.std[:, None]
        y = z.T @ rng.normal(size=m) * np.sqrt(0.5 / m) + rng.normal(size=n) * 0.7
        pheno = Phenotype(keys=data.individual_keys, values=y, column=1)
        driver = SingleREML([kern], pheno)
        out = driver.compute(compute_blup=True)
        assert out.result.success
        q = driver.engine._final_device_state()
        py = np.asarray(q["py"], dtype=np.float64)
        blups = compute_snp_blup(
            data, out.individual_keys, py, out.result.variance("Var(GRM)")
        )
        recon = z.T @ blups["blup"]
        np.testing.assert_allclose(recon, out.blup["GRM"], rtol=1e-6, atol=1e-9)

    def test_cli_snp_blup_and_predict(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        n, m = 120, 150
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        stats = data.stats()
        z = (dosage - stats.mean[:, None]) / stats.std[:, None]
        y = z.T @ rng.normal(size=m) * np.sqrt(0.6 / m) + rng.normal(size=n) * 0.6
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.8g}\n")
        out = str(tmp_path / "fit")
        main([
            "--reml", "--bfile", path, "--pheno", str(pheno),
            "--snp-blup", "--out", out,
        ])
        blup_file = tmp_path / "fit.GRM.blup.snps"
        assert blup_file.exists()
        # those effects drive prediction
        out2 = str(tmp_path / "pred")
        main([
            "--predict", "--bfile", path,
            "--snp-effects", str(blup_file), "--out", out2,
        ])
        lines = (tmp_path / "pred.predicted.phenos").read_text().splitlines()[1:]
        pred = np.array([float(l.split()[2]) for l in lines])
        r = np.corrcoef(pred, y)[0, 1]
        assert r > 0.3  # in-sample polygenic score correlates


class TestCliExtra:
    def test_igwas_cli(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        n, m = 80, 30
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        qc = tmp_path / "qc.txt"
        with open(qc, "w") as fh:
            for ind in data.individuals:
                fh.write(f"{ind.family_id} {ind.individual_id} {rng.normal():.6g}\n")
        out = str(tmp_path / "ig")
        main([
            "--igwas", "--bfile", path, "--igwas-qcovar", str(qc), "--out", out,
        ])
        lines = (tmp_path / "ig.igwas").read_text().splitlines()
        assert len(lines) == 1 + m * 2  # header + M x (mean, q)

    def test_glmm_cli(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        n, m = 80, 100
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {1 + (i % 2)}\n")
        out = str(tmp_path / "gl")
        main([
            "--glmm", "--bfile", path, "--pheno", str(pheno), "--out", out,
        ])
        assert (tmp_path / "gl.glmm").exists()


class TestIGwasMomentForm:
    def test_matches_vmapped_oracle(self, rng):
        """The moment-form igwas ML core reproduces the vmapped per-SNP
        formulation: same trajectories, coefficients, SEs, logL."""
        import jax.numpy as jnp

        from dissect_tpu.gwas.igwas import (
            _igwas_ml_core,
            _igwas_ml_core_vmapped,
        )

        n, m = 84, 13
        dosage = make_dosage(rng, m + 30, n)
        z = (dosage - dosage.mean(1, keepdims=True)).astype(np.float64)
        k = z[m:].T @ z[m:] / 30.0
        k /= np.mean(np.diag(k))
        w, u = np.linalg.eigh(k)
        x = np.column_stack([np.ones(n), rng.normal(size=n)])
        g_rot = jnp.asarray(z[:m] @ u)
        x_rot = jnp.asarray(u.T @ x)
        lam = jnp.asarray(w)
        snp_var = z[:m].var(axis=1, ddof=1)
        theta0s = jnp.asarray(np.column_stack([0.5 * snp_var, 0.5 * snp_var]))

        out_f = _igwas_ml_core(g_rot, x_rot, lam, theta0s, 12)
        out_v = _igwas_ml_core_vmapped(g_rot, x_rot, lam, theta0s, 12)
        for a, b, name in zip(out_f, out_v, ["b", "ai", "theta", "logl", "gn"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-12,
                err_msg=name,
            )
