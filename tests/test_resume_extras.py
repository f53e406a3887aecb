"""Checkpoint/resume, initial variances, subsample pre-fit, extra kernels."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


def _cohort(tmp_path, rng, n=150, m=200):
    dosage = make_dosage(rng, m, n)
    path, data = make_plink(tmp_path, dosage)
    p2 = dosage.sum(1) / (2 * n)
    z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
    y = z.T @ rng.normal(size=m) * np.sqrt(0.6 / m) + rng.normal(size=n) * 0.6
    pheno = tmp_path / "p.txt"
    with open(pheno, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.8g}\n")
    return path, str(pheno), data, y


class TestCheckpoint:
    def test_checkpoint_roundtrip(self, tmp_path):
        from dissect_tpu.runtime.checkpoint import REMLCheckpoint

        ck = REMLCheckpoint(
            iteration=5,
            theta=np.array([0.4, 0.6]),
            log_likelihood=-123.45,
            variance_names=["Var(GRM)", "Var(E)"],
            rel_diff=0.001,
        )
        path = str(tmp_path / "state.json")
        ck.save(path)
        loaded = REMLCheckpoint.load(path)
        assert loaded.iteration == 5
        np.testing.assert_allclose(loaded.theta, ck.theta)
        assert loaded.variance_names == ck.variance_names

    def test_resume_reaches_same_optimum(self, tmp_path, rng):
        import dataclasses

        from dissect_tpu.io.phenotype import read_phenotype
        from dissect_tpu.model.kernels import grm_from_plink
        from dissect_tpu.io.bed import read_plink
        from dissect_tpu.reml.single import SingleREML
        from dissect_tpu.reml.engine import REMLOptions

        bfile, pheno_path, data, y = _cohort(tmp_path, rng)
        import jax.numpy as jnp

        kern = grm_from_plink(read_plink(bfile), dtype=jnp.float64)
        pheno = read_phenotype(pheno_path)
        ckpt = str(tmp_path / "reml.ckpt")

        # full fit without interruption
        full = SingleREML([kern], pheno).compute()
        assert full.result.success

        # interrupted fit: stop after 2 iterations, then resume
        short = SingleREML([kern], pheno, options=REMLOptions(max_iterations=2))
        short.compute(checkpoint_path=ckpt)
        resumed = SingleREML([kern], pheno).compute(checkpoint_path=ckpt)
        assert resumed.result.success
        np.testing.assert_allclose(
            resumed.result.variances, full.result.variances, rtol=1e-4
        )

    def test_initial_variances_file(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        bfile, pheno_path, data, y = _cohort(tmp_path, rng)
        iv = tmp_path / "init.txt"
        iv.write_text(f"Var(GRM) {np.var(y) * 0.3:.6g}\nVar(E) {np.var(y) * 0.7:.6g}\n")
        out = str(tmp_path / "fit")
        main([
            "--reml", "--bfile", bfile, "--pheno", pheno_path,
            "--initial-variances", str(iv), "--out", out,
        ])
        assert (tmp_path / "fit.reml").exists()


class TestSubsample:
    def test_prefit_returns_sensible_values(self, tmp_path, rng):
        import jax.numpy as jnp

        from dissect_tpu.io.bed import read_plink
        from dissect_tpu.io.phenotype import read_phenotype
        from dissect_tpu.model.kernels import grm_from_plink
        from dissect_tpu.reml.single import SingleREML

        bfile, pheno_path, data, y = _cohort(tmp_path, rng, n=400, m=300)
        kern = grm_from_plink(read_plink(bfile), dtype=jnp.float64)
        pheno = read_phenotype(pheno_path)
        driver = SingleREML([kern], pheno)
        init = driver.subsample_prefit(2, proportion=0.5, minimum=100)
        assert init is not None
        assert set(init) == {"Var(GRM)", "Var(E)"}
        assert init["Var(E)"] > 0
        out = driver.compute(initial_variances=init)
        assert out.result.success


class TestExtraKernels:
    def test_reml_with_random_effect_and_gxe(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        bfile, pheno_path, data, y = _cohort(tmp_path, rng)
        re = tmp_path / "re.txt"
        with open(re, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} env{i % 3}\n")
        out = str(tmp_path / "fit")
        main([
            "--reml", "--bfile", bfile, "--pheno", pheno_path,
            "--random-effects", str(re), "--gxe", "--out", out,
        ])
        reml = (tmp_path / "fit.reml").read_text()
        assert "Var(RE1)" in reml
        assert "Var(GxE)" in reml
        assert "Var(GRM)" in reml


class TestSquaredExponentialKernel:
    def test_parameterized_fit(self, tmp_path, rng):
        """Fit a sq-exp kernel model: V = s2 exp(-a D) + s2e I with a
        fitted after the unfix delay; gradient at optimum ~ 0."""
        import jax.numpy as jnp

        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import kernel_squared_exponential
        from dissect_tpu.reml.engine import REMLOptions
        from dissect_tpu.reml.single import SingleREML

        n = 150
        coords = rng.uniform(0, 10, size=(n, 2))
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = kernel_squared_exponential("SEK-1", keys, coords)  # stores D
        d = np.asarray(kern.matrix)
        alpha_true = 0.5
        k_true = np.exp(-alpha_true * d)
        el = np.linalg.cholesky(k_true + 1e-8 * np.eye(n))
        y = el @ rng.normal(size=n) * np.sqrt(0.7) + rng.normal(size=n) * np.sqrt(0.3)
        pheno = Phenotype(keys=keys, values=y, column=1)
        driver = SingleREML([kern], pheno, options=REMLOptions(max_iterations=60))
        out = driver.compute(compute_blue=False)
        names = out.result.variance_names
        assert "alpha0(SEK-1)" in names
        alpha_hat = out.result.variances[names.index("alpha0(SEK-1)")]
        if out.result.success:
            # alpha should move off its 1/mean(D) init toward the truth
            assert 0.05 < alpha_hat < 5.0
        # gradient from the autodiff core must match finite differences
        import jax.numpy as jnp

        eng = driver.engine
        theta = np.asarray(out.result.variances, dtype=np.float64)
        q = eng._quantities(jnp.asarray(theta))

        def logl(t):
            qq = eng._quantities(jnp.asarray(t))
            return -0.5 * (
                float(qq["logdet_v"]) + float(qq["logdet_xtvix"]) + float(qq["ytpy"])
            )

        eps = 1e-6
        for i in range(len(theta)):
            tp, tm = theta.copy(), theta.copy()
            tp[i] += eps
            tm[i] -= eps
            num = (logl(tp) - logl(tm)) / (2 * eps)
            assert float(q["grad"][i]) == pytest.approx(num, rel=1e-4, abs=1e-6)
