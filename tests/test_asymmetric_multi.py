"""Multi-trait REML with DIFFERING per-trait individual sets
(asymmetric kernel blocks, reml.cpp:812-877)."""

import jax.numpy as jnp
import numpy as np
import pytest


def _kernel(rng, n):
    z = rng.normal(size=(4 * n, n))
    return z.T @ z / (4 * n)


class TestAsymmetricBivar:
    def _setup(self, rng, n=120, n1=100, n2=90):
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType

        k = _kernel(rng, n)
        keys = [f"F{i}@I{i}" for i in range(n)]
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        g = el @ rng.normal(size=n)
        y1_full = g * np.sqrt(0.5) + rng.normal(size=n) * np.sqrt(0.5)
        y2_full = g * np.sqrt(0.5) + rng.normal(size=n) * np.sqrt(0.5)
        # trait 1 observes the first n1 individuals, trait 2 the last n2
        keys1, keys2 = keys[:n1], keys[n - n2 :]
        idx1, idx2 = np.arange(n1), np.arange(n - n2, n)
        kern = Kernel(
            name="GRM", type=KernelType.GRM, individual_keys=keys,
            matrix=jnp.asarray(k),
        )
        p1 = Phenotype(keys=keys1, values=y1_full[idx1], column=1)
        p2 = Phenotype(keys=keys2, values=y2_full[idx2], column=2)
        return k, keys, idx1, idx2, kern, p1, p2

    def test_quantities_match_bruteforce(self, rng):
        from dissect_tpu.reml.multi import MultiREML
        from tests.test_reml import _numpy_reml_quantities

        k, keys, idx1, idx2, kern, p1, p2 = self._setup(rng)
        driver = MultiREML([kern], [p1, p2])
        assert not driver.uniform
        n1, n2 = len(idx1), len(idx2)
        engine_model = None
        # build quantities at an arbitrary theta through the engine
        from dissect_tpu.reml.engine import REMLEngine

        # run compute() once to construct the model, then grab quantities
        out = driver.compute(compute_blue=False)
        engine = driver.engine
        names = driver.model.variance_names()
        theta = np.array([0.5, 0.4, 0.15, 0.6, 0.55, 0.1])
        assert names == [
            "Var(GRM_p1)", "Var(GRM_p2)", "Covar(GRM_p1-2)",
            "Var(E_p1)", "Var(E_p2)", "Covar(E_p1-2)",
        ]
        q = engine._quantities(jnp.asarray(theta))

        # brute-force block matrices
        k11 = k[np.ix_(idx1, idx1)]
        k22 = k[np.ix_(idx2, idx2)]
        k12 = k[np.ix_(idx1, idx2)]
        z12 = np.zeros((n1, n2))
        e12 = np.zeros((n1, n2))
        for a, gi in enumerate(idx1):
            hits = np.nonzero(idx2 == gi)[0]
            if hits.size:
                e12[a, hits[0]] = 1.0
        mats = [
            np.block([[k11, z12], [z12.T, np.zeros((n2, n2))]]),
            np.block([[np.zeros((n1, n1)), z12], [z12.T, k22]]),
            np.block([[np.zeros((n1, n1)), k12], [k12.T, np.zeros((n2, n2))]]),
            np.block([[np.eye(n1), z12], [z12.T, np.zeros((n2, n2))]]),
            np.block([[np.zeros((n1, n1)), z12], [z12.T, np.eye(n2)]]),
            np.block([[np.zeros((n1, n1)), e12], [e12.T, np.zeros((n2, n2))]]),
        ]
        ref = _numpy_reml_quantities(theta, mats, driver.y, driver.x)
        np.testing.assert_allclose(np.asarray(q["grad"]), ref["grad"], rtol=1e-7)
        np.testing.assert_allclose(np.asarray(q["ai"]), ref["ai"], rtol=1e-7)
        logl = -0.5 * (
            float(q["logdet_v"]) + float(q["logdet_xtvix"]) + float(q["ytpy"])
        )
        assert logl == pytest.approx(ref["logl"], rel=1e-10)

    def test_fit_converges_and_recovers_signal(self, rng):
        from dissect_tpu.reml.multi import MultiREML

        k, keys, idx1, idx2, kern, p1, p2 = self._setup(rng, n=300, n1=250, n2=220)
        driver = MultiREML([kern], [p1, p2])
        out = driver.compute(compute_blue=True)
        assert out.result.success
        # genetic correlation should be strongly positive (true rg = 1)
        rg = next(r.value for r in out.correlations if "Cor(GRM" in r.name)
        assert rg > 0.3
        assert out.blue is not None

    def test_no_overlap_drops_env_covariance(self, rng):
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.reml.multi import MultiREML

        n = 80
        k = _kernel(rng, n)
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = Kernel(name="GRM", type=KernelType.GRM, individual_keys=keys,
                      matrix=jnp.asarray(k))
        y = rng.normal(size=n)
        p1 = Phenotype(keys=keys[:40], values=y[:40], column=1)
        p2 = Phenotype(keys=keys[40:], values=y[40:], column=2)
        driver = MultiREML([kern], [p1, p2])
        driver.compute(compute_blue=False)
        # disjoint cohorts: no environmental covariance parameter
        assert "Covar(E_p1-2)" not in driver.model.variance_names()
        assert "Covar(GRM_p1-2)" in driver.model.variance_names()
