"""REML engine tests: analytic identities, dense/diagonal agreement,
end-to-end variance recovery (single- and multi-trait)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_dosage


def _sim_kernel(rng, n):
    """A PSD 'GRM-like' kernel with unit-ish diagonal."""
    m = 4 * n
    z = rng.normal(size=(m, n))
    k = z.T @ z / m
    return k


def _numpy_reml_quantities(theta, mats, y, x):
    """Brute-force REML quantities for V = sum theta_i mats_i."""
    v = sum(t * m for t, m in zip(theta, mats))
    vi = np.linalg.inv(v)
    vix = vi @ x
    xtvix = x.T @ vix
    xtvix_i = np.linalg.inv(xtvix)
    p = vi - vix @ xtvix_i @ vix.T
    py = p @ y
    grad = np.array(
        [0.5 * (y @ p @ m @ py - np.trace(p @ m)) for m in mats]
    )
    ai = np.array(
        [[0.5 * (py @ mi @ p @ mj @ py) for mj in mats] for mi in mats]
    )
    logl = -0.5 * (
        np.linalg.slogdet(v)[1] + np.linalg.slogdet(xtvix)[1] + y @ py
    )
    return {"grad": grad, "ai": ai, "logl": logl, "p": p, "py": py}


@pytest.fixture
def small_problem(rng):
    n = 40
    k = _sim_kernel(rng, n)
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    u = np.linalg.cholesky(k + 1e-8 * np.eye(n)) @ rng.normal(size=n)
    y = x @ [1.0, 0.5] + u * np.sqrt(0.6) + rng.normal(size=n) * np.sqrt(0.4)
    return k, x, y


class TestQuantities:
    def test_gradient_ai_match_bruteforce(self, small_problem):
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine, REMLOptions

        k, x, y = small_problem
        n = len(y)
        model = build_variance_model([k], ["GRM"], [1.0], [0.5])
        engine = REMLEngine(model, y, x, REMLOptions())
        theta = np.array([0.55, 0.45])
        q = engine._quantities(jnp.asarray(theta))
        ref = _numpy_reml_quantities(theta, [k, np.eye(n)], y, x)
        np.testing.assert_allclose(np.asarray(q["grad"]), ref["grad"], rtol=1e-8)
        np.testing.assert_allclose(np.asarray(q["ai"]), ref["ai"], rtol=1e-8)
        logl = -0.5 * (
            float(q["logdet_v"]) + float(q["logdet_xtvix"]) + float(q["ytpy"])
        )
        assert logl == pytest.approx(ref["logl"], rel=1e-10)

    def test_gradient_is_logl_derivative(self, small_problem):
        """The REML gradient must equal the numerical dlogL/dtheta."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine

        k, x, y = small_problem
        model = build_variance_model([k], ["GRM"], [1.0], [0.5])
        engine = REMLEngine(model, y, x)
        theta = np.array([0.5, 0.5])

        def logl(t):
            q = engine._quantities(jnp.asarray(t))
            return -0.5 * (
                float(q["logdet_v"]) + float(q["logdet_xtvix"]) + float(q["ytpy"])
            )

        q = engine._quantities(jnp.asarray(theta))
        eps = 1e-6
        for i in range(2):
            tp, tm = theta.copy(), theta.copy()
            tp[i] += eps
            tm[i] -= eps
            num = (logl(tp) - logl(tm)) / (2 * eps)
            assert float(q["grad"][i]) == pytest.approx(num, rel=1e-5)

    def test_dense_vs_diagonal_path(self, small_problem):
        """Rotating into the kernel eigenbasis must preserve all REML
        quantities (the diagonalization fast path, reml.cpp:480-545)."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine

        k, x, y = small_problem
        w, u = np.linalg.eigh(k)
        model_dense = build_variance_model([k], ["GRM"], [1.0], [0.5])
        model_diag = build_variance_model(
            [w], ["GRM"], [1.0], [0.5], diagonal=True
        )
        dense = REMLEngine(model_dense, y, x)
        diag = REMLEngine(model_diag, u.T @ y, u.T @ x)
        theta = np.array([0.6, 0.4])
        qd = dense._quantities(jnp.asarray(theta))
        qg = diag._quantities(jnp.asarray(theta))
        for key in ("logdet_v", "logdet_xtvix", "ytpy"):
            assert float(qd[key]) == pytest.approx(float(qg[key]), rel=1e-9)
        np.testing.assert_allclose(
            np.asarray(qd["grad"]), np.asarray(qg["grad"]), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(qd["ai"]), np.asarray(qg["ai"]), rtol=1e-7
        )


class TestSingleTraitFit:
    def test_h2_recovery(self, rng):
        """Simulate a strong-signal cohort and recover h2."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine

        n = 500
        k = _sim_kernel(rng, n)
        x = np.ones((n, 1))
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        h2_true = 0.6
        y = (
            el @ rng.normal(size=n) * np.sqrt(h2_true)
            + rng.normal(size=n) * np.sqrt(1 - h2_true)
        )
        model = build_variance_model([k], ["GRM"], [np.var(y, ddof=1)], [0.5])
        engine = REMLEngine(model, y, x)
        result = engine.fit()
        assert result.success
        vg = result.variance("Var(GRM)")
        ve = result.variance("Var(E)")
        h2 = vg / (vg + ve)
        # sampling error at n=500 is sizable; just require the right region
        assert 0.35 < h2 < 0.85
        assert result.std_error("Var(GRM)") > 0

    def test_fit_matches_scipy_maximum(self, small_problem):
        """The REML optimum must zero the gradient."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine, REMLOptions

        k, x, y = small_problem
        model = build_variance_model([k], ["GRM"], [np.var(y, ddof=1)], [0.5])
        engine = REMLEngine(model, y, x, REMLOptions())
        result = engine.fit()
        assert result.success
        q = engine._quantities(jnp.asarray(result.variances))
        np.testing.assert_allclose(np.asarray(q["grad"]), 0.0, atol=5e-3)

    def test_single_reml_driver(self, rng, tmp_path):
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.reml.single import SingleREML

        n = 200
        k = _sim_kernel(rng, n)
        keys = [f"F{i}@I{i}" for i in range(n)]
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        y = el @ rng.normal(size=n) * 0.8 + rng.normal(size=n) * 0.6
        kern = Kernel(
            name="GRM",
            type=KernelType.GRM,
            individual_keys=keys,
            matrix=jnp.asarray(k),
        )
        # shuffled phenotype subset exercises id intersection + ordering
        order = rng.permutation(n)[: n - 10]
        pheno = Phenotype(
            keys=[keys[i] for i in order], values=y[order], column=1
        )
        driver = SingleREML([kern], pheno)
        out = driver.compute(compute_blup=True, compute_residuals=True)
        assert out.result.success
        # GRM ordering is load-bearing: individuals follow kernel order
        expected = [k for k in keys if k in set(pheno.keys)]
        assert out.individual_keys == expected
        assert out.heritabilities[-1].name == "h2"
        assert 0.0 <= out.heritabilities[-1].value <= 1.0
        assert out.blup is not None and "GRM" in out.blup
        # BLUP + residual = y - X beta (identity: u_hat + e_hat = V V^-1 (y-Xb))
        ymap = dict(zip(pheno.keys, pheno.values))
        yy = np.array([ymap[kk] for kk in expected])
        fitted = out.blup["GRM"] + out.residuals
        resid_ols = yy - np.mean(yy) * 0  # X is mean column; use blue
        np.testing.assert_allclose(
            fitted, yy - out.blue[0], rtol=1e-6, atol=1e-8
        )


class TestMultiTrait:
    def test_bivar_quantities_vs_bruteforce(self, rng):
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine

        n = 30
        k = _sim_kernel(rng, n)
        x1 = np.column_stack([np.ones(n)])
        y = rng.normal(size=2 * n)
        x = np.zeros((2 * n, 2))
        x[:n, 0] = 1
        x[n:, 1] = 1
        model = build_variance_model(
            [k], ["GRM"], [1.0, 1.0], [0.5, 0.5], n_traits=2
        )
        engine = REMLEngine(model, y, x)
        # theta order: Var(GRM_p1), Var(GRM_p2), Covar(GRM), Var(E_p1),
        # Var(E_p2), Covar(E)
        names = model.variance_names()
        assert names == [
            "Var(GRM_p1)",
            "Var(GRM_p2)",
            "Covar(GRM_p1-2)",
            "Var(E_p1)",
            "Var(E_p2)",
            "Covar(E_p1-2)",
        ]
        theta = np.array([0.5, 0.4, 0.1, 0.6, 0.7, 0.2])
        q = engine._quantities(jnp.asarray(theta))

        z = np.zeros((n, n))
        i = np.eye(n)
        mats = [
            np.block([[k, z], [z, z]]),
            np.block([[z, z], [z, k]]),
            np.block([[z, k], [k, z]]),
            np.block([[i, z], [z, z]]),
            np.block([[z, z], [z, i]]),
            np.block([[z, i], [i, z]]),
        ]
        ref = _numpy_reml_quantities(theta, mats, y, x)
        np.testing.assert_allclose(np.asarray(q["grad"]), ref["grad"], rtol=1e-7)
        np.testing.assert_allclose(np.asarray(q["ai"]), ref["ai"], rtol=1e-7)

    def test_bivar_fit_recovers_correlation(self, rng):
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.reml.multi import MultiREML

        n = 400
        k = _sim_kernel(rng, n)
        keys = [f"F{i}@I{i}" for i in range(n)]
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        rg = 0.7
        g_shared = rng.normal(size=n)
        g1 = el @ (np.sqrt(rg) * g_shared + np.sqrt(1 - rg) * rng.normal(size=n))
        g2 = el @ (np.sqrt(rg) * g_shared + np.sqrt(1 - rg) * rng.normal(size=n))
        y1 = g1 * np.sqrt(0.6) + rng.normal(size=n) * np.sqrt(0.4)
        y2 = g2 * np.sqrt(0.6) + rng.normal(size=n) * np.sqrt(0.4)
        kern = Kernel(
            name="GRM", type=KernelType.GRM, individual_keys=keys, matrix=jnp.asarray(k)
        )
        p1 = Phenotype(keys=keys, values=y1, column=1)
        p2 = Phenotype(keys=keys, values=y2, column=2)
        driver = MultiREML([kern], [p1, p2])
        out = driver.compute()
        assert out.result.success
        rg_hat = next(
            r.value for r in out.correlations if r.name == "Cor(GRM_p1-2)"
        )
        assert 0.2 < rg_hat <= 1.0


class TestFp32StallRescue:
    def test_fp32_stall_hands_off_to_f64_endgame(self, rng):
        """An fp32 fit whose AI steps limit-cycle at the precision floor
        must not fail after max_iterations: the windowed stall detector
        breaks out and the float64 endgame converges (the reference's
        precision-switch regime, reml.cpp:1673-1724).  An unreachable
        variance threshold (1e-9 in fp32) forces the stall path."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine, REMLOptions

        n = 300
        k = _sim_kernel(rng, n)
        x = np.ones((n, 1))
        u = np.linalg.cholesky(k + 1e-8 * np.eye(n)) @ rng.normal(size=n)
        y = u * np.sqrt(0.7) + rng.normal(size=n) * np.sqrt(0.3)

        model = build_variance_model([k], ["GRM"], [float(np.var(y))], [0.5])
        ref = REMLEngine(model, y, x).fit()  # float64 (x64 test env)
        assert ref.success

        opts = REMLOptions(variance_convergence_threshold=1e-9,
                           max_iterations=40)
        eng32 = REMLEngine(model, y, x, options=opts, dtype=jnp.float32)
        res = eng32.fit()
        assert res.success, res.warnings
        np.testing.assert_allclose(res.variances, ref.variances, rtol=1e-3)
        np.testing.assert_allclose(
            res.log_likelihood, ref.log_likelihood, rtol=1e-6
        )
