"""GWAS (OLS + mixed-model) and PCA tests against direct solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_dosage


def _sim_gwas(rng, n=120, m=50, h2=0.5):
    dosage = make_dosage(rng, m, n)
    obs = (dosage >= 0).astype(float)
    p2 = dosage.sum(1) / (2 * n)
    std = np.sqrt(2 * p2 * (1 - p2))
    z = (dosage - 2 * p2[:, None]) / std[:, None]
    k = z.T @ z / m
    causal = rng.normal(size=m) * np.sqrt(h2 / m)
    g = z.T @ causal
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    y = x @ [0.5, 0.2] + g + rng.normal(size=n) * np.sqrt(1 - h2)
    return dosage, z, k, x, y


class TestOlsGwas:
    def test_matches_per_snp_lstsq(self, rng):
        from dissect_tpu.gwas.ols import ols_gwas
        from dissect_tpu.runtime.stats import t_sf

        dosage, z, k, x, y = _sim_gwas(rng)
        res = ols_gwas(z, y, x)
        m, n = z.shape
        c = x.shape[1]
        for s in [0, 7, 23, m - 1]:
            xg = np.column_stack([x, z[s]])
            xtx_i = np.linalg.inv(xg.T @ xg)
            b = xtx_i @ (xg.T @ y)
            sse = y @ y - b @ (xg.T @ y)
            mse = sse / (n - c - 1)
            se = np.sqrt(mse * np.diag(xtx_i))
            assert res.snp_beta[s] == pytest.approx(b[-1], rel=1e-8)
            assert res.snp_se[s] == pytest.approx(se[-1], rel=1e-8)
            assert res.cov_beta[s, 0] == pytest.approx(b[0], rel=1e-7, abs=1e-10)
            assert res.cov_se[s, 1] == pytest.approx(se[1], rel=1e-8)
            t = b[-1] / se[-1]
            assert res.snp_p[s] == pytest.approx(
                2 * t_sf(n - c - 1, abs(t)), rel=1e-8
            )


class TestMlmGwas:
    def test_fixed_v_matches_per_snp_gls(self, rng):
        from dissect_tpu.gwas.mlm import mlm_gwas_fixed_v

        dosage, z, k, x, y = _sim_gwas(rng)
        n = len(y)
        v = 0.5 * k + 0.5 * np.eye(n)
        vi = np.linalg.inv(v)
        res = mlm_gwas_fixed_v(z, y, x, vi)
        for s in [0, 11, 31]:
            xg = np.column_stack([x, z[s]])
            a_inv = np.linalg.inv(xg.T @ vi @ xg)
            b = a_inv @ (xg.T @ vi @ y)
            assert res.snp_beta[s] == pytest.approx(b[-1], rel=1e-8)
            assert res.snp_se[s] == pytest.approx(
                np.sqrt(a_inv[-1, -1]), rel=1e-8
            )

    def test_ml_refit_matches_dense_ml(self, rng):
        """The vmapped diagonal ML refit must agree with a dense-space
        ML fit of the same model for a single SNP."""
        from dissect_tpu.gwas.mlm import mlm_gwas_ml_refit

        dosage, z, k, x, y = _sim_gwas(rng, n=80, m=30)
        n = len(y)
        w, u = np.linalg.eigh(k)
        res = mlm_gwas_ml_refit(
            z, y, x, w, u, null_variances=(0.5, 0.5), n_iterations=40
        )
        # dense-space reference for SNP 5: profile-ML Newton on (t1,t2)
        s = 5
        xg = np.column_stack([x, z[s]])
        theta = np.array([0.5, 0.5])
        for _ in range(200):
            v = theta[0] * k + theta[1] * np.eye(n)
            vi = np.linalg.inv(v)
            a_inv = np.linalg.inv(xg.T @ vi @ xg)
            b = a_inv @ (xg.T @ vi @ y)
            r = y - xg @ b
            pyr = vi @ r
            grad = 0.5 * np.array(
                [
                    pyr @ k @ pyr - np.trace(vi @ k),
                    pyr @ pyr - np.trace(vi),
                ]
            )
            f = 0.5 * np.array(
                [
                    [np.trace(vi @ k @ vi @ k), np.trace(vi @ k @ vi)],
                    [np.trace(vi @ k @ vi), np.trace(vi @ vi)],
                ]
            )
            step = np.linalg.solve(f, grad)
            theta = np.maximum(theta + step, 1e-6)
            if np.abs(step).max() < 1e-12:
                break
        v = theta[0] * k + theta[1] * np.eye(n)
        vi = np.linalg.inv(v)
        a_inv = np.linalg.inv(xg.T @ vi @ xg)
        b = a_inv @ (xg.T @ vi @ y)
        assert res.snp_beta[s] == pytest.approx(b[-1], rel=1e-6)
        assert res.snp_se[s] == pytest.approx(np.sqrt(a_inv[-1, -1]), rel=1e-6)

    def test_null_snps_uniform_p(self, rng):
        """Null SNPs should not be systematically significant."""
        from dissect_tpu.gwas.mlm import mlm_gwas_fixed_v

        n, m = 150, 100
        dosage = make_dosage(rng, m, n)
        p2 = dosage.sum(1) / (2 * n)
        z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
        y = rng.normal(size=n)  # pure noise
        x = np.ones((n, 1))
        res = mlm_gwas_fixed_v(z, y, x, np.eye(n))
        assert 0.2 < np.mean(res.snp_p) < 0.8
        assert (res.snp_p < 0.01).mean() < 0.1


class TestPca:
    def test_pca_matches_numpy(self, rng):
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.pca.pca import compute_pca

        n = 50
        a = rng.normal(size=(n, n))
        k = a @ a.T / n
        kern = Kernel(
            name="GRM",
            type=KernelType.GRM,
            individual_keys=[f"F{i}@I{i}" for i in range(n)],
            matrix=jnp.asarray(k),
        )
        w_ref, v_ref = np.linalg.eigh(k)
        pca = compute_pca(kern, n_components=4)  # randomized path (4*8 < 50)
        np.testing.assert_allclose(pca.eigenvalues, w_ref[::-1][:4], rtol=1e-7)
        pca_full = compute_pca(kern, n_components=20, randomized=False)
        np.testing.assert_allclose(
            pca_full.eigenvalues, w_ref[::-1][:20], rtol=1e-9
        )
        # eigenvector directions match up to sign
        for i in range(4):
            dot = abs(pca.eigenvectors[:, i] @ v_ref[:, n - 1 - i])
            assert dot == pytest.approx(1.0, abs=1e-5)

    def test_pca_write(self, tmp_path, rng):
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.pca.pca import compute_pca

        n = 12
        a = rng.normal(size=(n, n))
        kern = Kernel(
            name="GRM",
            type=KernelType.GRM,
            individual_keys=[f"F{i}@I{i}" for i in range(n)],
            matrix=jnp.asarray(a @ a.T),
        )
        pca = compute_pca(kern, n_components=3, randomized=False)
        pca.write(str(tmp_path / "out"))
        lines = (tmp_path / "out.pca.eigenvectors").read_text().splitlines()
        assert len(lines) == n
        assert lines[0].split()[:2] == ["F0", "I0"]
        ev = (tmp_path / "out.pca.eigenvalues").read_text().splitlines()
        assert len(ev) == n  # full spectrum, no header (pca.cpp:85-90)
        vals = [float(l) for l in ev]
        assert vals == sorted(vals, reverse=True)


class TestChunkedGwas:
    def test_chunked_matches_single_dispatch(self, rng):
        from dissect_tpu.analysis.dispatcher import _chunked_gwas
        from dissect_tpu.gwas.ols import ols_gwas

        dosage, z, k, x, y = _sim_gwas(rng, n=80, m=50)
        full = ols_gwas(z, y, x)
        chunked = _chunked_gwas(lambda zc: ols_gwas(zc, y, x), z, chunk=16)
        np.testing.assert_allclose(chunked.snp_beta, full.snp_beta, rtol=1e-12)
        np.testing.assert_allclose(chunked.snp_p, full.snp_p, rtol=1e-10)
        np.testing.assert_allclose(chunked.cov_se, full.cov_se, rtol=1e-12)
