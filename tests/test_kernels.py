"""Kernel layer tests: GRM build, transforms, filtering, diagonalization."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


def numpy_grm(dosage):
    """Reference computation: normalized GRM with per-pair SNP counts."""
    obs = (dosage >= 0).astype(float)
    nobs = obs.sum(1)
    p2 = np.where(dosage >= 0, dosage, 0).sum(1) / (2 * nobs)
    std = np.sqrt(2 * p2 * (1 - p2))
    z = obs * (dosage - 2 * p2[:, None]) / std[:, None]
    counts = obs.T @ obs
    return (z.T @ z) / counts, counts


class TestGrm:
    def test_grm_matches_reference_formula(self, tmp_path, rng):
        from dissect_tpu.model.kernels import grm_from_plink

        dosage = make_dosage(rng, 60, 20, missing_rate=0.07)
        _, data = make_plink(tmp_path, dosage)
        kern = grm_from_plink(data, chunk_size=17, dtype=jnp.float64)
        k_ref, c_ref = numpy_grm(dosage)
        np.testing.assert_allclose(np.asarray(kern.matrix), k_ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(kern.counts), c_ref, rtol=1e-12)
        assert kern.individual_keys == data.individual_keys
        assert kern.snp_names == data.snp_names

    def test_flat_normalization(self, tmp_path, rng):
        from dissect_tpu.model.kernels import grm_from_plink

        dosage = make_dosage(rng, 30, 15)
        _, data = make_plink(tmp_path, dosage)
        kern = grm_from_plink(data, dtype=jnp.float64, flat_normalization=True)
        k_ref, _ = numpy_grm(dosage)  # no missing -> same counts everywhere
        np.testing.assert_allclose(np.asarray(kern.matrix), k_ref, rtol=1e-10)

    def test_monomorphic_rejected(self, tmp_path, rng):
        from dissect_tpu.model.kernels import grm_from_plink

        dosage = make_dosage(rng, 10, 12)
        dosage[3] = 1  # constant heterozygote is fine; make all same hom:
        dosage[3] = 0
        _, data = make_plink(tmp_path, dosage)
        with pytest.raises(ValueError, match="monomorphic"):
            grm_from_plink(data, dtype=jnp.float64)


class TestKernelOps:
    def _kernel(self, rng, n=10):
        from dissect_tpu.model.kernels import Kernel, KernelType

        a = rng.normal(size=(n, n))
        k = a @ a.T / n
        return Kernel(
            name="GRM",
            type=KernelType.GRM,
            individual_keys=[f"F{i}@I{i}" for i in range(n)],
            matrix=jnp.asarray(k),
            counts=jnp.full((n, n), 50.0),
        )

    def test_epistatic(self, rng):
        kern = self._kernel(rng)
        epi = kern.epistatic()
        np.testing.assert_allclose(
            np.asarray(epi.matrix), np.asarray(kern.matrix) ** 2
        )

    def test_filter_and_interaction(self, rng):
        kern = self._kernel(rng)
        sub = kern.filter_individuals(kern.individual_keys[2:6])
        np.testing.assert_allclose(
            np.asarray(sub.matrix), np.asarray(kern.matrix)[2:6, 2:6]
        )
        inter = kern.interaction(sub)
        np.testing.assert_allclose(
            np.asarray(inter.matrix), np.asarray(sub.matrix) ** 2
        )

    def test_diagonalize_roundtrip(self, rng):
        kern = self._kernel(rng)
        diag = kern.diagonalize()
        assert diag.diagonalized
        np.testing.assert_allclose(
            np.asarray(diag.dense()), np.asarray(kern.matrix), rtol=1e-8, atol=1e-10
        )

    def test_add_grms(self, rng):
        from dissect_tpu.model.kernels import Kernel

        k1 = self._kernel(rng)
        k2 = self._kernel(rng)
        k2.name = "GRM2"
        total = k1.add(k2)
        expected = (
            np.asarray(k1.matrix) * 50 + np.asarray(k2.matrix) * 50
        ) / 100.0
        np.testing.assert_allclose(np.asarray(total.matrix), expected, rtol=1e-12)
        back = total.add(k2, subtract=True)
        np.testing.assert_allclose(
            np.asarray(back.matrix), np.asarray(k1.matrix), rtol=1e-10
        )

    def test_prune(self, rng):
        kern = self._kernel(rng)
        m = np.asarray(kern.matrix)
        m = m / np.outer(np.sqrt(np.diag(m)), np.sqrt(np.diag(m)))  # corr-like
        m[0, 1] = m[1, 0] = 0.99
        kern.matrix = jnp.asarray(m)
        pruned = kern.prune(0.9)
        assert pruned.n == kern.n - 1
        keys = set(pruned.individual_keys)
        assert not ("F0@I0" in keys and "F1@I1" in keys)

    def test_discrete_kernel(self):
        from dissect_tpu.model.kernels import kernel_from_discrete

        kern = kernel_from_discrete("D", ["a@1", "b@2", "c@3"], ["x", "y", "x"])
        np.testing.assert_allclose(
            np.asarray(kern.matrix), [[1, 0, 1], [0, 1, 0], [1, 0, 1]]
        )
