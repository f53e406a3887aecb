"""Tests for BGEN, GCTA gz GRM, multi-discrete kernels, group effects,
accuracy-by-SNP."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


class TestBgen:
    def test_roundtrip(self, tmp_path, rng):
        from dissect_tpu.io.bed import IndividualInfo, SnpInfo
        from dissect_tpu.io.bgen import BgenData, read_bgen, write_bgen

        n, m = 25, 12
        dosage = rng.uniform(0, 2, size=(m, n)).astype(np.float32)
        dosage[0, 3] = np.nan
        data = BgenData(
            snps=[SnpInfo("1", f"v{i}", 0.0, 100 + i, "A", "G") for i in range(m)],
            individuals=[IndividualInfo(f"s{i}", f"s{i}") for i in range(n)],
            dosages=dosage,
        )
        path = str(tmp_path / "test.bgen")
        write_bgen(path, data, bits=16)
        loaded = read_bgen(path)
        assert loaded.n_snps == m
        assert loaded.n_individuals == n
        assert [s.name for s in loaded.snps] == [s.name for s in data.snps]
        mask = ~np.isnan(dosage)
        np.testing.assert_allclose(
            loaded.dosages[mask], dosage[mask], atol=2e-4
        )
        assert np.isnan(loaded.dosages[0, 3])

    @pytest.mark.parametrize(
        "layout,compression,bits",
        [
            (1, "zlib", 16),
            (1, "none", 16),
            (2, "zstd", 16),
            (2, "none", 8),
        ],
    )
    def test_roundtrip_layouts_compressions(
        self, tmp_path, rng, layout, compression, bits
    ):
        """Layout-1 (v1.1, --bgen-l1 analog) and zstd/uncompressed
        layout-2 blocks decode to the same dosages."""
        from dissect_tpu.io.bed import IndividualInfo, SnpInfo
        from dissect_tpu.io.bgen import BgenData, read_bgen, write_bgen

        n, m = 17, 9
        dosage = rng.uniform(0, 2, size=(m, n)).astype(np.float32)
        dosage[2, 5] = np.nan
        data = BgenData(
            snps=[SnpInfo("1", f"v{i}", 0.0, 100 + i, "A", "G") for i in range(m)],
            individuals=[IndividualInfo(f"s{i}", f"s{i}") for i in range(n)],
            dosages=dosage,
        )
        path = str(tmp_path / f"test_l{layout}_{compression}.bgen")
        write_bgen(path, data, bits=bits, layout=layout, compression=compression)
        loaded = read_bgen(path)
        assert loaded.n_snps == m and loaded.n_individuals == n
        mask = ~np.isnan(dosage)
        atol = 2e-4 if bits == 16 or layout == 1 else 8e-3
        np.testing.assert_allclose(loaded.dosages[mask], dosage[mask], atol=atol)
        assert np.isnan(loaded.dosages[2, 5])

    @pytest.mark.parametrize(
        "layout,compression", [(2, "zlib"), (2, "zstd"), (1, "zlib")]
    )
    def test_native_matches_python(self, tmp_path, rng, layout, compression):
        """The OpenMP bulk decoder (native/bgen_decode.cpp) is bit-exact
        against the per-variant Python parser."""
        from dissect_tpu.io.bed import IndividualInfo, SnpInfo
        from dissect_tpu.io.bgen import BgenData, read_bgen, write_bgen
        from dissect_tpu.native import bgen_native

        if not bgen_native.available():
            pytest.skip("native BGEN decoder unavailable")
        n, m = 33, 21
        dosage = rng.uniform(0, 2, size=(m, n)).astype(np.float32)
        dosage[4, 11] = np.nan
        data = BgenData(
            snps=[SnpInfo("1", f"v{i}", 0.0, i, "A", "G") for i in range(m)],
            individuals=[IndividualInfo(f"s{i}", f"s{i}") for i in range(n)],
            dosages=dosage,
        )
        path = str(tmp_path / "nat.bgen")
        write_bgen(path, data, bits=16, layout=layout, compression=compression)
        a = read_bgen(path)
        b = read_bgen(path, native=False)
        assert a.n_snps == b.n_snps == m
        mask = ~np.isnan(b.dosages)
        np.testing.assert_array_equal(np.isnan(a.dosages), np.isnan(b.dosages))
        np.testing.assert_array_equal(a.dosages[mask], b.dosages[mask])

    def test_stats(self, tmp_path, rng):
        from dissect_tpu.io.bed import IndividualInfo, SnpInfo
        from dissect_tpu.io.bgen import BgenData

        d = np.array([[0.0, 1.0, 2.0, np.nan]], dtype=np.float32)
        data = BgenData(
            snps=[SnpInfo("1", "v0", 0.0, 1, "A", "G")],
            individuals=[IndividualInfo(f"s{i}", f"s{i}") for i in range(4)],
            dosages=d,
        )
        stats = data.stats()
        assert stats.n_nonmissing[0] == 3
        assert stats.mean[0] == pytest.approx(1.0)
        assert stats.std[0] == pytest.approx(1.0)


class TestGctaGz:
    def test_roundtrip(self, tmp_path, rng):
        from dissect_tpu.io.grm_io import read_gcta_grm_gz, write_gcta_grm_gz

        n = 8
        a = rng.normal(size=(n, n))
        k = a @ a.T
        c = np.full((n, n), 500.0)
        keys = [f"F{i}@I{i}" for i in range(n)]
        prefix = str(tmp_path / "gcta")
        write_gcta_grm_gz(prefix, k, c, keys)
        loaded = read_gcta_grm_gz(prefix)
        assert loaded["individual_keys"] == keys
        np.testing.assert_allclose(loaded["kernel"], k, rtol=1e-6)
        np.testing.assert_allclose(loaded["counts"], c)


class TestMultiDiscreteKernel:
    def test_overlap_normalization(self):
        from dissect_tpu.model.kernels import kernel_from_multi_discrete

        kern = kernel_from_multi_discrete(
            "env",
            ["a@1", "b@2", "c@3"],
            [["x", "y"], ["y"], ["z"]],
        )
        m = np.asarray(kern.matrix)
        assert m[0, 0] == pytest.approx(1.0)
        # overlap {y}: 1/sqrt(2*1)
        assert m[0, 1] == pytest.approx(1.0 / np.sqrt(2))
        assert m[0, 2] == pytest.approx(0.0)


class TestGroupEffects:
    def test_correlations_and_filtering(self, tmp_path, rng):
        from dissect_tpu.analysis.group_effects import (
            GroupEffects,
            GroupPosition,
            pca_of_labeled_matrix,
        )
        from dissect_tpu.io.labeled_matrix import LabeledMatrix

        n = 40
        base = rng.normal(size=n)
        effects = LabeledMatrix(
            [f"i{k}" for k in range(n)],
            ["g1", "g2", "g3"],
            np.column_stack([base, base + rng.normal(size=n) * 0.01, rng.normal(size=n)]),
        )
        ge = GroupEffects(effects)
        corr = ge.correlations_between_groups()
        assert corr.values[0, 1] > 0.99
        assert abs(corr.values[0, 2]) < 0.5

        positions = {
            "g1": GroupPosition("g1", "1", 0, 1000),
            "g2": GroupPosition("g2", "1", 1500, 2500),
            "g3": GroupPosition("g3", "2", 0, 1000),
        }
        filtered = ge.filter_correlated_groups(0.9, positions, min_distance=10_000)
        assert filtered.effects.col_labels == ["g1", "g3"]

        cov = ge.covariances_between_individuals()
        w, loadings = pca_of_labeled_matrix(cov, n_components=3)
        assert w[0] >= w[1] >= w[2]
        assert loadings.col_labels == ["PC1", "PC2", "PC3"]

    def test_save_load_multi(self, tmp_path, rng):
        from dissect_tpu.analysis.group_effects import GroupEffects
        from dissect_tpu.io.labeled_matrix import LabeledMatrix

        rows = [f"i{k}" for k in range(5)]
        lm1 = LabeledMatrix(rows, ["a"], rng.normal(size=(5, 1)))
        lm2 = LabeledMatrix(rows, ["b", "c"], rng.normal(size=(5, 2)))
        lm1.save(str(tmp_path / "e1"))
        lm2.save(str(tmp_path / "e2"))
        ge = GroupEffects.load([str(tmp_path / "e1"), str(tmp_path / "e2")])
        assert ge.effects.col_labels == ["a", "b", "c"]


class TestAccuracyBySnp:
    def test_loo_accuracy(self, tmp_path, rng):
        from dissect_tpu.analysis.accuracy import compute_accuracy_by_snp
        from dissect_tpu.analysis.predict import SnpEffect

        n, m = 200, 30
        dosage = make_dosage(rng, m, n)
        _, data = make_plink(tmp_path, dosage)
        true_eff = rng.normal(size=m) * 0.3
        # one adversarial "bad" SNP whose assumed effect is wrong
        bad = 5
        y = dosage.T.astype(float) @ true_eff + rng.normal(size=n) * 0.5
        effects = {}
        for i, s in enumerate(data.snps):
            eff = true_eff[i] if i != bad else -3.0 * true_eff[bad] - 2.0
            effects[s.name] = SnpEffect(name=s.name, allele=s.allele2, effect=eff)
        res = compute_accuracy_by_snp(data, effects, y)
        assert res.total_accuracy > 0.5
        # removing the corrupted SNP should IMPROVE accuracy: its
        # leave-one-out accuracy should top the list
        assert res.loo_accuracies[bad] == max(res.loo_accuracies)
        assert res.filtered_accuracy >= res.total_accuracy - 1e-12


class TestBgenPipeline:
    def _bgen_cohort(self, tmp_path, rng, n=120, m=150):
        from dissect_tpu.io.bed import IndividualInfo, SnpInfo
        from dissect_tpu.io.bgen import BgenData, write_bgen

        p = rng.uniform(0.1, 0.5, size=m)
        hard = (rng.random((m, n)) < p[:, None]).astype(float) + (
            rng.random((m, n)) < p[:, None]
        ).astype(float)
        noise = rng.uniform(-0.05, 0.05, size=(m, n))
        dosage = np.clip(hard + noise, 0, 2).astype(np.float32)
        data = BgenData(
            snps=[SnpInfo("1", f"v{i}", 0.0, 100 + i, "A", "G") for i in range(m)],
            individuals=[IndividualInfo(f"s{i}", f"s{i}") for i in range(n)],
            dosages=dosage,
        )
        path = str(tmp_path / "cohort.bgen")
        write_bgen(path, data, bits=16)
        return path, data, dosage

    def test_bgen_grm(self, tmp_path, rng):
        import jax.numpy as jnp

        from dissect_tpu.io.bgen import read_bgen
        from dissect_tpu.model.kernels import grm_from_plink

        path, data, dosage = self._bgen_cohort(tmp_path, rng)
        loaded = read_bgen(path)
        kern = grm_from_plink(loaded, dtype=jnp.float64)
        # reference: standardized empirical-dosage Gram matrix
        stats = loaded.stats()
        z = (loaded.dosages - stats.mean[:, None]) / stats.std[:, None]
        expected = z.T @ z / loaded.n_snps
        np.testing.assert_allclose(np.asarray(kern.matrix), expected, rtol=1e-6)

    def test_bgen_cli_workflows(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        path, data, dosage = self._bgen_cohort(tmp_path, rng)
        n = data.n_individuals
        stats = data.stats()
        z = (dosage - stats.mean[:, None]) / stats.std[:, None]
        y = z.T @ rng.normal(size=data.n_snps) * 0.1 + rng.normal(size=n)
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.8g}\n")
        out = str(tmp_path / "b")
        main(["--snp-stats", "--bgen", path, "--out", out])
        assert (tmp_path / "b.snpstats").exists()
        main(["--gwas", "--bgen", path, "--pheno", str(pheno), "--out", out])
        lines = (tmp_path / "b.gwas.snps").read_text().splitlines()
        assert len(lines) == data.n_snps + 1
        main(["--reml", "--bgen", path, "--pheno", str(pheno), "--out", out])
        assert (tmp_path / "b.reml").exists()
