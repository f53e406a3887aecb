"""Tests for SNP grouping, grouped/recursive GWAS, regional REML, LRTs."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


class TestGrouping:
    def test_fixed_size_respects_chromosomes(self, tmp_path, rng):
        from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo
        from dissect_tpu.io.groups import by_ordered_fixed_size

        snps = [SnpInfo("1" if i < 7 else "2", f"s{i}", 0, i, "A", "C") for i in range(10)]
        data = PlinkData(snps=snps, individuals=[IndividualInfo("F", "I")],
                         _dosage=np.zeros((10, 1), np.int8))
        groups = by_ordered_fixed_size(data, 3)
        # chrom 1 has 7 snps -> 3+3+1; chrom 2 has 3
        sizes = [len(v) for v in groups.values()]
        assert sizes == [3, 3, 1, 3]

    def test_by_position_overlap(self, rng):
        from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo
        from dissect_tpu.io.groups import by_position

        snps = [SnpInfo("1", f"s{i}", 0, 100 * i, "A", "C") for i in range(10)]
        data = PlinkData(snps=snps, individuals=[IndividualInfo("F", "I")],
                         _dosage=np.zeros((10, 1), np.int8))
        groups = by_position(data, region_size=400, overlap=200)
        # every SNP should appear in >= 1 group; overlapping SNPs in 2
        counts = {}
        for members in groups.values():
            for s in members:
                counts[s] = counts.get(s, 0) + 1
        assert set(counts) == {f"s{i}" for i in range(10)}
        assert max(counts.values()) == 2

    def test_group_file(self, tmp_path):
        from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo
        from dissect_tpu.io.groups import by_group_file

        snps = [SnpInfo("1", f"s{i}", 0, i, "A", "C") for i in range(4)]
        data = PlinkData(snps=snps, individuals=[IndividualInfo("F", "I")],
                         _dosage=np.zeros((4, 1), np.int8))
        f = tmp_path / "regions.txt"
        f.write_text("s0 A\ns1 B\ns2 A\n")
        groups = by_group_file(data, str(f))
        assert groups == {"A": ["s0", "s2"], "B": ["s1"]}


class TestGroupedGwas:
    def _problem(self, rng, n=100, m=24):
        dosage = make_dosage(rng, m, n)
        p2 = dosage.sum(1) / (2 * n)
        z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
        x = np.column_stack([np.ones(n)])
        y = z[:4].sum(0) * 0.8 + rng.normal(size=n)
        return z, x, y

    def test_matches_dense_joint_fit(self, rng):
        from collections import OrderedDict

        from dissect_tpu.gwas.grouped import grouped_gwas
        from dissect_tpu.runtime.stats import f_sf

        z, x, y = self._problem(rng)
        names = [f"s{i}" for i in range(24)]
        grouping = OrderedDict(
            [("a", names[:8]), ("b", names[8:16]), ("c", names[16:])]
        )
        results, _ = grouped_gwas(z, names, grouping, y, x)
        # reference computation for group a
        xg = np.column_stack([x, z[:8].T])
        a_inv = np.linalg.inv(xg.T @ xg)
        b = a_inv @ (xg.T @ y)
        np.testing.assert_allclose(results["a"].beta, b, rtol=1e-8)
        n, p = xg.shape
        sse = y @ y - b @ (xg.T @ y)
        mse = sse / (n - p)
        np.testing.assert_allclose(
            results["a"].se, np.sqrt(mse * np.diag(a_inv)), rtol=1e-8
        )
        # F-test vs covariates-only
        b0 = np.linalg.solve(x.T @ x, x.T @ y)
        ssr = b @ (xg.T @ y) - b0 @ (x.T @ y)
        f = (ssr / 8) / mse
        assert results["a"].f_statistic == pytest.approx(f, rel=1e-8)
        assert results["a"].f_p_value == pytest.approx(
            float(f_sf(8, n - p, f)), rel=1e-6
        )
        # group with causal SNPs should be far more significant
        assert results["a"].f_p_value < results["c"].f_p_value

    def test_dependent_snps_dropped(self, rng):
        from collections import OrderedDict

        from dissect_tpu.gwas.grouped import grouped_gwas

        z, x, y = self._problem(rng, m=10)
        z = np.vstack([z, z[0] + z[1]])  # snp10 = dependent
        names = [f"s{i}" for i in range(11)]
        grouping = OrderedDict([("a", names)])
        results, _ = grouped_gwas(z, names, grouping, y, x)
        assert "s10" in results["a"].dropped_snps or (
            set(results["a"].dropped_snps) & {"s0", "s1"}
        )
        assert len(results["a"].snp_names) == 10

    def test_recursive_finds_causal(self, rng):
        from dissect_tpu.gwas.grouped import recursive_gwas

        n, m = 400, 60
        dosage = make_dosage(rng, m, n)
        p2 = dosage.sum(1) / (2 * n)
        z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
        x = np.ones((n, 1))
        y = 2.0 * z[7] + rng.normal(size=n)  # one strong causal SNP
        names = [f"s{i}" for i in range(m)]
        significant, _ = recursive_gwas(
            z, names, y, x, group_size=20, significance_threshold=1e-6
        )
        assert "s7" in significant

    def test_flag_correlated(self, rng):
        from dissect_tpu.gwas.grouped import flag_correlated_snps

        z, x, y = self._problem(rng, m=5)
        z[1] = z[0] * 0.999 + rng.normal(size=z.shape[1]) * 1e-4
        p = np.array([1e-8, 1e-4, 0.5, 0.5, 0.5])
        flagged = flag_correlated_snps(z, [f"s{i}" for i in range(5)], p)
        assert flagged == ["s1"]


class TestReducedAndRegional:
    def test_lrt_detects_signal(self, rng):
        import jax.numpy as jnp

        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.reml.single import SingleREML

        n = 300
        m = 4 * n
        zmat = rng.normal(size=(m, n))
        k = zmat.T @ zmat / m
        keys = [f"F{i}@I{i}" for i in range(n)]
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        y = el @ rng.normal(size=n) * np.sqrt(0.7) + rng.normal(size=n) * np.sqrt(0.3)
        kern = Kernel(name="GRM", type=KernelType.GRM, individual_keys=keys,
                      matrix=jnp.asarray(k))
        pheno = Phenotype(keys=keys, values=y, column=1)
        driver = SingleREML([kern], pheno)
        full, lrts = driver.compute_with_reduced_models()
        assert full.result.success
        assert len(lrts) == 1
        assert lrts[0]["removed"] == "GRM"
        assert lrts[0]["converged"]
        assert lrts[0]["p_value"] < 0.05  # strong signal
        assert lrts[0]["lrt"] > 0

    def test_regional(self, tmp_path, rng):
        from dissect_tpu.io.groups import by_ordered_fixed_size
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.reml.regional import compute_regional

        from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo

        n, m = 200, 120
        dosage = make_dosage(rng, m, n)
        data = PlinkData(
            snps=[SnpInfo("1", f"snp{i}", 0.0, 1000 + i, "A", "C") for i in range(m)],
            individuals=[IndividualInfo(f"F{i}", f"I{i}") for i in range(n)],
            _dosage=dosage,
        )
        p2 = dosage.sum(1) / (2 * n)
        z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
        # signal concentrated in the first region
        y = z[:40].T @ rng.normal(size=40) * np.sqrt(0.6 / 40) + rng.normal(size=n) * 0.6
        pheno = Phenotype(keys=data.individual_keys, values=y, column=1)
        grouping = by_ordered_fixed_size(data, 40)
        results = compute_regional(data, grouping, pheno, test_global=False)
        assert set(results) == set(grouping)
        for group, res in results.items():
            assert res["full"].result.success
            names = res["full"].result.variance_names
            assert "Var(Global-GRM)" in names and "Var(Regional-GRM)" in names


class TestRegionalCli:
    def test_regional_reml_cli(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main
        from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo, write_plink

        n, m = 150, 90
        dosage = make_dosage(rng, m, n)
        data = PlinkData(
            snps=[SnpInfo("1", f"snp{i}", 0.0, i * 1000, "A", "C") for i in range(m)],
            individuals=[IndividualInfo(f"F{i}", f"I{i}") for i in range(n)],
            _dosage=dosage,
        )
        path = str(tmp_path / "coh")
        write_plink(path, data)
        p2 = dosage.sum(1) / (2 * n)
        z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
        y = z[:30].T @ rng.normal(size=30) * np.sqrt(0.5 / 30) + rng.normal(size=n) * 0.7
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.8g}\n")
        out = str(tmp_path / "reg")
        main([
            "--reml", "--bfile", path, "--pheno", str(pheno),
            "--region-size", "30", "--out", out,  # 30 kb = 30 SNPs/region
        ])
        regional = (tmp_path / "reg.regional").read_text().splitlines()
        assert regional[0].split()[0] == "REGION"
        assert len(regional) >= 3
        assert (tmp_path / "reg.lrt").exists()

    def test_region_vs_groups_incompatible(self):
        from dissect_tpu.runtime.options import Options, OptionsError

        with pytest.raises(OptionsError):
            Options.parse(["--reml", "--region-size", "10", "--groups", "f.txt"])


class TestCorrelatedSnpFile:
    def test_correlated_significant_written(self, tmp_path, rng):
        """storeResults removes the less-significant member of each
        highly correlated significant pair and writes
        .gwas.correlatedSNPs (gwas.cpp:391 + 1137-1152)."""
        from dissect_tpu.analysis.dispatcher import main
        from dissect_tpu.io.bed import write_plink

        n, m = 120, 12
        dosage = make_dosage(rng, m, n)
        # snp1 = near-copy of snp0 (high but not perfect correlation so
        # the joint fit keeps both columns), both very significant
        dosage[1] = dosage[0]
        flip = rng.choice(n, size=8, replace=False)
        dosage[1, flip] = rng.integers(0, 3, size=8).astype(dosage.dtype)
        _, data = make_plink(tmp_path, dosage)
        z = (dosage - dosage.mean(1, keepdims=True)).astype(np.float64)
        # BOTH correlated SNPs carry signal so both are significant in
        # the joint fit and the less significant one gets flagged
        y = 1.5 * z[0] + 1.5 * z[1] + 0.2 * rng.normal(size=n)
        with open(tmp_path / "p.txt", "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.6g}\n")
        out = str(tmp_path / "cg")
        main([
            "--gwas", "--bfile", str(tmp_path / "sim"), "--pheno",
            str(tmp_path / "p.txt"), "--group-all",
            "--significance-threshold", "1e-4",
            "--snp-corr-threshold", "0.75", "--out", out,
        ])
        path = tmp_path / "cg.gwas.correlatedSNPs"
        assert path.exists()
        flagged = path.read_text().split()
        assert len(flagged) == 1 and flagged[0] in ("snp0", "snp1")
