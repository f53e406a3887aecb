"""Tests: fixed-correlation refit, HetVector, filter-matrix, add-grms."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


class TestFixedCorrelation:
    def test_lrt_on_strong_correlation(self, rng):
        from dissect_tpu.io.phenotype import Phenotype
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.reml.multi import MultiREML

        n = 300
        m = 4 * n
        z = rng.normal(size=(m, n))
        k = z.T @ z / m
        keys = [f"F{i}@I{i}" for i in range(n)]
        el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
        g = el @ rng.normal(size=n)  # fully shared genetics: rg = 1
        y1 = g * np.sqrt(0.6) + rng.normal(size=n) * np.sqrt(0.4)
        y2 = g * np.sqrt(0.6) + rng.normal(size=n) * np.sqrt(0.4)
        kern = Kernel(name="GRM", type=KernelType.GRM, individual_keys=keys,
                      matrix=jnp.asarray(k))
        driver = MultiREML(
            [kern],
            [Phenotype(keys=keys, values=y1, column=1),
             Phenotype(keys=keys, values=y2, column=2)],
        )
        full = driver.compute(compute_blue=False)
        assert full.result.success
        # fixing rg = 0 must be strongly rejected when true rg = 1
        _, lrt0 = driver.compute_with_fixed_correlation("GRM", 0.0, full_output=full)
        assert lrt0["converged"]
        assert lrt0["p_value"] < 0.01
        # fixing rg = 1 (the truth) should NOT be rejected
        _, lrt1 = driver.compute_with_fixed_correlation("GRM", 1.0, full_output=full)
        assert lrt1["converged"]
        assert lrt1["p_value"] > 0.01


class TestHetVector:
    def test_alignment(self, tmp_path, rng):
        from dissect_tpu.io.covariate import read_covariates
        from dissect_tpu.io.hetvector import HetVector

        dosage = make_dosage(rng, 10, 6)
        _, data = make_plink(tmp_path, dosage)
        qc = tmp_path / "q.txt"
        with open(qc, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {float(i)}\n")
        cov = read_covariates(quantitative_path=str(qc))
        hv = HetVector()
        hv.insert("geno", data)
        hv.insert("covar", cov)
        keys = data.individual_keys[::-1][:4]
        g = hv.matrix_for("geno", keys)
        c = hv.matrix_for("covar", keys)
        assert g.shape == (4, 10)
        assert c.shape == (4, 2)
        # covariate column reflects the reversed order
        np.testing.assert_allclose(c[:, 1], [5.0, 4.0, 3.0, 2.0])


class TestFilterMatrixCli:
    def test_filter(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main
        from dissect_tpu.io.labeled_matrix import LabeledMatrix

        lm = LabeledMatrix(
            ["r1", "r2", "r3"], ["c1", "c2"], rng.normal(size=(3, 2))
        )
        lm.save(str(tmp_path / "in"))
        (tmp_path / "rows.txt").write_text("r3\nr1\n")
        (tmp_path / "cols.txt").write_text("c2\n")
        main([
            "--filter-matrix", "--imatrix", str(tmp_path / "in"),
            "--row-labels", str(tmp_path / "rows.txt"),
            "--col-labels", str(tmp_path / "cols.txt"),
            "--out", str(tmp_path / "out"),
        ])
        out = LabeledMatrix.load(str(tmp_path / "out"))
        assert out.row_labels == ["r3", "r1"]
        assert out.col_labels == ["c2"]
        assert out.values[0, 0] == pytest.approx(lm.values[2, 1])


class TestAddGrmsCli:
    def test_sum(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main
        from dissect_tpu.io import grm_io
        from dissect_tpu.model.kernels import grm_from_plink

        n = 20
        d1 = make_dosage(rng, 30, n)
        d2 = make_dosage(rng, 40, n)
        _, data1 = make_plink(tmp_path, d1, prefix="a")
        _, data2 = make_plink(tmp_path, d2, prefix="b")
        # rename b's snps to avoid collision
        for i, s in enumerate(data2.snps):
            s.name = f"bsnp{i}"
        k1 = grm_from_plink(data1, dtype=jnp.float64)
        k2 = grm_from_plink(data2, dtype=jnp.float64)
        grm_io.write_grm(str(tmp_path / "g1"), np.asarray(k1.matrix),
                         np.asarray(k1.counts), k1.individual_keys, k1.snp_names)
        grm_io.write_grm(str(tmp_path / "g2"), np.asarray(k2.matrix),
                         np.asarray(k2.counts), k2.individual_keys, k2.snp_names)
        (tmp_path / "list.txt").write_text(
            f"{tmp_path / 'g1'}\n{tmp_path / 'g2'}\n"
        )
        main([
            "--add-grms", "--grm-list", str(tmp_path / "list.txt"),
            "--out", str(tmp_path / "sum"),
        ])
        loaded = grm_io.read_grm(str(tmp_path / "sum"))
        expected = np.asarray(k1.add(k2).matrix)
        np.testing.assert_allclose(loaded["kernel"], expected, rtol=1e-10)
        assert len(loaded["snp_names"]) == 70


class TestCouplesKernel:
    def test_partner_resorting(self, rng):
        from dissect_tpu.model.kernels import Kernel, KernelType, couples_kernel

        n = 8
        a = rng.normal(size=(n, n))
        k = a @ a.T
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = Kernel(name="GRM", type=KernelType.GRM, individual_keys=keys,
                      matrix=jnp.asarray(k))
        # pair i with i+1 (even i)
        couples = {keys[i]: keys[i + 1] for i in range(0, n, 2)}
        coup = couples_kernel(kern, couples)
        assert coup is not None
        assert coup.name == "coupGRM"
        # labeled with the FIRST member of each couple
        assert coup.individual_keys == [keys[i] for i in range(0, n, 2)]
        # values come from the PARTNERS' relatedness
        partners = [i + 1 for i in range(0, n, 2)]
        np.testing.assert_allclose(
            np.asarray(coup.matrix), k[np.ix_(partners, partners)]
        )

    def test_too_few_couples(self, rng):
        from dissect_tpu.model.kernels import Kernel, KernelType, couples_kernel

        n = 8
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = Kernel(name="GRM", type=KernelType.GRM, individual_keys=keys,
                      matrix=jnp.asarray(np.eye(n)))
        assert couples_kernel(kern, {keys[0]: keys[1]}) is None


class TestZout:
    def test_gzipped_outputs(self, tmp_path, rng):
        import gzip

        from dissect_tpu.analysis.dispatcher import main

        n, m = 60, 80
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {rng.normal():.6g}\n")
        out = str(tmp_path / "z")
        main([
            "--reml", "--bfile", path, "--pheno", str(pheno),
            "--zout", "--out", out,
        ])
        gz = tmp_path / "z.reml.gz"
        assert gz.exists()
        content = gzip.open(gz, "rt").read()
        assert "Var(GRM)" in content
        # reset the global toggle for other tests
        from dissect_tpu.runtime.log import set_zout

        set_zout(False)


class TestGroupedGwasCli:
    def test_group_file_workflow(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        n, m = 100, 40
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {rng.normal():.6g}\n")
        groups = tmp_path / "groups.txt"
        with open(groups, "w") as fh:
            for i, s in enumerate(data.snps):
                fh.write(f"{s.name} g{i % 4}\n")
        out = str(tmp_path / "gg")
        main([
            "--gwas", "--bfile", path, "--pheno", str(pheno),
            "--groups", str(groups), "--group-effects", "--group-var",
            "--out", out,
        ])
        lines = (tmp_path / "gg.multi.gwas.snps").read_text().splitlines()
        # GROUPVAR column gated on --group-var (computeGroupVariance,
        # options.cpp:853-857), not on --group-effects
        assert lines[0].split()[-2:] == ["GROUPPV", "GROUPVAR"]
        assert len(lines) == m + 1
        assert (tmp_path / "gg.effects.dat").exists()

    def test_group_all(self, tmp_path, rng):
        from dissect_tpu.analysis.dispatcher import main

        n, m = 120, 20
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        pheno = tmp_path / "p.txt"
        with open(pheno, "w") as fh:
            for i, ind in enumerate(data.individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} {rng.normal():.6g}\n")
        out = str(tmp_path / "ga")
        main([
            "--gwas", "--bfile", path, "--pheno", str(pheno),
            "--group-all", "--out", out,
        ])
        lines = (tmp_path / "ga.multi.gwas.snps").read_text().splitlines()
        assert {l.split()[0] for l in lines[1:]} == {"all"}


class TestMakeGrmMostRelated:
    def test_mr_subset_and_prune_report(self, tmp_path, rng):
        """--make-grm-mr (makeGRMAndStoreMostRelated,
        analysis.cpp:113-135): full GRM + .mostRelated subset with
        relatedness outside the band, and per-cutoff prune counts."""
        from dissect_tpu.analysis.dispatcher import main
        from dissect_tpu.io.grm_io import read_grm
        from dissect_tpu.runtime.mesh import set_mesh_context

        n, m = 70, 50
        dosage = make_dosage(rng, m, n)
        path, data = make_plink(tmp_path, dosage)
        out = str(tmp_path / "mr")
        try:
            main([
                "--make-grm-mr", "--bfile", path, "--out", out,
                "--mostr-lower-thr", "-0.2", "--mostr-upper-thr", "0.2",
                "--cutoff-thrs", "0.9", "0.5",
            ])
        finally:
            set_mesh_context(None)
        full = read_grm(out)
        mr = read_grm(out + ".mostRelated")
        k = np.asarray(full["kernel"])
        off = k.copy()
        np.fill_diagonal(off, 0.0)
        expect = ((off < -0.2) | (off > 0.2)).any(axis=1)
        kept = [full["individual_keys"][i] for i in range(n) if expect[i]]
        assert mr["individual_keys"] == kept
        log = (tmp_path / "mr.log").read_text()
        assert "when cutoff is 0.9" in log and "when cutoff is 0.5" in log
