"""CLI-parity tests for the second wave of reference flags:
--check, --all-phenos, --phenos, --initial-h2s, --weights,
--cov-predict, --effects, --accuracy-by-snp, --bfile-grm-list,
reduced-model LRTs in plain --reml, and rgwas knobs."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


def run_cli(argv):
    from dissect_tpu.analysis.dispatcher import main

    main(argv)


@pytest.fixture
def cohort(tmp_path, rng):
    n, m = 120, 200
    dosage = make_dosage(rng, m, n)
    path, data = make_plink(tmp_path, dosage)
    p2 = dosage.sum(1) / (2 * n)
    z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
    g = z.T @ (rng.normal(size=m) * np.sqrt(0.6 / m))
    sex = rng.integers(0, 2, size=n)
    y = 1.0 + 0.5 * sex + g + rng.normal(size=n) * np.sqrt(0.4)
    y2 = 0.5 + g * 0.5 + rng.normal(size=n)
    pheno = tmp_path / "pheno.txt"
    with open(pheno, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(
                f"{ind.family_id} {ind.individual_id} {y[i]:.8g} {y2[i]:.8g}\n"
            )
    covar = tmp_path / "covar.txt"
    with open(covar, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(
                f"{ind.family_id} {ind.individual_id} "
                f"{'M' if sex[i] else 'F'}\n"
            )
    qcovar = tmp_path / "qcovar.txt"
    age = rng.uniform(30, 70, size=n)
    with open(qcovar, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(f"{ind.family_id} {ind.individual_id} {age[i]:.4g}\n")
    return dict(bfile=path, pheno=str(pheno), covar=str(covar),
                qcovar=str(qcovar), tmp=tmp_path, data=data, y=y, age=age,
                sex=sex)


class TestParseChecks:
    def test_check_runs_no_analysis(self, cohort):
        out = str(cohort["tmp"] / "chk")
        run_cli(["--check", "--out", out])
        assert "no analysis run" in (cohort["tmp"] / "chk.log").read_text()

    def test_initial_h2_conflict(self, cohort):
        from dissect_tpu.runtime.options import Options, OptionsError

        with pytest.raises(OptionsError):
            Options.parse(["--reml", "--initial-h2", "0.4",
                           "--initial-h2s", "0.3", "0.5"])

    def test_pheno_phenos_conflict(self, cohort):
        from dissect_tpu.runtime.options import Options, OptionsError

        with pytest.raises(OptionsError):
            Options.parse(["--reml", "--pheno", "a", "--phenos", "b", "c"])


class TestAllPhenos:
    def test_reml_loops_over_columns(self, cohort):
        out = str(cohort["tmp"] / "ap")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--all-phenos", "--out", out,
        ])
        assert (cohort["tmp"] / "ap.1.reml").exists()
        assert (cohort["tmp"] / "ap.2.reml").exists()


class TestWeights:
    def test_uniform_weights_match_unweighted(self, cohort):
        wfile = cohort["tmp"] / "w.txt"
        with open(wfile, "w") as fh:
            for ind in cohort["data"].individuals:
                fh.write(f"{ind.family_id} {ind.individual_id} 1.0\n")
        out1 = str(cohort["tmp"] / "wa")
        out2 = str(cohort["tmp"] / "wb")
        base = ["--reml", "--bfile", cohort["bfile"], "--pheno",
                cohort["pheno"]]
        run_cli(base + ["--out", out1])
        run_cli(base + ["--weights", str(wfile), "--out", out2])

        def var_grm(path):
            for line in open(path):
                if line.startswith("Var(GRM) "):
                    return float(line.split()[1])

        assert var_grm(out1 + ".reml") == pytest.approx(
            var_grm(out2 + ".reml"), rel=1e-6
        )

    def test_nonuniform_weights_change_fit(self, cohort):
        wfile = cohort["tmp"] / "w2.txt"
        rng = np.random.default_rng(5)
        with open(wfile, "w") as fh:
            for ind in cohort["data"].individuals:
                fh.write(
                    f"{ind.family_id} {ind.individual_id} "
                    f"{rng.uniform(0.5, 2.0):.6g}\n"
                )
        out = str(cohort["tmp"] / "wc")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--weights", str(wfile), "--out", out,
        ])
        assert "Var(GRM)" in (cohort["tmp"] / "wc.reml").read_text()


class TestCovPredict:
    def test_blue_roundtrip(self, cohort):
        # fit BLUEs, then predict the covariate contribution from them
        out = str(cohort["tmp"] / "cp")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--covar", cohort["covar"], "--qcovar", cohort["qcovar"],
            "--blue", "--out", out,
        ])
        pred = str(cohort["tmp"] / "cpred")
        run_cli([
            "--cov-predict", "--covar", cohort["covar"],
            "--qcovar", cohort["qcovar"],
            "--covar-effects", out + ".blue.discrete",
            "--qcovar-effects", out + ".blue.quantitative",
            "--out", pred,
        ])
        lines = (cohort["tmp"] / "cpred.covars.predicted.phenos").read_text().splitlines()
        assert lines[0] == "FID IID CPHENO"
        assert len(lines) == 1 + len(cohort["data"].individuals)
        # discrete effect of being M + age * beta_age must differ by sex
        vals = {l.split()[1]: float(l.split()[2]) for l in lines[1:]}
        # correlation between predicted covariate phenos and sex/age combo
        beta = {}
        for line in open(out + ".blue.discrete"):
            if not line.startswith("NAME"):
                beta[line.split()[0]] = float(line.split()[1])
        ids = [ind.individual_id for ind in cohort["data"].individuals]
        pred_vec = np.array([vals[i] for i in ids])
        assert np.std(pred_vec) > 0

    def test_unestimated_key_errors(self, cohort, tmp_path):
        eff = tmp_path / "eff.txt"
        eff.write_text("NAME BETA STD\ndiscrete_1_Z 0.5 0.1\n")
        with pytest.raises(ValueError):
            run_cli([
                "--cov-predict", "--covar", cohort["covar"],
                "--covar-effects", str(eff), "--out", str(tmp_path / "x"),
            ])


class TestGroupEffectsAnalysis:
    def _effects_fixture(self, tmp_path, rng, n=40, g=6):
        from dissect_tpu.io.labeled_matrix import LabeledMatrix

        rows = [f"F{i}@I{i}" for i in range(n)]
        cols = [f"gene{j}" for j in range(g)]
        base = rng.normal(size=(n, 1))
        vals = base @ np.ones((1, g)) * 0.8 + rng.normal(size=(n, g)) * 0.5
        lm = LabeledMatrix(rows, cols, vals)
        prefix = str(tmp_path / "eff1")
        lm.save(prefix)
        pos = tmp_path / "positions.txt"
        with open(pos, "w") as fh:
            for j, c in enumerate(cols):
                fh.write(f"{c} 1 {j * 1000} {j * 1000 + 500}\n")
        return prefix, str(pos)

    def test_effects_workflow(self, tmp_path, rng):
        prefix, pos = self._effects_fixture(tmp_path, rng)
        out = str(tmp_path / "ge")
        run_cli([
            "--effects", "--effects-files", prefix,
            "--groups-positions", pos, "--group-min-distance", "2000",
            "--num-eval", "3", "--out", out,
        ])
        assert (tmp_path / "ge.gene.correlations.unfiltered.dat").exists() or \
            (tmp_path / "ge.gene.correlations.unfiltered.rowids").exists()
        assert (tmp_path / "ge.indiv.covariances.unfiltered.pca.eigenvalues").exists()
        assert (tmp_path / "ge.gene.correlations.2000.rowids").exists()

    def test_effects_pair_files(self, tmp_path, rng):
        p1, _ = self._effects_fixture(tmp_path, rng)
        from dissect_tpu.io.labeled_matrix import LabeledMatrix

        lm = LabeledMatrix.load(p1)
        p2 = str(tmp_path / "eff2")
        LabeledMatrix(lm.row_labels, ["x1", "x2"],
                      np.asarray(lm.values)[:, :2] * 1.1).save(p2)
        out = str(tmp_path / "gep")
        run_cli([
            "--effects", "--effects-pair-files", p1, p2, "--out", out,
        ])
        assert (tmp_path / "gep.gene.crossed.correlations.rowids").exists()


class TestAccuracyBySnp:
    def test_cli(self, cohort, rng):
        # effects file: NAME ALLELE EFFECT (plain prediction format)
        eff = cohort["tmp"] / "effects.txt"
        snps = cohort["data"].snps[:50]
        with open(eff, "w") as fh:
            fh.write("SNP ALLELE EFFECT\n")
            for s in snps:
                fh.write(f"{s.name} {s.allele2} {rng.normal() * 0.05:.6g}\n")
        out = str(cohort["tmp"] / "acc")
        run_cli([
            "--accuracy-by-snp", "--bfile", cohort["bfile"],
            "--pheno", cohort["pheno"], "--snp-effects", str(eff),
            "--out", out,
        ])
        lines = (cohort["tmp"] / "acc.snps.accuracies").read_text().splitlines()
        assert lines[0].split() == [
            "SNP", "ALLELE", "STDEV", "MEAN", "EFFECT", "CORR", "DELTA"
        ]
        assert len(lines) == 51


class TestReducedModels:
    def test_two_kernel_reml_writes_lrt(self, cohort, rng):
        groups = cohort["tmp"] / "re.txt"
        with open(groups, "w") as fh:
            for i, ind in enumerate(cohort["data"].individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} g{i % 3}\n")
        out = str(cohort["tmp"] / "red")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--random-effects", str(groups), "--write-blue-reduced",
            "--out", out,
        ])
        lrt = (cohort["tmp"] / "red.lrt").read_text().splitlines()
        assert lrt[0].split() == ["REMOVED", "LOGL", "LRT", "DF", "PV",
                                  "CONVERGED"]
        assert len(lrt) >= 2
        removed = {l.split()[0] for l in lrt[1:]}
        assert "GRM" in removed
        assert (cohort["tmp"] / "red.reduced_GRM.blue.mean").exists()

    def test_reduced_with_only(self, cohort, rng):
        groups = cohort["tmp"] / "re2.txt"
        with open(groups, "w") as fh:
            for i, ind in enumerate(cohort["data"].individuals):
                fh.write(f"{ind.family_id} {ind.individual_id} g{i % 3}\n")
        out = str(cohort["tmp"] / "red2")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--random-effects", str(groups),
            "--reduced-with-only", "GRM", "--out", out,
        ])
        lrt = (cohort["tmp"] / "red2.lrt").read_text().splitlines()
        assert [l.split()[0] for l in lrt[1:]] == ["GRM"]


class TestGenotypeGrmList:
    def test_paired_gwas(self, cohort, tmp_path, rng):
        # two genotype subsets, each paired with its own GRM
        grm = str(tmp_path / "pgrm")
        run_cli(["--make-grm", "--bfile", cohort["bfile"], "--out", grm])
        lst = tmp_path / "pairs.txt"
        lst.write_text(f"{cohort['bfile']} {grm}\n")
        out = str(tmp_path / "pg")
        run_cli([
            "--gwas", "--bfile-grm-list", str(lst),
            "--pheno", cohort["pheno"], "--out", out,
        ])
        produced = list(tmp_path.glob("pg.*gwas.snps"))
        assert len(produced) == 1


class TestBlupExtras:
    def test_indiv_blup_error(self, cohort):
        out = str(cohort["tmp"] / "be")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--indiv-blup", "--indiv-blup-error", "--out", out,
        ])
        lines = (cohort["tmp"] / "be.GRM.blup.indiv").read_text().splitlines()
        assert lines[0].split() == ["FID", "IID", "BLUP", "STD"]
        stds = np.array([float(l.split()[3]) for l in lines[1:]])
        assert (stds > 0).all()

    def test_blup_bfile_list(self, cohort, tmp_path):
        lst = tmp_path / "blist.txt"
        lst.write_text(cohort["bfile"] + "\n")
        out = str(tmp_path / "bl")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--snp-blup", "--blup-bfile-list", str(lst), "--out", out,
        ])
        produced = list(tmp_path.glob("bl.*GRM.blup.snps"))
        assert len(produced) == 1

    def test_epistasis_var(self, cohort):
        out = str(cohort["tmp"] / "epi")
        run_cli([
            "--reml", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--epistasis-var", "--skip-test-reduced-models", "--out", out,
        ])
        reml = (cohort["tmp"] / "epi.reml").read_text()
        assert "Var(GRMxE)" in reml and "Var(GRM)" in reml


class TestResidualsList:
    def test_mpgwas_pairs(self, cohort, tmp_path):
        out = str(tmp_path / "mpr")
        run_cli([
            "--mpresiduals", "--bfile", cohort["bfile"],
            "--pheno", cohort["pheno"], "--pheno-cols", "1,2", "--out", out,
        ])
        lst = tmp_path / "rlist.txt"
        lst.write_text(f"{cohort['bfile']} {out}.residuals\n")
        out2 = str(tmp_path / "mpg")
        run_cli(["--mpgwas", "--bfile-residuals-list", str(lst), "--out", out2])
        produced = list(tmp_path.glob("mpg.*.mpgwas"))
        assert len(produced) == 1


class TestRgwasKnobs:
    def test_thresholds_and_maxit(self, cohort):
        out = str(cohort["tmp"] / "rg")
        run_cli([
            "--rgwas", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--rgwas-group-size", "40", "--rgwas-maxit", "3",
            "--rgwas-thresholds", "0.05", "0.01",
            "--rgwas-ratio", "0.1", "--out", out,
        ])
        assert (cohort["tmp"] / "rg.rgwas").exists()
