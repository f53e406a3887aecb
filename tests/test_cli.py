"""End-to-end CLI tests: the full DISSECT-style workflows through
python -m dissect_tpu's dispatcher (in-process for speed)."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


def run_cli(argv):
    from dissect_tpu.analysis.dispatcher import main

    main(argv)


@pytest.fixture
def cohort(tmp_path, rng):
    """A PLINK fileset + phenotype + covariates with real signal."""
    n, m = 150, 300
    dosage = make_dosage(rng, m, n)
    path, data = make_plink(tmp_path, dosage)
    p2 = dosage.sum(1) / (2 * n)
    z = (dosage - 2 * p2[:, None]) / np.sqrt(2 * p2 * (1 - p2))[:, None]
    g = z.T @ (rng.normal(size=m) * np.sqrt(0.6 / m))
    sex = rng.integers(0, 2, size=n)
    y = 1.0 + 0.5 * sex + g + rng.normal(size=n) * np.sqrt(0.4)
    pheno = tmp_path / "pheno.txt"
    with open(pheno, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.8g} {rng.normal():.8g}\n")
    covar = tmp_path / "covar.txt"
    with open(covar, "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(f"{ind.family_id} {ind.individual_id} {'M' if sex[i] else 'F'}\n")
    return dict(
        bfile=path, pheno=str(pheno), covar=str(covar),
        tmp=tmp_path, data=data, y=y,
    )


class TestWorkflows:
    def test_make_grm_then_reml(self, cohort):
        out = str(cohort["tmp"] / "run1")
        run_cli(["--make-grm", "--bfile", cohort["bfile"], "--out", out])
        assert (cohort["tmp"] / "run1.grm.dat").exists()

        out2 = str(cohort["tmp"] / "run2")
        run_cli([
            "--reml", "--grm", out, "--pheno", cohort["pheno"],
            "--covar", cohort["covar"], "--blue", "--indiv-blup",
            "--out", out2,
        ])
        reml = (cohort["tmp"] / "run2.reml").read_text()
        assert "Var(GRM)" in reml and "Var(E)" in reml
        assert "/Var(Phenotype_1)" in reml
        assert (cohort["tmp"] / "run2.blue.mean").exists()
        assert (cohort["tmp"] / "run2.GRM.blup.indiv").exists()
        # h2 should be in a plausible band given strong simulated signal
        for line in reml.splitlines():
            if line.startswith("Var(GRM)/"):
                h2 = float(line.split()[1])
                assert 0.0 <= h2 <= 1.0

    def test_pca(self, cohort):
        out = str(cohort["tmp"] / "pca")
        run_cli(["--pca", "--bfile", cohort["bfile"], "--num-eval", "5", "--out", out])
        lines = (cohort["tmp"] / "pca.pca.eigenvalues").read_text().splitlines()
        # reference format (pca.cpp:85-90): every eigenvalue, one per
        # line, descending, no header — here the randomized path keeps
        # the top 5 only
        vals = [float(l.split()[0]) for l in lines]
        assert len(vals) >= 5
        assert vals == sorted(vals, reverse=True)

    def test_gwas_ols(self, cohort):
        out = str(cohort["tmp"] / "gwas")
        run_cli([
            "--gwas", "--bfile", cohort["bfile"], "--pheno", cohort["pheno"],
            "--covar", cohort["covar"], "--out", out,
        ])
        lines = (cohort["tmp"] / "gwas.gwas.snps").read_text().splitlines()
        assert len(lines) == 301  # header + 300 SNPs
        assert lines[0].split() == [
            "GROUP", "SNP", "ALLELE", "MEAN", "STDEV", "BETA", "NBETA",
            "SE", "PV", "GROUPPV",
        ]
        ps = np.array([float(l.split()[8]) for l in lines[1:]])
        assert ((ps >= 0) & (ps <= 1)).all()

    def test_gwas_mixed(self, cohort):
        grm = str(cohort["tmp"] / "g")
        run_cli(["--make-grm", "--bfile", cohort["bfile"], "--out", grm])
        out = str(cohort["tmp"] / "mlm")
        run_cli([
            "--gwas", "--bfile", cohort["bfile"], "--grm", grm,
            "--pheno", cohort["pheno"], "--covar", cohort["covar"],
            "--out", out,
        ])
        lines = (cohort["tmp"] / "mlm.gwas.snps").read_text().splitlines()
        unfitted_file = cohort["tmp"] / "mlm.gwas.unfitted"
        n_unfitted = (
            len(unfitted_file.read_text().splitlines())
            if unfitted_file.exists()
            else 0
        )
        # unfitted SNPs never enter the results map (gwas.cpp:519-535)
        assert len(lines) - 1 + n_unfitted == 300

    def test_bivar_reml(self, cohort):
        out = str(cohort["tmp"] / "bivar")
        run_cli([
            "--bivar-reml", "--bfile", cohort["bfile"],
            "--pheno", cohort["pheno"], "--pheno-cols", "1,2",
            "--out", out,
        ])
        corr = (cohort["tmp"] / "bivar.correlations").read_text()
        assert "Cor(GRM_p1-2)" in corr

    def test_mp_pipeline(self, cohort):
        out = str(cohort["tmp"] / "mp")
        run_cli([
            "--mpresiduals", "--bfile", cohort["bfile"],
            "--pheno", cohort["pheno"], "--out", out,
        ])
        assert (cohort["tmp"] / "mp.residuals.dat").exists()
        run_cli([
            "--mpgwas", "--bfile", cohort["bfile"],
            "--pheno", cohort["pheno"], "--out", out,
        ])
        lines = (cohort["tmp"] / "mp.mpgwas").read_text().splitlines()
        assert len(lines) == 1 + 300 * 2  # header + SNPs x 2 phenos
        # the reference's wide table (storeResultsMultiplePhenotype,
        # gwasmp.cpp:752-813): NBETA/NSE/PV triplet per phenotype,
        # lexicographic SNP order
        wide = (cohort["tmp"] / "mp.multipheno.gwas.snps").read_text().splitlines()
        head = wide[0].split()
        assert head[:4] == ["SNP", "ALLELE", "MEAN", "STDEV"]
        assert len(head) == 4 + 3 * 2 and head[4].startswith("NBETA-")
        assert len(wide) == 1 + 300
        names = [l.split()[0] for l in wide[1:]]
        assert names == sorted(names)
        # NBETA * STDEV == BETA from the long table for a spot row
        by_key = {
            (l.split()[0], l.split()[1]): l.split()
            for l in lines[1:]
        }
        row = wide[1].split()
        pheno0 = head[4][len("NBETA-"):]
        beta_long = float(by_key[(row[0], pheno0)][2])
        np.testing.assert_allclose(
            float(row[4]) * float(row[3]), beta_long, rtol=2e-3
        )

    def test_simulate_predict_roundtrip(self, cohort, rng):
        tmp = cohort["tmp"]
        effects_file = tmp / "causal.txt"
        names = cohort["data"].snp_names
        with open(effects_file, "w") as fh:
            for s in names[:50]:
                fh.write(f"{s} {rng.normal():.6g}\n")
        out = str(tmp / "sim")
        run_cli([
            "--simulate", "--bfile", cohort["bfile"],
            "--effect-sizes", str(effects_file), "--simu-h2", "0.8",
            "--out", out,
        ])
        phenos = (tmp / "sim.simulated.phenos").read_text().splitlines()
        assert len(phenos) == 150

        # prediction from the simulated effects should correlate with the
        # simulated genetic values
        eff_pred = tmp / "eff.txt"
        with open(eff_pred, "w") as fh:
            fh.write("SNP ALLELE EFFECT\n")
            for line in (tmp / "sim.simulated.effects").read_text().splitlines():
                snp, eff = line.split()
                fh.write(f"{snp} C {eff}\n")  # allele2 is 'C' in fixtures
        out2 = str(tmp / "pred")
        run_cli([
            "--predict", "--bfile", cohort["bfile"],
            "--snp-effects", str(eff_pred), "--out", out2,
        ])
        pred_lines = (tmp / "pred.predicted.phenos").read_text().splitlines()[1:]
        pred = np.array([float(l.split()[2]) for l in pred_lines])
        blups = (tmp / "sim.simulated.blups").read_text().splitlines()
        genetic = np.array([float(l.split()[2]) for l in blups])
        r = np.corrcoef(pred, genetic)[0, 1]
        assert r > 0.99  # same effects, coding differs by a constant shift

    def test_snp_stats(self, cohort):
        out = str(cohort["tmp"] / "st")
        run_cli(["--snp-stats", "--bfile", cohort["bfile"], "--out", out])
        lines = (cohort["tmp"] / "st.snpstats").read_text().splitlines()
        assert len(lines) == 301

    def test_incompatible_analyses_rejected(self, cohort):
        from dissect_tpu.runtime.options import Options, OptionsError

        with pytest.raises(OptionsError):
            Options.parse(["--reml", "--gwas"])
