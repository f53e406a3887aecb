"""Golden parity fixtures: stored outputs + independent verification.

Two layers (the substitute for diffing against the C++ binary, which
cannot be built in this image — no mpicxx/ScaLAPACK dev packages):

  1. REGRESSION: re-run the CLI on the committed cohort and compare
     every output file to the stored golden copy — headers and row
     structure byte-for-byte, numeric fields to 1e-6 — pinning the
     reference's file formats (.grm.* kernel.cpp:893-1009; .reml
     reml.cpp:2761-2922; .gwas.* gwas.cpp:1036-1154; .pca.*
     pca.cpp:78-101).

  2. HAND-VERIFICATION: the stored NUMBERS are re-derived with
     independent oracles — a from-scratch .bed decoder, the GCTA GRM
     formula in plain numpy, closed-form OLS t-tests, brute-force
     scipy maximization of the REML likelihood, and numpy eigh.

Regenerate with `python tests/golden/gen_fixture.py` ONLY when an
intentional format/semantics change is made, and re-verify by hand.
"""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"


# --------------------------------------------------------------------------
# independent .bed decoding (NOT dissect_tpu.io.bed)
# --------------------------------------------------------------------------

def _independent_bed_decode():
    """PLINK .bed spec: magic 0x6c 0x1b 0x01, then per-SNP rows of
    2-bit codes, little-endian within each byte; 00=hom A1,
    01=missing, 10=het, 11=hom A2.  Dosage counts A2 copies — the
    reference's orientation (parseSNPbyte codes 1/2/3 with p2 from
    code 3, genotype.cpp:741-781 + 736-738; results report ALLELE =
    allele2, gwas.cpp:1036-1154)."""
    fam = (GOLDEN / "cohort.fam").read_text().split("\n")
    n = len([l for l in fam if l.strip()])
    bim = (GOLDEN / "cohort.bim").read_text().split("\n")
    m = len([l for l in bim if l.strip()])
    raw = (GOLDEN / "cohort.bed").read_bytes()
    assert raw[:3] == bytes([0x6C, 0x1B, 0x01])
    per_row = (n + 3) // 4
    code_to_dosage = {0: 0, 1: -1, 2: 1, 3: 2}
    out = np.empty((m, n), dtype=np.int8)
    for i in range(m):
        row = raw[3 + i * per_row : 3 + (i + 1) * per_row]
        codes = []
        for byte in row:
            for shift in (0, 2, 4, 6):
                codes.append((byte >> shift) & 0b11)
        out[i] = [code_to_dosage[c] for c in codes[:n]]
    return out


def _oracle_grm(d):
    """GCTA GRM in plain numpy (kernel.cpp:92-109 + 382-460)."""
    obs = (d >= 0).astype(np.float64)
    filled = np.where(d >= 0, d, 0).astype(np.float64)
    p2 = filled.sum(1) / (2.0 * obs.sum(1))
    z = obs * (filled - 2.0 * p2[:, None]) / np.sqrt(
        2.0 * p2 * (1.0 - p2)
    )[:, None]
    counts = obs.T @ obs
    return (z.T @ z) / counts, counts, z


def _read_pheno():
    lines = (GOLDEN / "pheno.txt").read_text().split("\n")
    return np.array([float(l.split()[2]) for l in lines if l.strip()])


def _reml_values():
    out = {}
    for line in (GOLDEN / "golden.reml").read_text().split("\n"):
        if "AI Matrix" in line:
            break  # the AI-inverse table reuses Var() row labels
        parts = line.split()
        try:
            if len(parts) == 3 and (
                parts[0].startswith("Var(") or "/" in parts[0]
            ):
                out[parts[0]] = (float(parts[1]), float(parts[2]))
        except ValueError:
            continue
    return out


# --------------------------------------------------------------------------
# layer 2: hand-verification of the stored numbers
# --------------------------------------------------------------------------

class TestGoldenNumbersAreCorrect:
    def test_grm_values(self):
        from dissect_tpu.io.grm_io import read_grm

        d = _independent_bed_decode()
        k_oracle, counts_oracle, _ = _oracle_grm(d)
        loaded = read_grm(str(GOLDEN / "golden"))
        # the stored GRM accumulates in fp32 on device; the oracle is
        # float64 — tolerance covers the fp32 rounding only
        np.testing.assert_allclose(
            np.asarray(loaded["kernel"]), k_oracle, rtol=1e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(loaded["counts"]), counts_oracle
        )
        # ids file parity: FID IID per row, GRM order
        ids = (GOLDEN / "golden.grm.ids").read_text().split("\n")
        assert ids[0].split() == ["F0", "I0"]

    def test_reml_variances_are_the_likelihood_optimum(self):
        """Brute-force REML: the stored Var(GRM)/Var(E) maximize
        -0.5(log|V| + log|X'V^-1X| + y'Py) (scipy, dense float64)."""
        from scipy.optimize import minimize

        from dissect_tpu.io.grm_io import read_grm

        k = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        y = _read_pheno()
        n = len(y)
        x = np.ones((n, 1))
        eye = np.eye(n)

        def neg_restricted_ll(theta):
            vg, ve = np.exp(theta)
            v = vg * k + ve * eye
            try:
                vi = np.linalg.inv(v)
            except np.linalg.LinAlgError:
                return 1e10
            sign, logdet = np.linalg.slogdet(v)
            xtvix = x.T @ vi @ x
            p = vi - vi @ x @ np.linalg.inv(xtvix) @ x.T @ vi
            return 0.5 * (
                logdet + np.linalg.slogdet(xtvix)[1] + y @ p @ y
            )

        res = minimize(
            neg_restricted_ll, np.log([0.3, 0.3]), method="Nelder-Mead",
            options={"xatol": 1e-10, "fatol": 1e-12, "maxiter": 2000},
        )
        vg, ve = np.exp(res.x)
        stored = _reml_values()
        np.testing.assert_allclose(stored["Var(GRM)"][0], vg, rtol=2e-4)
        np.testing.assert_allclose(stored["Var(E)"][0], ve, rtol=2e-4)
        # h2 line consistency
        h2 = stored["Var(GRM)/Var(Phenotype_1)"][0]
        np.testing.assert_allclose(h2, vg / (vg + ve), rtol=2e-4)

    def test_blue_is_gls_at_the_fitted_variances(self):
        from dissect_tpu.io.grm_io import read_grm

        k = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        y = _read_pheno()
        n = len(y)
        stored = _reml_values()
        v = stored["Var(GRM)"][0] * k + stored["Var(E)"][0] * np.eye(n)
        vi = np.linalg.inv(v)
        x = np.ones((n, 1))
        xtvix_i = np.linalg.inv(x.T @ vi @ x)
        beta = float((xtvix_i @ (x.T @ vi @ y))[0])
        se = float(np.sqrt(xtvix_i[0, 0]))
        line = (GOLDEN / "golden.blue.mean").read_text().split("\n")[1]
        np.testing.assert_allclose(float(line.split()[1]), beta, rtol=1e-4)
        np.testing.assert_allclose(float(line.split()[2]), se, rtol=1e-4)

    def test_ols_gwas_closed_form(self):
        from scipy.stats import t as t_dist

        d = _independent_bed_decode()
        y = _read_pheno()
        n = d.shape[1]
        obs = d >= 0
        filled = np.where(obs, d, 0).astype(np.float64)
        mean = filled.sum(1) / obs.sum(1)
        rows = (GOLDEN / "golden.ols.gwas.snps").read_text().split("\n")
        header = rows[0].split()
        # storeResults format incl. GROUPPV (gwas.cpp:1049, always
        # written); GROUP = SNP name (map key, gwas.cpp:532-535)
        assert header == ["GROUP", "SNP", "ALLELE", "MEAN", "STDEV",
                          "BETA", "NBETA", "SE", "PV", "GROUPPV"]
        by_name = {r.split()[1]: r.split() for r in rows[1:] if r}
        # rows come out in std::map (lexicographic) order
        assert [r.split()[1] for r in rows[1:] if r] == sorted(by_name)
        for i in [0, 3, 11, 19]:
            g = np.where(obs[i], filled[i] - mean[i], 0.0)
            xg = np.column_stack([np.ones(n), g])
            a_inv = np.linalg.inv(xg.T @ xg)
            b = a_inv @ (xg.T @ y)
            resid = y - xg @ b
            mse = resid @ resid / (n - 2)
            se = np.sqrt(mse * a_inv[1, 1])
            tstat = b[1] / se
            p = 2.0 * t_dist.sf(abs(tstat), n - 2)
            parts = by_name[f"snp{i}"]
            np.testing.assert_allclose(float(parts[5]), b[1], rtol=1e-5)
            np.testing.assert_allclose(float(parts[7]), se, rtol=1e-5)
            np.testing.assert_allclose(float(parts[8]), p, rtol=1e-3)
            # F(1, df) of the added SNP == t^2: GROUPPV equals PV
            np.testing.assert_allclose(float(parts[9]), p, rtol=1e-3)

    def test_bgen_grm_oracle(self):
        """The BGEN-ingested GRM from first principles: the fixture's
        BGEN carries the same hard calls (prob 1, 16-bit), and the BGEN
        path standardizes by the EMPIRICAL dosage std — the reference's
        on-the-fly accumulation (genotypebgen.cpp:106-122) — unlike the
        .bed path's binomial sqrt(2p(1-p))."""
        from dissect_tpu.io.grm_io import read_grm

        d = _independent_bed_decode()
        obs = (d >= 0).astype(np.float64)
        filled = np.where(d >= 0, d, 0).astype(np.float64)
        mean = filled.sum(1) / obs.sum(1)
        # empirical SAMPLE std over observed dosages (ddof=1)
        var = (obs * (filled - mean[:, None]) ** 2).sum(1) / (
            obs.sum(1) - 1.0
        )
        z = obs * (filled - mean[:, None]) / np.sqrt(var)[:, None]
        counts = obs.T @ obs
        k_oracle = (z.T @ z) / counts
        bgen = read_grm(str(GOLDEN / "golden.bgen"))
        np.testing.assert_allclose(
            np.asarray(bgen["kernel"]), k_oracle, rtol=5e-3, atol=5e-4
        )
        np.testing.assert_allclose(np.asarray(bgen["counts"]), counts)

    def test_diagonalized_grm_is_the_eigendecomposition(self):
        """golden.diag stores U (in .dat) and lambda (.grm.diag) with
        U diag(lambda) U' == the dense GRM and lambda == numpy eigh
        (diagonalizeKernel, kernel.cpp:2106-2141 + 992-1002)."""
        from dissect_tpu.io.grm_io import read_grm

        dense = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        diag = read_grm(str(GOLDEN / "golden.diag"))
        u = np.asarray(diag["eigenvectors"], dtype=np.float64)
        w = np.asarray(diag["eigenvalues"], dtype=np.float64)
        np.testing.assert_allclose(
            np.sort(w), np.sort(np.linalg.eigvalsh(dense)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            (u * w) @ u.T, dense, rtol=1e-4, atol=1e-5
        )

    def test_snp_blup_formula(self):
        """golden.GRM.blup.snps from first principles: blup_s =
        s2_g * (z_s . Py) * n / (n_s * M) with Py at the fitted
        variances (computeSNPsBLUP, reml.cpp:3098-3356)."""
        from dissect_tpu.io.grm_io import read_grm

        d = _independent_bed_decode()
        k = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        y = _read_pheno()
        m, n = d.shape
        stored = _reml_values()
        vg, ve = stored["Var(GRM)"][0], stored["Var(E)"][0]
        v = vg * k + ve * np.eye(n)
        vi = np.linalg.inv(v)
        x = np.ones((n, 1))
        p = vi - vi @ x @ np.linalg.inv(x.T @ vi @ x) @ x.T @ vi
        py = p @ y
        obs = (d >= 0).astype(np.float64)
        filled = np.where(d >= 0, d, 0).astype(np.float64)
        mean = filled.sum(1) / obs.sum(1)
        p2 = mean / 2.0
        std = np.sqrt(2.0 * p2 * (1.0 - p2))
        z = obs * (filled - mean[:, None]) / std[:, None]
        blup = vg * (z @ py) * n / (obs.sum(1) * m)
        rows = (GOLDEN / "golden.GRM.blup.snps").read_text().split("\n")
        assert rows[0].split() == ["SNP", "ALLELE", "BLUP", "STDEV",
                                   "MEAN", "NBLUP"]
        got = {r.split()[0]: r.split() for r in rows[1:] if r}
        for i in range(m):
            parts = got[f"snp{i}"]
            np.testing.assert_allclose(float(parts[2]), blup[i], rtol=1e-4)
            np.testing.assert_allclose(float(parts[3]), std[i], rtol=1e-4)
            np.testing.assert_allclose(
                float(parts[5]), blup[i] / std[i], rtol=1e-4
            )

    def test_bivar_reml_is_the_likelihood_optimum(self):
        """Brute-force 6-parameter bivariate REML (scipy over the
        2n x 2n dense V) reproduces golden.bi.reml's variances and the
        derived genetic correlation (reml.cpp:2838-2906)."""
        from scipy.optimize import minimize

        from dissect_tpu.io.grm_io import read_grm

        k = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        n = k.shape[0]
        lines = (GOLDEN / "pheno2.txt").read_text().split("\n")
        y1 = np.array([float(l.split()[2]) for l in lines if l.strip()])
        y2 = np.array([float(l.split()[3]) for l in lines if l.strip()])
        y = np.concatenate([y1, y2])
        x = np.zeros((2 * n, 2))
        x[:n, 0] = 1.0
        x[n:, 1] = 1.0
        eye = np.eye(n)

        def neg_rll(theta):
            g1, g2, cg, e1, e2, ce = theta
            if g1 <= 0 or g2 <= 0 or e1 <= 0 or e2 <= 0:
                return 1e10
            vg = np.block([[g1 * k, cg * k], [cg * k, g2 * k]])
            vee = np.block([[e1 * eye, ce * eye], [ce * eye, e2 * eye]])
            v = vg + vee
            sign, logdet = np.linalg.slogdet(v)
            if sign <= 0:
                return 1e10
            vi = np.linalg.inv(v)
            xtvix = x.T @ vi @ x
            p = vi - vi @ x @ np.linalg.inv(xtvix) @ x.T @ vi
            return 0.5 * (logdet + np.linalg.slogdet(xtvix)[1] + y @ p @ y)

        stored = {}
        for line in (GOLDEN / "golden.bi.reml").read_text().split("\n"):
            parts = line.split()
            if len(parts) == 3 and (
                parts[0].startswith("Var(") or parts[0].startswith("Covar(")
            ):
                stored.setdefault(parts[0], float(parts[1]))
        start = np.array([0.3, 0.3, 0.1, 0.3, 0.3, 0.1])
        res = minimize(neg_rll, start, method="Nelder-Mead",
                       options={"xatol": 1e-10, "fatol": 1e-12,
                                "maxiter": 6000, "maxfev": 8000})
        g1, g2, cg, e1, e2, ce = res.x
        np.testing.assert_allclose(stored["Var(GRM_p1)"], g1, rtol=2e-3)
        np.testing.assert_allclose(stored["Var(GRM_p2)"], g2, rtol=2e-3)
        np.testing.assert_allclose(stored["Covar(GRM_p1-2)"], cg, rtol=2e-3)
        np.testing.assert_allclose(stored["Var(E_p1)"], e1, rtol=2e-3)
        np.testing.assert_allclose(stored["Var(E_p2)"], e2, rtol=2e-3)
        np.testing.assert_allclose(stored["Covar(E_p1-2)"], ce, rtol=2e-3)
        # .correlations consistency: Cor = Covar / sqrt(V1 V2)
        cor_line = [
            l for l in
            (GOLDEN / "golden.bi.correlations").read_text().split("\n")
            if l.startswith("Cor(GRM")
        ][0]
        np.testing.assert_allclose(
            float(cor_line.split()[1]), cg / np.sqrt(g1 * g2), rtol=2e-3
        )

    def test_regional_tables_are_consistent(self):
        """golden.reg.regional/.lrt internal consistency: PROPORTION =
        NSNPS/M, converged fits, and PV = 0.5 * chi2_sf(LRT, df) (the
        reference's mixture LRT, results.cpp:38-52)."""
        from scipy.stats import chi2

        rows = (GOLDEN / "golden.reg.regional").read_text().split("\n")
        assert rows[0].split() == ["REGION", "NSNPS", "PROPORTION",
                                   "GLOBAL_VAR", "REGIONAL_VAR", "E_VAR",
                                   "SUCCESS"]
        m_total = sum(int(r.split()[1]) for r in rows[1:] if r)
        assert m_total == 20
        for r in rows[1:]:
            if not r:
                continue
            parts = r.split()
            np.testing.assert_allclose(
                float(parts[2]), int(parts[1]) / m_total, rtol=1e-6
            )
            assert parts[6] == "1"
        lrt_rows = (GOLDEN / "golden.reg.lrt").read_text().split("\n")
        assert lrt_rows[0].split() == ["REMOVED", "LOGL", "LRT", "DF",
                                       "PV", "CONVERGED"]
        for r in lrt_rows[1:]:
            if not r:
                continue
            parts = r.split()
            lrt, df, pv = float(parts[2]), int(parts[3]), float(parts[4])
            np.testing.assert_allclose(
                pv, 0.5 * chi2.sf(max(lrt, 0.0), df), rtol=1e-3,
                atol=1e-12,
            )

    def test_pca_matches_numpy_eigh(self):
        from dissect_tpu.io.grm_io import read_grm

        k = np.asarray(read_grm(str(GOLDEN / "golden"))["kernel"])
        w = np.linalg.eigvalsh(k)[::-1]
        # reference format (pca.cpp:85-90): the FULL spectrum,
        # descending, one value per line, no header
        stored = np.loadtxt(GOLDEN / "golden.pca.eigenvalues")
        assert stored.shape == w.shape
        np.testing.assert_allclose(stored, w, rtol=1e-6, atol=1e-9)


# --------------------------------------------------------------------------
# layer 1: regression — re-run the CLI, diff against the stored files
# --------------------------------------------------------------------------

def _diff_files(new: pathlib.Path, old: pathlib.Path, rtol=1e-6):
    """Equal structure byte-for-byte; numeric fields to rtol."""
    a_lines = new.read_text().split("\n")
    b_lines = old.read_text().split("\n")
    assert len(a_lines) == len(b_lines), f"{old.name}: line count"
    for ln, (la, lb) in enumerate(zip(a_lines, b_lines)):
        pa, pb = la.split(), lb.split()
        assert len(pa) == len(pb), f"{old.name}:{ln + 1} field count"
        for fa, fb in zip(pa, pb):
            try:
                va, vb = float(fa), float(fb)
            except ValueError:
                assert fa == fb, f"{old.name}:{ln + 1} {fa!r} != {fb!r}"
                continue
            np.testing.assert_allclose(
                va, vb, rtol=rtol, atol=1e-12,
                err_msg=f"{old.name}:{ln + 1}",
            )


def test_golden_regression(tmp_path):
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    def run(args):
        try:
            main(args)
        finally:
            set_mesh_context(None)

    base = ["--bfile", str(GOLDEN / "cohort"), "--pheno",
            str(GOLDEN / "pheno.txt"), "--mesh", "none"]
    run(["--make-grm"] + base + ["--out", f"{tmp_path}/golden"])
    run(["--reml", "--grm", f"{tmp_path}/golden", "--blue", "--snp-blup"]
        + base + ["--out", f"{tmp_path}/golden"])
    run(["--pca", "--grm", f"{tmp_path}/golden", "--num-eval", "5"] + base
        + ["--out", f"{tmp_path}/golden"])
    run(["--gwas"] + base + ["--out", f"{tmp_path}/golden.ols"])
    run(["--gwas", "--grm", f"{tmp_path}/golden"] + base
        + ["--out", f"{tmp_path}/golden.mlm"])
    run(["--gwas", "--groups", str(GOLDEN / "groups.txt")] + base
        + ["--out", f"{tmp_path}/golden.grp"])
    run(["--igwas", "--bfile", str(GOLDEN / "cohort"),
         "--igwas-qcovar", str(GOLDEN / "testcovar.txt"),
         "--mesh", "none", "--out", f"{tmp_path}/golden.ig"])
    run(["--mpresiduals"] + base + ["--out", f"{tmp_path}/golden.mp"])
    run(["--mpgwas"] + base + ["--out", f"{tmp_path}/golden.mp"])
    run(["--simulate", "--bfile", str(GOLDEN / "cohort"),
         "--effect-sizes", str(GOLDEN / "causal.txt"),
         "--simu-h2", "0.6", "--random-seed", "7",
         "--mesh", "none", "--out", f"{tmp_path}/golden.sim"])
    run(["--predict", "--bfile", str(GOLDEN / "cohort"),
         "--snp-effects", str(GOLDEN / "eff.txt"),
         "--mesh", "none", "--out", f"{tmp_path}/golden.pred"])
    run(["--bivar-reml", "--grm", f"{tmp_path}/golden",
         "--bfile", str(GOLDEN / "cohort"),
         "--pheno", str(GOLDEN / "pheno2.txt"), "--pheno-cols", "1,2",
         "--mesh", "none", "--out", f"{tmp_path}/golden.bi"])
    run(["--reml", "--groups", str(GOLDEN / "groups.txt")] + base
        + ["--out", f"{tmp_path}/golden.reg"])
    run(["--make-grm", "--diagonalize"] + base
        + ["--out", f"{tmp_path}/golden.diag"])
    run(["--make-grm", "--bgen", str(GOLDEN / "cohort.bgen"),
         "--mesh", "none", "--out", f"{tmp_path}/golden.bgen"])

    text_outputs = [
        "golden.grm.ids", "golden.grm.snps",
        "golden.reml", "golden.blue.mean",
        "golden.pca.eigenvalues", "golden.pca.eigenvectors",
        "golden.ols.gwas.snps", "golden.ols.gwas.mean",
        "golden.mlm.gwas.snps", "golden.mlm.gwas.unfitted",
        "golden.grp.multi.gwas.snps",
        "golden.ig.gwas.snps", "golden.ig.gwas.mean", "golden.ig.igwas",
        "golden.mp.mpgwas", "golden.mp.multipheno.gwas.snps",
        "golden.sim.simulated.phenos", "golden.sim.simulated.effects",
        "golden.pred.predicted.phenos",
        # round-3 surfaces: .blup.snps (reml.cpp:3330-3346), bivariate
        # .reml + .correlations (reml.cpp:2838-2906), regional
        # .regional/.lrt (singlereml.cpp:230-360)
        "golden.GRM.blup.snps",
        "golden.bi.reml", "golden.bi.correlations",
        "golden.reg.regional", "golden.reg.lrt",
    ]
    for name in text_outputs:
        _diff_files(tmp_path / name, GOLDEN / name, rtol=2e-5)

    # the .grm.dat binary: identical header, values to fp tolerance
    from dissect_tpu.io.grm_io import read_grm

    new = read_grm(f"{tmp_path}/golden")
    old = read_grm(str(GOLDEN / "golden"))
    np.testing.assert_allclose(
        np.asarray(new["kernel"]), np.asarray(old["kernel"]),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(new["counts"]), np.asarray(old["counts"])
    )
    raw_new = (tmp_path / "golden.grm.dat").read_bytes()
    raw_old = (GOLDEN / "golden.grm.dat").read_bytes()
    assert raw_new[:14] == raw_old[:14], "binary .grm.dat header changed"

    # the diagonalized GRM (kernel.cpp:992-1002): .grm.diag eigenvalue
    # payload + eigenvector .dat, flag byte 3
    new_d = read_grm(f"{tmp_path}/golden.diag")
    old_d = read_grm(str(GOLDEN / "golden.diag"))
    assert new_d["diagonalized"] and old_d["diagonalized"]
    np.testing.assert_allclose(
        np.asarray(new_d["eigenvalues"]), np.asarray(old_d["eigenvalues"]),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(new_d["eigenvectors"])),
        np.abs(np.asarray(old_d["eigenvectors"])),  # sign-free
        rtol=1e-5, atol=1e-7,
    )
    # the BGEN-ingested GRM (genotypebgen.cpp) matches the stored copy
    new_b = read_grm(f"{tmp_path}/golden.bgen")
    old_b = read_grm(str(GOLDEN / "golden.bgen"))
    np.testing.assert_allclose(
        np.asarray(new_b["kernel"]), np.asarray(old_b["kernel"]),
        rtol=1e-6, atol=1e-9,
    )
