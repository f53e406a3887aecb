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
    run(["--reml", "--grm", f"{tmp_path}/golden", "--blue"] + base
        + ["--out", f"{tmp_path}/golden"])
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
