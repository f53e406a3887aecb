"""IO layer tests: PLINK round-trip, stats, phenotypes, covariates, GRM format."""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


class TestPlinkRoundTrip:
    def test_write_read_identity(self, tmp_path, rng):
        from dissect_tpu.io.bed import read_plink

        dosage = make_dosage(rng, 33, 21, missing_rate=0.05)  # odd sizes: byte padding
        path, data = make_plink(tmp_path, dosage)
        loaded = read_plink(path)
        assert loaded.n_snps == 33
        assert loaded.n_individuals == 21
        np.testing.assert_array_equal(loaded.dosages(), dosage)
        assert loaded.snp_names == data.snp_names
        assert loaded.individual_keys == data.individual_keys

    def test_chunked_decode_matches_full(self, tmp_path, rng):
        from dissect_tpu.io.bed import read_plink

        dosage = make_dosage(rng, 50, 17, missing_rate=0.1)
        path, _ = make_plink(tmp_path, dosage)
        loaded = read_plink(path)
        chunks = [c for _, _, c in loaded.iter_chunks(7)]
        np.testing.assert_array_equal(np.concatenate(chunks), dosage)

    def test_bad_magic_rejected(self, tmp_path):
        from dissect_tpu.io.bed import read_plink

        (tmp_path / "bad.bed").write_bytes(b"\x00\x00\x00data")
        (tmp_path / "bad.bim").write_text("1 s 0 1 A C\n")
        (tmp_path / "bad.fam").write_text("F I 0 0 0 -9\n")
        with pytest.raises(ValueError, match="magic"):
            read_plink(str(tmp_path / "bad"))


class TestSnpStats:
    def test_stats_match_manual(self, rng):
        from dissect_tpu.io.bed import compute_snp_stats

        dosage = make_dosage(rng, 40, 25, missing_rate=0.1)
        stats = compute_snp_stats(dosage)
        for i in range(40):
            row = dosage[i]
            obs = row[row >= 0]
            p2 = obs.sum() / (2 * len(obs))
            assert stats.n_nonmissing[i] == len(obs)
            assert stats.p2[i] == pytest.approx(p2)
            assert stats.p1[i] == pytest.approx(1 - p2)
            # std = sqrt(2 p1 (1-p1)) (genotype.cpp:738)
            assert stats.std[i] == pytest.approx(np.sqrt(2 * (1 - p2) * p2))

    def test_filter(self, rng, tmp_path):
        dosage = make_dosage(rng, 20, 10)
        _, data = make_plink(tmp_path, dosage)
        keep_snps = [s.name for s in data.snps[::2]]
        keep_inds = [i.key for i in data.individuals[:5]][::-1]  # reversed order
        sub = data.filter(keep_snps=keep_snps, keep_individuals=keep_inds)
        assert sub.snp_names == keep_snps
        assert sub.individual_keys == keep_inds
        assert sub.dosages()[0, 0] == dosage[0, 4]


class TestPhenotypeCovariate:
    def test_phenotype(self, tmp_path):
        from dissect_tpu.io.phenotype import read_phenotype

        f = tmp_path / "p.txt"
        f.write_text("F0 I0 1.5 7\nF1 I1 -9 8\nF2 I2 2.5 NA\n")
        p1 = read_phenotype(str(f), 1)
        assert p1.keys == ["F0@I0", "F2@I2"]
        np.testing.assert_allclose(p1.values, [1.5, 2.5])
        p2 = read_phenotype(str(f), 2)
        assert p2.keys == ["F0@I0", "F1@I1"]

    def test_covariates_design_matrix(self, tmp_path):
        from dissect_tpu.io.covariate import read_covariates

        disc = tmp_path / "covar.txt"
        disc.write_text("F0 I0 M\nF1 I1 F\nF2 I2 M\nF3 I3 X\n")
        quant = tmp_path / "qcovar.txt"
        quant.write_text("F0 I0 1.0\nF1 I1 2.0\nF2 I2 -9\nF3 I3 4.0\n")
        cov = read_covariates(str(disc), str(quant))
        # F2 dropped (missing qcovar); categories sorted: F, M, X; F dropped
        assert cov.keys == ["F0@I0", "F1@I1", "F3@I3"]
        assert cov.missing_keys == ["F2@I2"]
        assert cov.column_names == ["mean", "discrete_1_M", "discrete_1_X", "quantitative_1"]
        np.testing.assert_allclose(
            cov.matrix,
            [[1, 1, 0, 1.0], [1, 0, 0, 2.0], [1, 0, 1, 4.0]],
        )

    def test_mean_only(self):
        from dissect_tpu.io.covariate import read_covariates

        cov = read_covariates(default_keys=["a@1", "b@2"])
        np.testing.assert_allclose(cov.matrix, [[1.0], [1.0]])


class TestIds:
    def test_intersection_order(self):
        from dissect_tpu.io.ids import intersection_keeping_order, order_as_template

        assert intersection_keeping_order(["c", "a", "b"], ["b", "c"]) == ["c", "b"]
        assert order_as_template(["b", "c"], ["c", "a", "b"]) == ["c", "b"]


class TestGrmFormat:
    def test_pack_unpack(self, rng):
        from dissect_tpu.io.grm_io import pack_kernel, unpack_kernel

        n = 9
        a = rng.normal(size=(n, n))
        k = a @ a.T
        c = np.abs(rng.normal(size=(n, n)))
        c = c + c.T
        kernel, counts = unpack_kernel(pack_kernel(k, c))
        np.testing.assert_allclose(kernel, k)
        np.testing.assert_allclose(counts, c)

    def test_write_read_roundtrip(self, tmp_path, rng):
        from dissect_tpu.io.grm_io import read_grm, write_grm

        n = 7
        a = rng.normal(size=(n, n))
        k = a @ a.T
        c = np.full((n, n), 100.0)
        keys = [f"F{i}@I{i}" for i in range(n)]
        snps = [f"snp{j}" for j in range(13)]
        prefix = str(tmp_path / "test")
        write_grm(prefix, k, c, keys, snps)
        loaded = read_grm(prefix)
        assert loaded["individual_keys"] == keys
        assert loaded["snp_names"] == snps
        assert not loaded["diagonalized"]
        np.testing.assert_allclose(loaded["kernel"], k)
        np.testing.assert_allclose(loaded["counts"], c)

    def test_diagonalized_roundtrip(self, tmp_path, rng):
        from dissect_tpu.io.grm_io import read_grm, write_grm_diagonalized

        n = 6
        a = rng.normal(size=(n, n))
        w, v = np.linalg.eigh(a @ a.T)
        keys = [f"F{i}@I{i}" for i in range(n)]
        prefix = str(tmp_path / "diag")
        write_grm_diagonalized(prefix, w, v, keys, ["s1"])
        loaded = read_grm(prefix)
        assert loaded["diagonalized"]
        np.testing.assert_allclose(loaded["eigenvalues"], w)
        np.testing.assert_allclose(loaded["eigenvectors"], v)
