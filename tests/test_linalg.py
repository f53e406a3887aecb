"""Linalg layer tests against numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_dosage


class TestSyrk:
    def test_syrk_matches_numpy(self, rng):
        from dissect_tpu.linalg.syrk import syrk

        z = rng.normal(size=(40, 16))
        np.testing.assert_allclose(
            np.asarray(syrk(jnp.asarray(z), accum_dtype=jnp.float64)),
            z.T @ z,
            rtol=1e-12,
        )

    def test_grm_accumulator_chunks(self, rng):
        from dissect_tpu.io.bed import compute_snp_stats
        from dissect_tpu.linalg.syrk import grm_accumulator

        dosage = make_dosage(rng, 48, 24, missing_rate=0.1)
        stats = compute_snp_stats(dosage)
        acc = grm_accumulator(24, dtype=jnp.float64, accum_dtype=jnp.float64)
        for s in range(0, 48, 13):
            chunk = dosage[s : s + 13]
            acc.update(chunk, stats.mean[s : s + 13], 1.0 / stats.std[s : s + 13])
        kernel, counts = acc.finalize()

        # numpy reference: standardized Z with missing -> 0
        obs = (dosage >= 0).astype(float)
        z = obs * (dosage - stats.mean[:, None]) / stats.std[:, None]
        np.testing.assert_allclose(np.asarray(kernel), z.T @ z, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(counts), obs.T @ obs, rtol=1e-12)


class TestSpd:
    def _spd(self, rng, n=12):
        a = rng.normal(size=(n, n))
        return a @ a.T + n * np.eye(n)

    def test_inverse_logdet(self, rng):
        from dissect_tpu.linalg.spd import spd_inverse_logdet

        v = self._spd(rng)
        vi, logdet, ok = spd_inverse_logdet(jnp.asarray(v))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(vi), np.linalg.inv(v), rtol=1e-9, atol=1e-10)
        assert float(logdet) == pytest.approx(np.linalg.slogdet(v)[1])

    def test_non_pd_detected(self, rng):
        from dissect_tpu.linalg.spd import spd_inverse_logdet

        v = self._spd(rng)
        v[0, 0] = -5.0
        _, _, ok = spd_inverse_logdet(jnp.asarray(v))
        assert not bool(ok)

    def test_lu_fallback_absolute_logdet(self, rng):
        from dissect_tpu.linalg.spd import lu_inverse_logdet

        v = self._spd(rng)
        v[0] *= -1.0  # negative determinant, still invertible
        vi, logdet, ok = lu_inverse_logdet(jnp.asarray(v))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(vi), np.linalg.inv(v), rtol=1e-9, atol=1e-10)
        # GCTA-style absolute log-det (matrix.cpp:3155-3300)
        assert float(logdet) == pytest.approx(np.linalg.slogdet(v)[1])

    def test_spd_solve(self, rng):
        from dissect_tpu.linalg.spd import spd_solve

        v = self._spd(rng)
        b = rng.normal(size=(12, 3))
        x, _, ok = spd_solve(jnp.asarray(v), jnp.asarray(b))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(v, b), rtol=1e-9, atol=1e-10)

    def test_bend(self, rng):
        from dissect_tpu.linalg.spd import bend_matrix

        v = self._spd(rng)
        v = v - 1.2 * np.linalg.eigvalsh(v).min() * np.eye(12)  # make indefinite? no:
        a = rng.normal(size=(12, 12))
        v = a + a.T  # indefinite symmetric
        bent = np.asarray(bend_matrix(jnp.asarray(v)))
        assert np.linalg.eigvalsh(bent).min() >= 0


class TestEigen:
    def test_eigh_topk(self, rng):
        from dissect_tpu.linalg.eigen import eigh_topk

        a = rng.normal(size=(40, 40))
        s = a @ a.T
        w_ref = np.linalg.eigvalsh(s)[::-1]
        w, v = eigh_topk(jnp.asarray(s), k=5, n_iter=30)
        np.testing.assert_allclose(np.asarray(w), w_ref[:5], rtol=1e-8)
        # eigenvector residuals
        for i in range(5):
            vi = np.asarray(v[:, i])
            np.testing.assert_allclose(s @ vi, w_ref[i] * vi, rtol=1e-5, atol=1e-6)


class TestTraces:
    def test_trace_identities(self, rng):
        from dissect_tpu.linalg.traces import (
            diag_of_abat,
            trace_of_product,
            trace_of_product_symmetric,
        )

        a = rng.normal(size=(10, 10))
        b = rng.normal(size=(10, 10))
        sym = b + b.T
        assert float(trace_of_product(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            np.trace(a @ b)
        )
        assert float(
            trace_of_product_symmetric(jnp.asarray(a + a.T), jnp.asarray(sym))
        ) == pytest.approx(np.trace((a + a.T) @ sym))
        np.testing.assert_allclose(
            np.asarray(diag_of_abat(jnp.asarray(a), jnp.asarray(sym))),
            np.diag(a @ sym @ a.T),
            rtol=1e-10,
        )


class TestQr:
    def test_dependent_columns(self, rng):
        from dissect_tpu.linalg.qr import dependent_columns

        a = rng.normal(size=(20, 5))
        a = np.hstack([a, (a[:, 0] + a[:, 1])[:, None]])  # col 5 dependent
        deps = dependent_columns(a)
        assert 5 in deps.tolist() or 0 in deps.tolist() or 1 in deps.tolist()
        assert len(deps) == 1
        full = rng.normal(size=(20, 6))
        assert len(dependent_columns(full)) == 0


class TestSmallSpd:
    """linalg/small.py — unrolled batched tiny-SPD solves (the per-SNP
    GLS/ML-F systems in gwas/mlm.py; reference: LAPACK dpotrf/dposv,
    reml.cpp:1859-1871)."""

    def test_solve_and_inverse_match_numpy(self, rng):
        import jax.numpy as jnp

        from dissect_tpu.linalg.small import inv_spd_small, solve_spd_small

        for q in (1, 2, 3, 5, 8):
            a = rng.normal(size=(64, q, q))
            a = a @ np.swapaxes(a, -1, -2) + 3 * np.eye(q)
            b = rng.normal(size=(64, q))
            x = np.asarray(solve_spd_small(jnp.asarray(a), jnp.asarray(b)))
            np.testing.assert_allclose(
                x, np.linalg.solve(a, b[..., None])[..., 0], atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(inv_spd_small(jnp.asarray(a))),
                np.linalg.inv(a),
                atol=1e-9,
            )

    def test_unbatched_and_multibatch(self, rng):
        import jax.numpy as jnp

        from dissect_tpu.linalg.small import solve_spd_small

        a = rng.normal(size=(3, 3))
        a = a @ a.T + 3 * np.eye(3)
        b = rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(solve_spd_small(jnp.asarray(a), jnp.asarray(b))),
            np.linalg.solve(a, b),
            atol=1e-9,
        )
        a4 = np.broadcast_to(a, (2, 5, 3, 3))
        b4 = rng.normal(size=(2, 5, 3))
        np.testing.assert_allclose(
            np.asarray(solve_spd_small(jnp.asarray(a4), jnp.asarray(b4))),
            np.linalg.solve(a4, b4[..., None])[..., 0],
            atol=1e-9,
        )


class TestFallbackInverse:
    def test_small_uses_lu(self):
        """Below the threshold the fallback is the exact LU inverse of
        an indefinite (non-PD but invertible) matrix."""
        from dissect_tpu.linalg.spd import fallback_inverse_logdet

        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.normal(size=(8, 8)))
        w = np.array([3.0, 2.5, 2.0, 1.5, 1.0, 0.5, -0.4, -0.8])
        v = (q * w) @ q.T  # indefinite, invertible
        vi, logdet, ok = fallback_inverse_logdet(jnp.asarray(v))
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(vi), np.linalg.inv(v), rtol=1e-8, atol=1e-10
        )
        # GCTA absolute log-det (signs discarded)
        np.testing.assert_allclose(
            float(logdet), np.sum(np.log(np.abs(w))), rtol=1e-10
        )

    def test_large_uses_jittered_cholesky(self, monkeypatch):
        """Above the threshold (patched down for the test) a barely
        non-PD matrix is ridge-repaired instead of LU-inverted — the
        path that XLA's TPU LU kernel cannot compile at 20k rows."""
        from dissect_tpu.linalg import spd

        monkeypatch.setattr(spd, "LU_FALLBACK_MAX_N", 4)
        rng = np.random.default_rng(1)
        a = rng.normal(size=(12, 6))
        v = a @ a.T  # PSD, rank-deficient -> Cholesky may fail raw
        vi, logdet, ok = spd.fallback_inverse_logdet(jnp.asarray(v))
        assert bool(ok)
        assert np.isfinite(np.asarray(vi)).all() and np.isfinite(float(logdet))
        # a strongly indefinite matrix is NOT silently repaired
        q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
        w = np.linspace(1.0, 12.0, 12)
        w[0] = -5.0
        bad = (q * w) @ q.T
        _, _, ok_bad = spd.fallback_inverse_logdet(jnp.asarray(bad))
        assert not bool(ok_bad)


def test_spd_inverse_auto_big_path(monkeypatch):
    """Above DENSE_INVERSE_MAX_N (patched down) the inverse routes
    through the blocked cyclic pipeline with identity padding and
    matches numpy exactly."""
    from dissect_tpu.linalg import spd

    monkeypatch.setattr(spd, "DENSE_INVERSE_MAX_N", 16)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(70, 30))
    v = a @ a.T / 30 + 0.5 * np.eye(70)  # 70: not a multiple of 512
    vi, logdet, ok = spd.spd_inverse_logdet_auto(jnp.asarray(v))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(vi), np.linalg.inv(v),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(logdet),
                               np.linalg.slogdet(v)[1], rtol=1e-10)


def test_eigh_full_host_routing(monkeypatch):
    """On accelerator backends, host-manageable one-off eighs run on
    host LAPACK (XLA's unrolled accelerator eigh serializes to hundreds
    of MB per shape); the CPU backend and out-of-range sizes keep the
    jitted device path.  Results are identical either way."""
    import jax

    from dissect_tpu.linalg import eigen

    rng = np.random.default_rng(7)
    a = rng.normal(size=(300, 300))
    s = (a + a.T) / 2

    w_dev, v_dev = eigen.eigh_full(jnp.asarray(s))  # CPU backend path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert eigen._host_eigh_preferred(300) is True
    assert eigen._host_eigh_preferred(256) is False   # small: device
    assert eigen._host_eigh_preferred(9000) is False  # beyond cap
    monkeypatch.setenv("DISSECT_TPU_HOST_EIGH_MAX", "16384")
    assert eigen._host_eigh_preferred(9000) is True   # env-raised cap
    w_host, v_host = eigen.eigh_full(np.asarray(s))
    np.testing.assert_allclose(np.asarray(w_host), np.asarray(w_dev),
                               rtol=1e-6, atol=1e-9)
    # eigenvectors agree up to sign
    dots = np.abs(np.sum(np.asarray(v_host) * np.asarray(v_dev), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)
