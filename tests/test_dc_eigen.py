"""Distributed spectral divide-and-conquer eigensolver tests.

Checks the QDWH-sign based full-spectrum solver (linalg/dc_eigen.py)
against numpy's eigh, locally and on the 8-device mesh with the
shard_map blocked-Cholesky SPD solves engaged (pdsyev_ parity,
matrix.cpp:3327-3380, at beyond-one-device scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dissect_tpu.linalg.dc_eigen import (
    distributed_eigh,
    matrix_sign,
    qdwh_coefficients,
)


def _random_spd(rng, n, spread=1.0):
    a = rng.standard_normal((n, n))
    k = a @ a.T / n + spread * np.eye(n)
    return 0.5 * (k + k.T)


def _check_eig(a, w, v, tol=1e-8):
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=tol, atol=tol)
    v = np.asarray(v)
    np.testing.assert_allclose(v.T @ v, np.eye(v.shape[1]), atol=tol)
    np.testing.assert_allclose(
        np.asarray(a) @ v, v * np.asarray(w)[None, :], atol=10 * tol
    )


class TestQdwhSign:
    def test_schedule_converges(self):
        coeffs = qdwh_coefficients(1e-6)
        l = 1e-6
        for a, b, c in coeffs:
            l = l * (a + b * l * l) / (1.0 + c * l * l)
        assert abs(1.0 - l) < 1e-12
        assert len(coeffs) <= 8

    def test_sign_local(self, rng):
        n = 48
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        w = np.concatenate([rng.uniform(-3, -0.1, n // 2),
                            rng.uniform(0.1, 3, n - n // 2)])
        a = (q * w) @ q.T
        u = matrix_sign(jnp.asarray(a))
        expected = (q * np.sign(w)) @ q.T
        np.testing.assert_allclose(np.asarray(u), expected, atol=1e-10)

    def test_sign_distributed_matches_local(self, rng):
        n = 40  # deliberately NOT divisible by 8*block: exercises padding
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        w = np.concatenate([rng.uniform(-2, -0.2, 17),
                            rng.uniform(0.2, 2, n - 17)])
        a = (q * w) @ q.T
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("i",))
        u = matrix_sign(jnp.asarray(a), mesh=mesh, block=8)
        expected = (q * np.sign(w)) @ q.T
        np.testing.assert_allclose(np.asarray(u), expected, atol=1e-10)
        assert int(round(float(jnp.trace(u)))) == n - 34


class TestDistributedEigh:
    def test_local_recursion(self, rng):
        a = _random_spd(rng, 96)
        w, v = distributed_eigh(a, base_size=24)
        _check_eig(a, w, v)

    def test_mesh_full_spectrum(self, rng):
        a = _random_spd(rng, 64)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("i",))
        w, v = distributed_eigh(a, mesh=mesh, block=8, base_size=16)
        _check_eig(a, w, v)

    def test_indefinite_matrix(self, rng):
        n = 72
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        w_true = rng.uniform(-5, 5, n)
        a = (q * w_true) @ q.T
        w, v = distributed_eigh(a, base_size=20)
        _check_eig(a, w, v)

    def test_clustered_spectrum_falls_back(self, rng):
        # identity cannot be split by any shift: must fall back cleanly
        a = np.eye(30)
        w, v = distributed_eigh(a, base_size=8)
        np.testing.assert_allclose(np.asarray(w), np.ones(30), atol=1e-12)

    def test_float32_rank_deficient_mesh(self, rng):
        # Regression: a low-rank GRM + ridge (dozens of eigenvalues
        # exactly at the ridge value) in float32 on the mesh used to
        # NaN inside the recursion when the median split landed on the
        # cluster.  The guarded split must stay finite and accurate.
        n, m = 64, 32
        z = rng.standard_normal((m, n)).astype(np.float32)
        a = (z.T @ z / m + 0.1 * np.eye(n)).astype(np.float32)
        a = 0.5 * (a + a.T)
        mesh = Mesh(np.asarray(jax.devices()), ("i",))
        w, v = distributed_eigh(jnp.asarray(a), mesh=mesh, block=8,
                                base_size=16)
        assert w.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(w)))
        w_ref = np.linalg.eigvalsh(a.astype(np.float64))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=5e-4)
        res = np.asarray(a @ v - v * np.asarray(w)[None, :])
        assert np.abs(res).max() < 5e-3

    def test_grm_like_psd(self, rng):
        # GRM eigenstructure: few large eigenvalues + bulk near 1
        z = rng.standard_normal((200, 80))
        a = z.T @ z / 200
        a = 0.5 * (a + a.T)
        w, v = distributed_eigh(a, base_size=20)
        _check_eig(a, w, v, tol=1e-7)


class TestIntegration:
    def test_kernel_diagonalize_mesh(self, rng):
        """Kernel.diagonalize(mesh=...) matches the local eigh spectrum
        and round-trips through recover (kernel.cpp:2106-2174)."""
        from dissect_tpu.model.kernels import Kernel, KernelType

        n = 48
        a = _random_spd(rng, n, spread=0.5)
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = Kernel(
            name="GRM",
            type=KernelType.GRM,
            individual_keys=keys,
            matrix=a,
        )
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("i",))
        diag = kern.diagonalize(mesh=mesh, block=8, base_size=16)
        assert diag.diagonalized
        w_ref = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(
            np.sort(np.asarray(diag.eigenvalues)), w_ref, atol=1e-8
        )
        np.testing.assert_allclose(np.asarray(diag.dense()), a, atol=1e-8)

    def test_pca_mesh_matches_local(self, rng):
        from dissect_tpu.model.kernels import Kernel, KernelType
        from dissect_tpu.pca.pca import compute_pca

        n = 40
        a = _random_spd(rng, n, spread=0.2)
        keys = [f"F{i}@I{i}" for i in range(n)]
        kern = Kernel(
            name="GRM", type=KernelType.GRM, individual_keys=keys, matrix=a
        )
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("i",))
        p_local = compute_pca(kern, n_components=5, randomized=False)
        p_mesh = compute_pca(kern, n_components=5, randomized=False, mesh=mesh)
        np.testing.assert_allclose(
            p_mesh.eigenvalues, p_local.eigenvalues, rtol=1e-9, atol=1e-10
        )
        # eigenvectors match up to column sign
        for j in range(5):
            c = np.dot(p_mesh.eigenvectors[:, j], p_local.eigenvectors[:, j])
            np.testing.assert_allclose(abs(c), 1.0, atol=1e-8)


class TestBigKOrthonormalize:
    def test_host_assisted_cholqr_on_square_gaussian_conditioning(self, rng):
        """The spectral split samples EXACTLY k probes from a rank-k
        projector, so the basis is square-Gaussian-conditioned
        (kappa ~ 2k); by k~6000 fp32 CholeskyQR2's Gram is singular at
        working precision (measured on v5e round 5: NaN basis at
        n=10240, 1.7% trace loss at n=16384).  The big-k path must
        produce an orthonormal basis anyway via the host f64 Gram
        Cholesky.  Simulated here with an explicitly ill-conditioned
        tall fp32 operand above the _HOST_QR_K routing threshold."""
        from dissect_tpu.linalg.dc_eigen import _HOST_QR_K, _orthonormalize

        m, k = 2 * _HOST_QR_K + 512, _HOST_QR_K + 256
        q_left, _ = np.linalg.qr(rng.standard_normal((m, k)))
        sv = np.logspace(0, -5.5, k)  # cond ~ 3e5: fp32 Gram noise floor
        y = (q_left * sv[None, :]).astype(np.float32)
        # production callers (PCA, kernel diagonalization) run WITHOUT
        # x64 — the Gram must not silently truncate to f32 there
        with jax.enable_x64(False):
            q = np.asarray(_orthonormalize(jnp.asarray(y)))
        assert np.isfinite(q).all()
        np.testing.assert_allclose(
            q.T @ q, np.eye(k, dtype=np.float64), atol=5e-5
        )
        # same span as y: projecting y onto q loses nothing
        resid = y - q @ (q.T @ y)
        assert np.linalg.norm(resid) / np.linalg.norm(y) < 1e-3
