"""Native decoder parity + multi-device sharding behavior on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import make_dosage


class TestNativeDecoder:
    def test_parity_with_numpy(self, rng):
        from dissect_tpu.io.bed import _BYTE_LUT
        from dissect_tpu.native import bed_native

        if not bed_native.available():
            pytest.skip("native toolchain unavailable")
        rows = rng.integers(0, 256, size=(64, 9), dtype=np.uint8)
        n = 33
        out = bed_native.decode(rows, n)
        ref = _BYTE_LUT[rows].reshape(64, -1)[:, :n]
        np.testing.assert_array_equal(out, ref)

    def test_counts(self, rng):
        from dissect_tpu.io.bed import _BYTE_LUT
        from dissect_tpu.native import bed_native

        if not bed_native.available():
            pytest.skip("native toolchain unavailable")
        rows = rng.integers(0, 256, size=(16, 5), dtype=np.uint8)
        n = 18
        counts = bed_native.genotype_counts(rows, n)
        ref = _BYTE_LUT[rows].reshape(16, -1)[:, :n]
        for r in range(16):
            for c, d in enumerate([-1, 0, 1, 2]):
                assert counts[r, c] == (ref[r] == d).sum()


class TestSharding:
    def test_mesh_context(self):
        from dissect_tpu.runtime.mesh import MeshContext

        assert len(jax.devices()) == 8
        ctx = MeshContext.create()
        assert ctx.mesh.devices.shape == (2, 4)
        assert ctx.n_devices == 8

    def test_sharded_grm_matches_unsharded(self, rng):
        from dissect_tpu.io.bed import compute_snp_stats
        from dissect_tpu.linalg.syrk import grm_accumulator
        from dissect_tpu.runtime.mesh import MeshContext
        from jax.sharding import PartitionSpec

        ctx = MeshContext.create()
        dosage = make_dosage(rng, 64, 32, missing_rate=0.05)
        stats = compute_snp_stats(dosage)
        inv_std = 1.0 / stats.std

        plain = grm_accumulator(32, dtype=jnp.float64)
        plain.update(dosage, stats.mean, inv_std)
        k_ref, c_ref = plain.finalize()

        sharded = grm_accumulator(
            32, dtype=jnp.float64, sharding=ctx.sharding(PartitionSpec("i", "j"))
        )
        with ctx.mesh:
            sharded.update(dosage, stats.mean, inv_std)
            k_sh, c_sh = sharded.finalize()
        np.testing.assert_allclose(np.asarray(k_sh), np.asarray(k_ref), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref), rtol=1e-12)

    def test_reml_quantities_with_sharded_kernel(self, rng):
        """The dense REML core must produce identical numbers when its
        kernel matrix lives sharded on the mesh."""
        from dissect_tpu.reml.builders import build_variance_model
        from dissect_tpu.reml.engine import REMLEngine
        from dissect_tpu.runtime.mesh import MeshContext

        ctx = MeshContext.create()
        n = 32
        a = rng.normal(size=(4 * n, n))
        k = a.T @ a / (4 * n)
        y = rng.normal(size=n)
        x = np.ones((n, 1))
        model = build_variance_model([k], ["GRM"], [1.0], [0.5])
        engine = REMLEngine(model, y, x)
        theta = jnp.asarray([0.5, 0.5])
        q_plain = engine._quantities(theta)

        model_sh = build_variance_model([k], ["GRM"], [1.0], [0.5])
        engine_sh = REMLEngine(model_sh, y, x)
        engine_sh.cc = jax.tree_util.tree_map(
            lambda m: jax.device_put(m, ctx.sharding(P(None, "i", "j")))
            if m.ndim == 3
            else m,
            engine_sh.cc,
        )
        with ctx.mesh:
            q_sh = engine_sh._quantities(theta)
        np.testing.assert_allclose(
            np.asarray(q_sh["grad"]), np.asarray(q_plain["grad"]), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(q_sh["ai"]), np.asarray(q_plain["ai"]), rtol=1e-10
        )

    def test_graft_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestPallasSyrk:
    def test_interpret_parity(self, rng):
        """Triangle-only Pallas syrk matches Z'Z (interpret mode on CPU;
        the compiled path is exercised on TPU by the bench)."""
        import jax.numpy as jnp

        from dissect_tpu.linalg.pallas_syrk import syrk_triangle

        z = rng.normal(size=(96, 80)).astype(np.float32)
        out = syrk_triangle(
            jnp.asarray(z), block_n=32, block_m=32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), z.T @ z, rtol=2e-5, atol=1e-4)

    def test_packed_accumulator(self, rng):
        """Streaming GRM with packed-triangle accumulation matches the
        dense XLA accumulator (unpacked once at finalize)."""
        import jax.numpy as jnp

        from dissect_tpu.linalg.syrk import grm_accumulator
        from tests.conftest import make_dosage

        n, m, chunk = 72, 96, 32
        d = make_dosage(rng, m, n, missing_rate=0.05)
        p2 = np.clip(np.where(d >= 0, d, 0).sum(1) / (2.0 * (d >= 0).sum(1)), 0.05, 0.95)
        mean = 2.0 * p2
        inv_std = 1.0 / np.sqrt(2.0 * p2 * (1.0 - p2))

        acc_ref = grm_accumulator(n, dtype=jnp.float32)
        acc_tri = grm_accumulator(
            n, dtype=jnp.float32, triangle=True, block_n=16, block_m=16,
            interpret=True,
        )
        for s in range(0, m, chunk):
            sl = slice(s, s + chunk)
            acc_ref.update(d[sl], mean[sl], inv_std[sl])
            acc_tri.update(d[sl], mean[sl], inv_std[sl])
        k_ref, c_ref = acc_ref.finalize()
        k_tri, c_tri = acc_tri.finalize()
        np.testing.assert_allclose(np.asarray(k_tri), np.asarray(k_ref), rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_tri), np.asarray(c_ref), rtol=2e-5, atol=1e-4)
