"""Distributed (shard_map) Cholesky / triangular solve on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh


@pytest.fixture
def mesh1d():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("i",))


class TestDistributedCholesky:
    def _spd(self, rng, n):
        a = rng.normal(size=(n, n))
        return a @ a.T + n * np.eye(n)

    def test_factor_and_logdet(self, rng, mesh1d):
        from dissect_tpu.linalg.distributed import distributed_cholesky

        n = 512
        a = self._spd(rng, n)
        l, logdet = distributed_cholesky(jnp.asarray(a), mesh1d, "i", block=64)
        np.testing.assert_allclose(
            np.asarray(l), np.linalg.cholesky(a), atol=1e-10
        )
        assert float(logdet) == pytest.approx(np.linalg.slogdet(a)[1], rel=1e-12)

    def test_block_not_aligned_with_devices(self, rng, mesh1d):
        """Block smaller than the per-device row count, non-power-of-two
        relation between blocks and shards."""
        from dissect_tpu.linalg.distributed import distributed_cholesky

        n = 256
        a = self._spd(rng, n)
        l, _ = distributed_cholesky(jnp.asarray(a), mesh1d, "i", block=32)
        np.testing.assert_allclose(
            np.asarray(l), np.linalg.cholesky(a), atol=1e-10
        )

    def test_triangular_and_spd_solve(self, rng, mesh1d):
        from dissect_tpu.linalg.distributed import (
            distributed_cholesky,
            distributed_spd_solve,
            distributed_triangular_solve,
        )

        n = 256
        a = self._spd(rng, n)
        b = rng.normal(size=(n, 7))
        l, _ = distributed_cholesky(jnp.asarray(a), mesh1d, "i", block=32)
        x = distributed_triangular_solve(l, jnp.asarray(b), mesh1d, "i", block=32)
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(np.linalg.cholesky(a), b), atol=1e-10
        )
        xs, logdet = distributed_spd_solve(
            jnp.asarray(a), jnp.asarray(b), mesh1d, "i", block=32
        )
        np.testing.assert_allclose(np.asarray(xs), np.linalg.solve(a, b), atol=1e-10)
        assert float(logdet) == pytest.approx(np.linalg.slogdet(a)[1], rel=1e-12)
