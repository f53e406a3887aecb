"""Block-cyclic SPD kernels + eigensolver outer-loop behavior.

Parity: the reference's 64x64 block-cyclic BLACS layout keeps every
process busy through pdpotrf_'s trailing updates
(communicator.cpp:82-96); here the same balance comes from factoring
P A P^T with the cyclic symmetric permutation, with solves returned in
original coordinates.  The eigensolver must raise (not silently gather)
when a spectral split fails above base_size (matrix.cpp:3327-3380
aborts on pdsyev failure).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("i",))


def _spd(rng, n):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def test_cyclic_permutation_layout():
    from dissect_tpu.linalg.distributed import cyclic_block_permutation

    perm = cyclic_block_permutation(64, 4, 4)
    # shard 0 (rows 0..15 of the permuted matrix) holds original blocks
    # 0, 4, 8, 12 -> original rows 0-3, 16-19, 32-35, 48-51
    assert list(perm[:8]) == [0, 1, 2, 3, 16, 17, 18, 19]
    assert sorted(perm) == list(range(64))
    with pytest.raises(ValueError):
        cyclic_block_permutation(60, 4, 8)


def test_spd_inverse_logdet_cyclic(mesh, rng):
    from dissect_tpu.linalg.distributed import spd_inverse_logdet_cyclic

    n, block = 64, 4
    a = _spd(rng, n)
    spec = NamedSharding(mesh, P("i", None))
    aj = jax.device_put(jnp.asarray(a), spec)
    vi, logdet = jax.jit(
        spd_inverse_logdet_cyclic, static_argnames=("mesh", "axis", "block")
    )(aj, mesh=mesh, axis="i", block=block)
    np.testing.assert_allclose(
        np.asarray(vi), np.linalg.inv(a), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        float(logdet), np.linalg.slogdet(a)[1], rtol=1e-10
    )


def test_spd_solve_cyclic(mesh, rng):
    from dissect_tpu.linalg.distributed import spd_solve_cyclic

    n, block = 96, 4
    a = _spd(rng, n)
    b = rng.standard_normal((n, 5))
    x, logdet = spd_solve_cyclic(
        jnp.asarray(a), jnp.asarray(b), mesh, "i", block
    )
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a, b), rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        float(logdet), np.linalg.slogdet(a)[1], rtol=1e-10
    )


def test_distributed_engine_uses_cyclic_and_matches_local(mesh, rng):
    """End-to-end: the cyclic-factorization engine reproduces the local
    engine's fit on an indivisible N (padding + permutation compose)."""
    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.distributed_engine import DistributedREMLEngine
    from dissect_tpu.reml.engine import REMLEngine

    n = 70  # pads to 8 dev * 8 block = 128... exercises pad+perm
    z = rng.standard_normal((40, n))
    k = z.T @ z / 40
    y = rng.standard_normal(n)
    x = np.ones((n, 1))
    model = build_variance_model([k], ["GRM"], [float(np.var(y))], [0.5])
    local = REMLEngine(model, y, x).fit()
    model2 = build_variance_model([k], ["GRM"], [float(np.var(y))], [0.5])
    dist = DistributedREMLEngine(model2, y, x, mesh).fit()
    assert local.success and dist.success
    np.testing.assert_allclose(
        dist.variances, local.variances, rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        dist.log_likelihood, local.log_likelihood, rtol=1e-8
    )


def test_interleaved_trtri_lauum_pipeline(mesh, rng):
    """The in-place pdpotri stages: chol -> trtri -> lauum with the
    interleaved elimination order reproduce inv(A) stage by stage."""
    from dissect_tpu.linalg.distributed import (
        distributed_cholesky,
        distributed_lauum_full,
        distributed_triangular_solve,
        distributed_triangular_solve_t,
        distributed_trtri,
    )

    n, block, G = 128, 4, 8
    a = _spd(rng, n)
    l, logdet = distributed_cholesky(
        jnp.asarray(a), mesh, "i", block, interleave=G
    )
    np.testing.assert_allclose(
        float(logdet), np.linalg.slogdet(a)[1], rtol=1e-10
    )
    # the factor satisfies L L^T = A in es-permuted coordinates: check
    # through the solves instead of the raw factor
    b = rng.standard_normal((n, 3))
    y = distributed_triangular_solve(
        l, jnp.asarray(b), mesh, "i", block, interleave=G
    )
    x = distributed_triangular_solve_t(l, y, mesh, "i", block, interleave=G)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a, b), rtol=1e-8, atol=1e-9
    )
    w = distributed_trtri(l, mesh, "i", block, interleave=G)
    vi = distributed_lauum_full(w, mesh, "i", block, interleave=G)
    np.testing.assert_allclose(
        np.asarray(vi), np.linalg.inv(a), rtol=1e-8, atol=1e-10
    )
    # full symmetric output — both triangles present
    np.testing.assert_allclose(
        np.asarray(vi), np.asarray(vi).T, rtol=0, atol=1e-12
    )


def test_sequential_trtri_matches_numpy(mesh, rng):
    """interleave=1: the factor is plainly triangular and trtri gives
    the literal L^{-1}."""
    from dissect_tpu.linalg.distributed import (
        distributed_cholesky,
        distributed_trtri,
    )

    n, block = 64, 8
    a = _spd(rng, n)
    l, _ = distributed_cholesky(jnp.asarray(a), mesh, "i", block)
    w = distributed_trtri(l, mesh, "i", block)
    np.testing.assert_allclose(
        np.asarray(w), np.linalg.inv(np.linalg.cholesky(a)),
        rtol=1e-8, atol=1e-10,
    )


def test_eigh_raises_instead_of_silent_gather(mesh, rng):
    """Above base_size with a mesh, an impossible split must raise, not
    fall back to a one-device eigh."""
    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    # identity spectrum: every shift lands ON the (single) eigenvalue,
    # sign(A - sigma I) can never produce an interior rank split
    a = np.eye(48)
    with pytest.raises(RuntimeError, match="no valid spectral split"):
        distributed_eigh(a, mesh=mesh, block=2, base_size=16)
    # the explicit opt-in restores the old behavior
    w, v = distributed_eigh(
        a, mesh=mesh, block=2, base_size=16, allow_local_fallback=True
    )
    np.testing.assert_allclose(np.asarray(w), np.ones(48), rtol=1e-12)


def test_eigh_sharded_outer_loop_accuracy(mesh, rng):
    """Full D&C with sharded range finding / Rayleigh quotients matches
    numpy to fp64 accuracy on a well-separated spectrum."""
    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    n = 96
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w_true = np.linspace(0.5, 12.0, n)
    a = (q * w_true) @ q.T
    w, v = distributed_eigh(jnp.asarray(a), mesh=mesh, block=4, base_size=24)
    np.testing.assert_allclose(np.asarray(w), w_true, rtol=1e-9, atol=1e-10)
    recon = np.asarray(v) * np.asarray(w) @ np.asarray(v).T
    np.testing.assert_allclose(recon, a, rtol=1e-8, atol=1e-8)
