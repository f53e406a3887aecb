"""Adversarial numerics: the failure paths, not the happy paths.

VERDICT r03 task 7 — each of the framework's numerical-failure
handlers gets a test that actually drives it:

  * clustered-spectrum GRMs through the fp32 distributed eigensolver
    (the shift-candidate machinery; a ridge puts hundreds of
    eigenvalues at exactly the same value — sign(A - sigma I) is not
    an involution when sigma lands on the cluster);
  * rank-deficient designs through the dependent-column QR drop
    (matrix.cpp:3501-3600) and through the engine's Cholesky->LU
    fallback for X'ViX;
  * constraint method M3 (step rescaling) engaged repeatedly,
    including the scaling-underflow guard
    (covariancematrix.cpp:1430-1499);
  * the fp32 stall rescue at n = 8192 — the precision-floor limit
    cycle the float64 endgame exists for (reml.cpp:1673-1724).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


@pytest.fixture
def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("i",))


def test_clustered_spectrum_eigh_fp32(mesh8, rng):
    """Low-rank + ridge (a diagonalized GRM's true shape): 480 of 512
    eigenvalues are EXACTLY the ridge.  The fp32 D&C must either split
    around the cluster via its shift candidates or fall back locally —
    and the returned spectrum must be right either way."""
    n, r = 512, 32
    b = rng.standard_normal((n, r)).astype(np.float32) / np.sqrt(r)
    a = (b @ b.T + 0.5 * np.eye(n)).astype(np.float32)
    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    w, v = distributed_eigh(
        jnp.asarray(a), mesh=mesh8, base_size=128,
        allow_local_fallback=True,
    )
    w_ref = np.linalg.eigh(a.astype(np.float64))[0]
    w_np = np.sort(np.asarray(w).astype(np.float64))
    # fp32 input: absolute accuracy at the 1e-4 * ||A|| level
    np.testing.assert_allclose(w_np, w_ref, atol=5e-4 * abs(w_ref).max())
    # eigenvector residual ||A v - v w||
    vv = np.asarray(v).astype(np.float64)
    resid = np.abs(
        a.astype(np.float64) @ vv - vv * np.asarray(w).astype(np.float64)
    ).max()
    assert resid < 5e-3 * abs(w_ref).max()


def test_identical_spectrum_raises_without_fallback(mesh8):
    """Pure ridge: no interior split exists at any shift.  Above
    base_size this must raise, not silently gather (pdsyev failure
    aborts in the reference, matrix.cpp:3327-3380)."""
    from dissect_tpu.linalg.dc_eigen import distributed_eigh

    a = 2.5 * np.eye(256, dtype=np.float32)
    with pytest.raises(RuntimeError, match="no valid spectral split"):
        distributed_eigh(jnp.asarray(a), mesh=mesh8, base_size=64)


def test_dependent_columns_rank_deficient_design(rng):
    """Duplicated + linearly-combined columns are flagged greedily
    (getDependentColumns, matrix.cpp:3501-3600)."""
    from dissect_tpu.linalg.qr import dependent_columns

    n = 200
    x1 = rng.standard_normal(n)
    x2 = rng.standard_normal(n)
    a = np.column_stack([
        np.ones(n), x1, x2,
        x1,                  # exact duplicate -> dependent
        2.0 * x1 - x2,       # linear combination -> dependent
        rng.standard_normal(n),
    ])
    dep = set(dependent_columns(a).tolist())
    assert dep == {3, 4}


def test_engine_survives_near_singular_x(rng):
    """X with a (numerically) duplicated column: X'ViX is singular for
    Cholesky; the LU fallback must keep the fit finite, or the engine
    must stop with success=False — never NaN outputs."""
    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.engine import REMLEngine, REMLOptions

    n = 96
    z = rng.standard_normal((4 * n, n))
    k = z.T @ z / (4 * n)
    el = np.linalg.cholesky(k + 1e-8 * np.eye(n))
    y = el @ rng.standard_normal(n) + rng.standard_normal(n)
    c = rng.standard_normal(n)
    x = np.column_stack([np.ones(n), c, c + 1e-9 * rng.standard_normal(n)])
    model = build_variance_model([k], ["GRM"], [np.var(y, ddof=1)], [0.5])
    res = REMLEngine(
        model, y, x, REMLOptions(float64_refine=False)
    ).fit()
    if res.success:
        assert np.isfinite(res.log_likelihood)
        assert np.isfinite(res.variances).all()
    # a failed fit must have stopped cleanly, not produced NaN theta
    assert np.isfinite(res.variances).all()


def test_m3_rescale_repeated_and_underflow(rng):
    """M3 rescales the step by w^k until no variance is negative; a
    step that can never be feasible must raise the underflow guard
    instead of looping forever (covariancematrix.cpp:1430-1499)."""
    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.engine import REMLEngine

    n = 32
    k = np.eye(n)
    model = build_variance_model([k], ["GRM"], [1.0], [0.5])
    eng = REMLEngine(model, rng.standard_normal(n), np.ones((n, 1)))

    # several rescale rounds: delta drives both variances far negative
    theta, scaling = eng._constrain_m3(
        np.array([1.0, 1.0]), np.array([-30.0, -50.0])
    )
    assert (theta >= 0).all()
    assert scaling < 0.3 ** 1 + 1e-12  # at least two rounds
    # 1 - 50 * 0.3^k >= 0 first holds at k = 4
    assert scaling == pytest.approx(0.3 ** 4)

    # infeasible: old_theta = 0 and negative delta can never recover
    with pytest.raises(RuntimeError, match="underflow"):
        eng._constrain_m3(np.array([0.0, 1.0]), np.array([-1.0, 0.0]))


def test_majority_constrained_first_step_stops(rng):
    """>50% of parameters constrained in the FIRST step stops the fit
    with success=False (reml.cpp:1638-1669) — exercised with an
    anti-genetic phenotype that drives the genetic variances negative
    immediately."""
    from dissect_tpu.model.covariance import (
        CovarianceModel,
        EffectType,
        ParameterType,
        VarianceTransform,
    )
    from dissect_tpu.reml.engine import REMLEngine, REMLOptions

    n = 64
    rng2 = np.random.default_rng(7)
    z = rng2.standard_normal((n, 8))
    k1 = z @ z.T / 8 + 1e-6 * np.eye(n)
    model = CovarianceModel(n)
    model.insert_matrix("K1", k1)
    model.insert_matrix("K2", k1 * 0.5)
    model.insert_matrix("K3", k1 * 2.0)
    model.insert_matrix("E", np.eye(n))
    model.insert_variance_group("Phenotype_1", 1.0)
    for name, init in (("Var(K1)", -0.2), ("Var(K2)", -0.2),
                       ("Var(K3)", -0.2), ("Var(E)", 1.0)):
        model.insert_variance(
            name, "Phenotype_1", ParameterType.VARIANCE,
            EffectType.GENETIC if name != "Var(E)" else EffectType.ENVIRONMENT,
            init,
        )
    for mat, var in (("K1", "Var(K1)"), ("K2", "Var(K2)"),
                     ("K3", "Var(K3)"), ("E", "Var(E)")):
        model.insert_element(mat, f"el_{mat}", mat)
        model.append_variance_to_element(
            f"el_{mat}", var, VarianceTransform.NOCHANGE
        )
    y = rng2.standard_normal(n)
    res = REMLEngine(
        model, y, np.ones((n, 1)),
        REMLOptions(first_step_em=False, float64_refine=False),
    ).fit()
    # three of four variances start negative -> M1 constrains >50% in
    # the first AI step -> hard stop
    assert not res.success


def test_fp32_stall_rescue_at_8k(rng):
    """n = 8192 fp32 dense REML: at this size the fp32 logL noise floor
    exceeds the 1e-4 convergence window, so the fit must finish through
    the float64 endgame (stall rescue or precision-switch acceptance)
    and still land on the planted heritability."""
    from dissect_tpu.reml.builders import build_variance_model
    from dissect_tpu.reml.engine import REMLEngine, REMLOptions

    n, r = 8192, 256
    b = rng.standard_normal((n, r)).astype(np.float32) / np.sqrt(r)
    k = b @ b.T
    d = np.sqrt(np.maximum(np.diagonal(k), 1e-3))
    k = (k / d[:, None] / d[None, :]).astype(np.float64)
    h2 = 0.5
    g = (b @ rng.standard_normal(r).astype(np.float32)) / d
    y = np.sqrt(h2) * g / g.std() + np.sqrt(1 - h2) * rng.standard_normal(n)
    x = np.ones((n, 1))
    model = build_variance_model([k], ["GRM"], [float(np.var(y, ddof=1))], [0.5])
    opts = REMLOptions(max_iterations=30, float64_refine_max_n=n + 1)
    res = REMLEngine(model, y, x, opts, dtype=jnp.float32).fit()
    assert res.success
    vg, ve = res.variances[0], res.variances[1]
    h2_fit = vg / (vg + ve)
    assert abs(h2_fit - h2) < 0.06
