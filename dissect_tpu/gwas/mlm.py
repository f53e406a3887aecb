"""Mixed-model GWAS — batched GLS and vmapped per-SNP ML refits.

Parity: GWAS::computeGLMWithCovariance (gwas.cpp:787-914): each SNP's
incidence [X | g] is fit by ML with the null-model covariance kernel,
warm-started variances, chi2 Wald tests with p = chi2_sf(1, chi2)
(gwas.cpp:900-903).  After >10 tests the reference disables EM first
steps and step damping (gwas.cpp:836-841) — i.e. plain Newton — which
is what the batched path runs from the start.

Two TPU-native execution strategies replace the serial loop + grouped
communicators (gwas.cpp:557-687):

  mlm_gwas_fixed_v    EMMAX-style: variances fixed at the null fit, the
                      per-SNP GLS solves collapse into block-inverse
                      einsums over the SNP axis (two large matmuls).

  mlm_gwas_ml_refit   exact parity with the per-SNP ML refit: the null
                      covariance kernel is eigendecomposed once, y/X/G
                      rotate into the eigenbasis (gwas.cpp:189-209)
                      where V(theta) = t1*diag(lambda) + t2*I is
                      diagonal, and a Fisher-scoring ML Newton runs
                      vmapped over all SNPs at once — O(n) per SNP per
                      iteration instead of O(n^3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.gwas.ols import GwasResults
from dissect_tpu.linalg.small import (
    inv_spd_auto,
    inv_spd_small,
    solve_spd_auto,
    solve_spd_small,
)
from dissect_tpu.runtime.stats import chi2_sf
from dissect_tpu.runtime.distributed_io import to_host


def use_pallas_moments(q: int) -> bool:
    """True when the fused Pallas moments kernel applies: TPU backend
    and the packed column layout fits one lane group (q = covars+1)."""
    from dissect_tpu.gwas.pallas_moments import LANES, moment_columns

    n_pairs = q * (q + 1) // 2
    k_feats = 2 * n_pairs + 3
    return (
        jax.default_backend() == "tpu"
        and moment_columns(q, k_feats)[-1] <= LANES
    )


@jax.jit
def _gls_core(g, y, x, vi):
    """Batched GLS with fixed V^-1: block-inverse over the SNP axis."""
    vix = vi @ x
    viy = vi @ y
    a = x.T @ vix
    a_inv = jnp.linalg.inv(a)
    b0 = a_inv @ (x.T @ viy)
    y_res_vi = viy - vix @ b0  # Vi (y - X b0) = P0 y

    gvi = g @ vi  # (M, n)
    u = g @ vix  # (M, c)
    au = u @ a_inv
    d = jnp.einsum("mi,mi->m", gvi, g) - jnp.einsum("mc,mc->m", u, au)
    d_safe = jnp.where(d > 0, d, jnp.inf)
    b_snp = (g @ y_res_vi) / d_safe
    b_cov = b0[None, :] - au * b_snp[:, None]
    return b_snp, b_cov, d_safe, au, jnp.diagonal(a_inv)


def mlm_gwas_fixed_v(genotypes, y, x, v_inv, dtype=None) -> GwasResults:
    """Mixed-model GWAS with variances fixed at the null-model fit.

    v_inv: (n, n) inverse covariance from the null REML fit.  SEs come
    straight from the GLS information (no MSE factor); chi2 Wald tests
    (gwas.cpp:898-903).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    g = jnp.asarray(genotypes, dtype=dtype)
    yv = jnp.asarray(y, dtype=dtype)
    xm = jnp.asarray(x, dtype=dtype)
    vi = jnp.asarray(v_inv, dtype=dtype)
    b_snp, b_cov, d, au, a_inv_diag = _gls_core(g, yv, xm, vi)

    # to_host: these lead with the (possibly multi-host) sharded SNP
    # axis — np.asarray would raise on not-fully-addressable arrays
    d = to_host(d)
    snp_se = np.sqrt(1.0 / d)
    snp_beta = to_host(b_snp)
    chi2 = snp_beta**2 * d
    snp_p = chi2_sf(1, chi2)
    cov_var = np.asarray(a_inv_diag)[None, :] + to_host(au) ** 2 / d[:, None]
    cov_se = np.sqrt(cov_var)
    cov_beta = to_host(b_cov)
    cov_chi2 = (cov_beta / cov_se) ** 2
    return GwasResults(
        snp_beta=snp_beta,
        snp_se=snp_se,
        snp_stat=chi2,
        snp_p=snp_p,
        cov_beta=cov_beta,
        cov_se=cov_se,
        cov_p=chi2_sf(1, cov_chi2),
        df=1.0,
        model="MLM-fixedV",
        # with V fixed the LRT of adding the SNP is exactly
        # delta(r'V^-1 r) = b^2 d = the Wald chi2
        group_p=snp_p,
    )


def _ml_fit_diagonal(lam, y, xg, theta0, n_iterations):
    """Fisher-scoring ML fit of V = t1*diag(lam) + t2*I for one SNP.

    Mirrors the reference's embedded ML REML with the ML-F matrix
    (computeMLFMatrix, reml.cpp:2051-2157): gradient_k =
    0.5*(y'P dV P y - tr(Vi dV)), F_kl = 0.5 tr(Vi dV_k Vi dV_l).
    Variances are clamped positive (constraint M1,
    covariancematrix.cpp:1183).
    """
    floor = 1e-6 * (theta0[0] + theta0[1])

    def body(_, theta):
        v = theta[0] * lam + theta[1]
        vi = 1.0 / v
        xgvi = xg * vi[:, None]
        a = xgvi.T @ xg
        a_inv = inv_spd_auto(a)  # SPD design Gram (vmapped per SNP/group)
        b = a_inv @ (xgvi.T @ y)
        r = y - xg @ b
        pyr = vi * r  # P y in the ML profile sense
        grad = 0.5 * jnp.array(
            [
                jnp.sum(pyr * lam * pyr) - jnp.sum(vi * lam),
                jnp.sum(pyr * pyr) - jnp.sum(vi),
            ]
        )
        vi2 = vi * vi
        f = 0.5 * jnp.array(
            [
                [jnp.sum(vi2 * lam * lam), jnp.sum(vi2 * lam)],
                [jnp.sum(vi2 * lam), jnp.sum(vi2)],
            ]
        )
        delta = solve_spd_small(f, grad)  # 2x2 ML-F system
        theta = theta + delta
        return jnp.maximum(theta, floor)

    theta = jax.lax.fori_loop(0, n_iterations, body, theta0)
    # final fixed-effect estimates at the fitted variances
    v = theta[0] * lam + theta[1]
    vi = 1.0 / v
    xgvi = xg * vi[:, None]
    a = xgvi.T @ xg
    a_inv = inv_spd_auto(a)
    b = a_inv @ (xgvi.T @ y)
    r = y - xg @ b
    logl = -0.5 * (jnp.sum(jnp.log(v)) + jnp.sum(r * r * vi))
    # convergence marker: residual variance-gradient norm (non-converged
    # per-SNP fits are reported to .gwas.unfitted, gwas.cpp:546-554)
    pyr = vi * r
    grad = 0.5 * jnp.array(
        [
            jnp.sum(pyr * lam * pyr) - jnp.sum(vi * lam),
            jnp.sum(pyr * pyr) - jnp.sum(vi),
        ]
    )
    grad_norm = jnp.max(jnp.abs(grad))
    return b, jnp.diagonal(a_inv), theta, logl, grad_norm


@partial(jax.jit, static_argnames=("n_iterations",))
def _ml_refit_core_vmapped(g_rot, y_rot, x_rot, lam, theta0, n_iterations):
    """Reference formulation: one `_ml_fit_diagonal` per SNP, vmapped.
    Kept as the oracle for the moment-form fast path below."""

    def one(gcol):
        xg = jnp.concatenate([x_rot, gcol[:, None]], axis=1)
        return _ml_fit_diagonal(lam, y_rot, xg, theta0, n_iterations)

    return jax.vmap(one)(g_rot)


@partial(jax.jit, static_argnames=("n_iterations", "use_pallas"))
def _ml_refit_core(g_rot, y_rot, x_rot, lam, theta0, n_iterations,
                   use_pallas=False):
    """Moment-form per-SNP ML refits: the hot path.

    The vmapped formulation materializes the (M, n, c+1) batched design
    [X | g] and re-reads it several times per Fisher-scoring iteration
    — HBM-bound.  Here every per-SNP sum the iteration needs is a
    weighted moment of the SHARED columns s = [X | y] (and of g), so
    one iteration is two MXU matmuls (M,n)@(n,K) with the per-SNP
    weight rows w = 1/(t1*lam + t2) and w^2, three weighted-g products,
    and batched (c+1)x(c+1) solves — identical math to
    `_ml_fit_diagonal` (gradient, ML-F matrix, M1 clamp), ~5x less
    HBM traffic.
    """
    m_snps, n = g_rot.shape
    c = x_rot.shape[1]
    q = c + 1
    s = jnp.concatenate([x_rot, y_rot[:, None]], axis=1)  # (n, c+1)
    pairs = [(i, j) for i in range(c + 1) for j in range(i, c + 1)]
    n_pairs = len(pairs)
    ss = jnp.stack([s[:, i] * s[:, j] for i, j in pairs], axis=1)
    feats = jnp.concatenate(
        [
            ss,
            lam[:, None] * ss,
            lam[:, None],
            jnp.ones((n, 1), s.dtype),
            (lam * lam)[:, None],
        ],
        axis=1,
    )  # (n, K): [s⊗s | lam·s⊗s | lam | 1 | lam²]
    idx_np = np.zeros((c + 1, c + 1), np.int32)
    for k_, (i, j) in enumerate(pairs):
        idx_np[i, j] = idx_np[j, i] = k_
    idx = jnp.asarray(idx_np)
    col_lam, col_one, col_lam2 = 2 * n_pairs, 2 * n_pairs + 1, 2 * n_pairs + 2
    floor = 1e-6 * (theta0[0] + theta0[1])

    def quad(mss_w, gs_w, gg_w, b):
        """e' M_w e for e = [-b_x, -b_g, 1] on t = [x, g, y]:
        the w-weighted residual sum-of-squares."""
        bx, bg = b[:, :c], b[:, c]
        return (
            mss_w[:, c, c]
            + jnp.einsum("mi,mij,mj->m", bx, mss_w[:, :c, :c], bx)
            + bg * bg * gg_w
            - 2.0 * jnp.einsum("mi,mi->m", bx, mss_w[:, :c, c])
            - 2.0 * bg * gs_w[:, c]
            + 2.0 * bg * jnp.einsum("mi,mi->m", bx, gs_w[:, :c])
        )

    k_feats = feats.shape[1]

    def moments_xla(thetas):
        v = thetas[:, :1] * lam[None, :] + thetas[:, 1:]
        vi = 1.0 / v
        vi2 = vi * vi
        m1 = vi @ feats  # (M, K) weight vi
        m2 = vi2 @ feats  # (M, K) weight vi^2
        g1 = vi * g_rot
        g2 = vi2 * g_rot
        g3 = g2 * lam[None, :]
        gs1, gs2, gs3 = g1 @ s, g2 @ s, g3 @ s
        gg1 = jnp.einsum("mn,mn->m", g1, g_rot)
        gg2 = jnp.einsum("mn,mn->m", g2, g_rot)
        gg3 = jnp.einsum("mn,mn->m", g3, g_rot)
        return m1, m2, gs1, gs2, gs3, gg1, gg2, gg3, v, vi

    def moments_fused(thetas):
        # one HBM pass over g_rot per iteration (gwas/pallas_moments.py)
        from dissect_tpu.gwas.pallas_moments import (
            fused_refit_moments,
            moment_columns,
        )

        c0_m1, c0_m2, c0_g1, c0_g2, c0_g3, c0_gg, _ = moment_columns(
            c + 1, k_feats
        )
        mom = fused_refit_moments(g_rot, thetas, lam, s, feats)
        v = thetas[:, :1] * lam[None, :] + thetas[:, 1:]
        return (
            mom[:, c0_m1:c0_m1 + k_feats],
            mom[:, c0_m2:c0_m2 + k_feats],
            mom[:, c0_g1:c0_g1 + c + 1],
            mom[:, c0_g2:c0_g2 + c + 1],
            mom[:, c0_g3:c0_g3 + c + 1],
            mom[:, c0_gg],
            mom[:, c0_gg + 1],
            mom[:, c0_gg + 2],
            v,
            1.0 / v,
        )

    def quantities(thetas):
        m1, m2, gs1, gs2, gs3, gg1, gg2, gg3, v, vi = (
            moments_fused if use_pallas else moments_xla
        )(thetas)
        mss1 = m1[:, idx]  # (M, c+1, c+1) s-moments, weight vi
        mss2 = m2[:, idx]
        mss3 = m2[:, n_pairs + idx]  # weight vi^2 * lam
        a_mat = jnp.concatenate(
            [
                jnp.concatenate(
                    [mss1[:, :c, :c], gs1[:, :c, None]], axis=2
                ),
                jnp.concatenate(
                    [gs1[:, None, :c], gg1[:, None, None]], axis=2
                ),
            ],
            axis=1,
        )  # (M, q, q) = [X|g]' Vi [X|g]
        rhs = jnp.concatenate([mss1[:, :c, c], gs1[:, c:]], axis=1)
        # a_mat is the SPD GLS Gram matrix; the unrolled (q,q) Cholesky
        # solve avoids XLA's batched-LU pivot loops below MAX_UNROLL_Q
        # (above it — many-PC designs — the auto variant falls back to
        # batched LU so the unrolled graph can't blow up compile time).
        # Rank-deficient per-SNP designs (collinear covariates,
        # near-zero rotated genotypes) produce NaN here where the
        # reference falls back to an LU inverse (reml.cpp:1859-1871);
        # those SNPs fail the gradient test, get one warm-started
        # retry, and otherwise land in .gwas.unfitted — deliberate:
        # a NaN surfaces, an LU solve of a singular system would not.
        b = solve_spd_auto(a_mat, rhs)
        grad = 0.5 * jnp.stack(
            [
                quad(mss3, gs3, gg3, b) - m1[:, col_lam],
                quad(mss2, gs2, gg2, b) - m1[:, col_one],
            ],
            axis=1,
        )
        fmat = 0.5 * jnp.stack(
            [
                jnp.stack([m2[:, col_lam2], m2[:, col_lam]], axis=-1),
                jnp.stack([m2[:, col_lam], m2[:, col_one]], axis=-1),
            ],
            axis=-2,
        )
        return a_mat, rhs, b, grad, fmat, v, vi

    thetas = jnp.broadcast_to(theta0[None, :], (m_snps, 2))

    def body(_, th):
        _, _, _, grad, fmat, _, _ = quantities(th)
        delta = solve_spd_small(fmat, grad)  # (M,2,2) ML-F systems
        return jnp.maximum(th + delta, floor)

    thetas = jax.lax.fori_loop(0, n_iterations, body, thetas)

    a_mat, rhs, b, grad, fmat, v, vi = quantities(thetas)
    a_inv = inv_spd_auto(a_mat)
    b = jnp.einsum("mij,mj->mi", a_inv, rhs)
    # logL with the residual computed DIRECTLY (the quadratic-form
    # expansion would amplify fp32 cancellation when r^2 << y^2)
    r = y_rot[None, :] - b[:, :c] @ x_rot.T - b[:, c:] * g_rot
    logl = -0.5 * (
        jnp.sum(jnp.log(v), axis=1) + jnp.einsum("mn,mn,mn->m", r, r, vi)
    )
    grad_norm = jnp.max(jnp.abs(grad), axis=1)
    return (
        b,
        jnp.diagonal(a_inv, axis1=1, axis2=2),
        thetas,
        logl,
        grad_norm,
    )


def _spans_multiple_devices(arr) -> bool:
    """True for a jax.Array sharded across >1 device — the Pallas
    moments kernel is a custom call XLA SPMD cannot partition, so the
    sharded path uses the pure-XLA moments instead."""
    sharding = getattr(arr, "sharding", None)
    return sharding is not None and len(sharding.device_set) > 1


def mlm_gwas_ml_refit(
    genotypes,
    y,
    x,
    kernel_eigenvalues,
    kernel_eigenvectors,
    null_variances,
    n_iterations: int = 15,
    dtype=None,
    retry_unfitted: bool = True,
) -> GwasResults:
    """Exact mixed-model GWAS: per-SNP ML variance refits, vmapped.

    kernel_eigen*: eigendecomposition of the null covariance kernel
    (the GRM, or the combined normalized V from a multi-kernel null
    fit, gwas.cpp:1506-1592).  null_variances = (genetic, residual)
    warm start.  Everything is rotated into the eigenbasis once
    (gwas.cpp:189-209), then M independent O(n)-per-iteration ML
    Newtons run as one vmapped kernel.

    `genotypes` may be a mesh-sharded jax.Array (SNP axis over the
    devices — the --parallel-gwas analog): every array here leads with
    the SNP axis, so XLA SPMD runs the whole refit chip-parallel.

    retry_unfitted: the batched analog of the reference's sequential
    warm starts (each SNP starts from the AVERAGE of previously fitted
    variances, gwas.cpp:836-869).  Batched fits all start from the
    null variances; SNPs that fail the gradient test are refit once
    with theta0 = mean over the converged SNPs' fitted variances and
    double the iterations, rescuing most of what the reference saves
    via averaging.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    u = jnp.asarray(kernel_eigenvectors, dtype=dtype)
    lam = jnp.asarray(kernel_eigenvalues, dtype=dtype)
    y_rot = u.T @ jnp.asarray(y, dtype=dtype)
    x_rot = u.T @ jnp.asarray(x, dtype=dtype)
    g_rot = jnp.asarray(genotypes, dtype=dtype) @ u
    theta0 = jnp.asarray(np.asarray(null_variances, dtype=np.float64), dtype=dtype)

    use_pallas = (
        use_pallas_moments(x_rot.shape[1] + 1)
        and g_rot.dtype == jnp.float32
        and not _spans_multiple_devices(g_rot)
    )
    b, a_inv_diag, thetas, logl, grad_norm = _ml_refit_core(
        g_rot, y_rot, x_rot, lam, theta0, n_iterations,
        use_pallas=use_pallas,
    )
    if retry_unfitted:
        # host materialization via to_host: sharded-GWAS runs carry the
        # SNP axis across (possibly multi-host) mesh devices
        unfit = to_host(grad_norm) >= 1e-2
        fit_thetas = to_host(thetas)[~unfit]
        if unfit.any() and fit_thetas.size:
            idx = np.flatnonzero(unfit)
            theta_warm = jnp.asarray(
                fit_thetas.mean(axis=0).astype(np.float64), dtype=dtype
            )
            # pad the subset to the next power of two: every chunk of a
            # genome-scale run has a different unfitted count, and an
            # exact-shape retry would compile one program per chunk
            g_np = to_host(g_rot)[idx]
            padded = 1 << max(int(np.ceil(np.log2(len(idx)))), 3)
            if padded > len(idx):
                g_np = np.concatenate(
                    [g_np, np.repeat(g_np[-1:], padded - len(idx), axis=0)]
                )
            g_sub = jnp.asarray(g_np)
            b2, ad2, th2, ll2, gn2 = (
                v[: len(idx)]
                for v in _ml_refit_core(
                    g_sub, y_rot, x_rot, lam, theta_warm, 2 * n_iterations,
                    use_pallas=False,
                )
            )
            b, a_inv_diag, thetas, logl, grad_norm = (
                to_host(v).copy()
                for v in (b, a_inv_diag, thetas, logl, grad_norm)
            )
            b[idx], a_inv_diag[idx], thetas[idx] = (
                np.asarray(b2), np.asarray(ad2), np.asarray(th2)
            )
            logl[idx], grad_norm[idx] = np.asarray(ll2), np.asarray(gn2)
    # reduced (covariate-only) ML fit for the chi2 LRT GROUPPV
    # (computeGroupSignificance ML branch, gwas.cpp:940-961)
    _, _, _, logl_null, _ = jax.jit(
        _ml_fit_diagonal, static_argnames=("n_iterations",)
    )(lam, y_rot, x_rot, theta0, n_iterations=n_iterations)
    ratio = 2.0 * (to_host(logl) - float(logl_null))
    group_p = np.where(ratio < 0.0, -1.0, chi2_sf(1, np.maximum(ratio, 0.0)))
    b = to_host(b)
    a_inv_diag = to_host(a_inv_diag)
    se = np.sqrt(a_inv_diag)
    chi2 = (b / se) ** 2
    p = chi2_sf(1, chi2)
    res = GwasResults(
        snp_beta=b[:, -1],
        snp_se=se[:, -1],
        snp_stat=chi2[:, -1],
        snp_p=p[:, -1],
        cov_beta=b[:, :-1],
        cov_se=se[:, :-1],
        cov_p=p[:, :-1],
        df=1.0,
        model="MLM-ML",
        group_p=group_p,
    )
    res.converged = to_host(grad_norm) < 1e-2  # gradient threshold
    return res
