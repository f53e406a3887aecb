"""Inverse GWAS — the SNP is the outcome.

Parity: igwas.{h,cpp} (igwas.cpp:102-200, igwas.h:43-116): for every
SNP, regress the (standardized) genotype on the tested covariates from
--igwas-covar/--igwas-qcovar, optionally GLS-corrected with the GRM
covariance (mirroring the GWAS structure including its grouped-
communicator parallel path, igwas.cpp:328-341).

TPU-first: all M regressions share the design matrix, so the whole
analysis is ONE batched solve: B = (X'X)^-1 X' G' (or the V^-1-metric
analog), with per-SNP MSEs for the OLS standard errors.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.linalg.small import (
    inv_spd_auto,
    solve_spd_auto,
    solve_spd_small,
)
from dissect_tpu.runtime.stats import chi2_sf, f_sf, t_sf
from dissect_tpu.runtime.distributed_io import to_host


@dataclasses.dataclass
class IGwasResults:
    snp_names: List[str]
    covariate_names: List[str]
    beta: np.ndarray  # (M, c)
    se: np.ndarray
    p: np.ndarray
    model: str
    # per-SNP test of the full fit vs the reduced model: the F-test of
    # the tested covariates (OLS) or the chi2 LRT of the genetic
    # variance (covariance mode) — the reference reports this as the
    # GROUPPV column, the SNP effect columns being NA
    # (IGWAS::storeResults, igwas.cpp:932-947)
    group_p: "np.ndarray" = None
    converged: "np.ndarray" = None
    n_base: int = None  # leading columns of beta that are BASE covariates

    def write(self, prefix: str):
        with open(prefix + ".igwas", "w") as fh:
            fh.write("SNP COVAR BETA SE PV\n")
            for i, snp in enumerate(self.snp_names):
                for j, cov in enumerate(self.covariate_names):
                    fh.write(
                        f"{snp} {cov} {self.beta[i, j]:.8g} "
                        f"{self.se[i, j]:.8g} {self.p[i, j]:.6g}\n"
                    )


@jax.jit
def _igwas_ols_core(g, x):
    a_inv = jnp.linalg.inv(x.T @ x)
    beta = g @ x @ a_inv  # (M, c)
    fitted = beta @ x.T
    resid = g - fitted
    sse = jnp.einsum("mi,mi->m", resid, resid)
    return beta, sse, jnp.diagonal(a_inv)


@jax.jit
def _igwas_gls_core(g, x, vi):
    vix = vi @ x
    a_inv = jnp.linalg.inv(x.T @ vix)
    beta = g @ vix @ a_inv
    return beta, jnp.diagonal(a_inv)


@partial(jax.jit, static_argnames=("n_iterations",))
def _igwas_ml_core_vmapped(g_rot, x_rot, lam, theta0s, n_iterations):
    """Reference formulation (oracle for the moment-form path below)."""
    from dissect_tpu.gwas.mlm import _ml_fit_diagonal

    def one(y_rot, theta0):
        return _ml_fit_diagonal(lam, y_rot, x_rot, theta0, n_iterations)

    return jax.vmap(one)(g_rot, theta0s)


@partial(jax.jit, static_argnames=("n_iterations",))
def _igwas_ml_core(g_rot, x_rot, lam, theta0s, n_iterations):
    """Per-SNP ML variance refits with the SNP as the outcome.

    IGWAS::computeGLMWithCovariance (igwas.cpp:575-720): every SNP's
    fit is an embedded ML REML with V = t1*K + t2*I — the variances are
    FIT per SNP, not fixed, each from its own initial-h2-scaled start
    (theta0s: (M, 2)).  Moment form (see gwas/mlm._ml_refit_core):
    with the design X shared across SNPs, every per-SNP sum is a
    weighted moment of the shared feature columns [X⊗X | lam·X⊗X |
    lam | 1 | lam²] plus three weighted-outcome products — two MXU
    matmuls (M,n)@(n,K) per Fisher iteration instead of a vmapped
    per-SNP pipeline."""
    m_snps, n = g_rot.shape
    c = x_rot.shape[1]
    pairs = [(i, j) for i in range(c) for j in range(i, c)]
    n_pairs = len(pairs)
    xx = jnp.stack([x_rot[:, i] * x_rot[:, j] for i, j in pairs], axis=1)
    feats = jnp.concatenate(
        [
            xx,
            lam[:, None] * xx,
            lam[:, None],
            jnp.ones((n, 1), x_rot.dtype),
            (lam * lam)[:, None],
        ],
        axis=1,
    )
    idx_np = np.zeros((c, c), np.int32)
    for k_, (i, j) in enumerate(pairs):
        idx_np[i, j] = idx_np[j, i] = k_
    idx = jnp.asarray(idx_np)
    col_lam, col_one, col_lam2 = 2 * n_pairs, 2 * n_pairs + 1, 2 * n_pairs + 2
    floor = 1e-6 * (theta0s[:, 0] + theta0s[:, 1])

    def quad(mxx_w, gx_w, gg_w, b):
        """Sum_n w r^2 with r = g - X b."""
        return (
            gg_w
            - 2.0 * jnp.einsum("mi,mi->m", b, gx_w)
            + jnp.einsum("mi,mij,mj->m", b, mxx_w, b)
        )

    def quantities(thetas):
        v = thetas[:, :1] * lam[None, :] + thetas[:, 1:]
        vi = 1.0 / v
        vi2 = vi * vi
        m1 = vi @ feats
        m2 = vi2 @ feats
        g1 = vi * g_rot
        g2 = vi2 * g_rot
        g3 = g2 * lam[None, :]
        gx1, gx2, gx3 = g1 @ x_rot, g2 @ x_rot, g3 @ x_rot
        gg2 = jnp.einsum("mn,mn->m", g2, g_rot)
        gg3 = jnp.einsum("mn,mn->m", g3, g_rot)
        a_mat = m1[:, idx]  # (M, c, c) = X' Vi X, SPD
        b = solve_spd_auto(a_mat, gx1)
        grad = 0.5 * jnp.stack(
            [
                quad(m2[:, n_pairs + idx], gx3, gg3, b) - m1[:, col_lam],
                quad(m2[:, idx], gx2, gg2, b) - m1[:, col_one],
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
        return a_mat, gx1, b, grad, fmat, v, vi

    def body(_, th):
        _, _, _, grad, fmat, _, _ = quantities(th)
        delta = solve_spd_small(fmat, grad)  # (M,2,2) ML-F systems
        return jnp.maximum(th + delta, floor[:, None])

    thetas = jax.lax.fori_loop(0, n_iterations, body, theta0s)

    a_mat, gx1, b, grad, fmat, v, vi = quantities(thetas)
    a_inv = inv_spd_auto(a_mat)
    b = jnp.einsum("mij,mj->mi", a_inv, gx1)
    r = g_rot - b @ x_rot.T
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


def igwas(
    genotypes,
    snp_names: Sequence[str],
    x,
    covariate_names: Sequence[str],
    test_x=None,
    test_names: Optional[Sequence[str]] = None,
    v_inv=None,
    covariance=None,
    initial_h2: float = 0.5,
    n_iterations: int = 15,
    dtype=None,
    mesh_ctx=None,
) -> IGwasResults:
    """Batched inverse GWAS.

    genotypes: (M, n) outcome rows (standardized dosages); x: (n, c)
    BASE covariates incl. mean column; `test_x`/`test_names`: the
    TESTED covariates from --igwas-covar/--igwas-qcovar (no mean
    column, igwas.cpp:134-140) — the full fit is [x | test_x], the
    reduced fit is x alone, and group_p is the F-test of the added
    block (computeGroupSignificance, gwas.cpp:919-939).  `covariance` =
    (eigenvalues, eigenvectors) of the GRM/combined kernel enables the
    reference's per-SNP ML refits against an E-only reduced ML fit
    (igwas.cpp:575-720 + 604-624); `v_inv` is a fixed-V GLS fast-path
    extension (EMMAX-style, no per-SNP variance refit).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    m_orig = np.shape(genotypes)[0]
    if mesh_ctx is not None:
        # shard the SNP-as-outcome axis over the whole mesh (the
        # grouped-communicator IGWAS analog, igwas.cpp:328-341): every
        # core here leads with the SNP axis, so XLA SPMD splits the
        # batched fits across chips; padded rows are trimmed below
        from dissect_tpu.runtime.distributed_io import shard_snp_rows

        genotypes, m_orig = shard_snp_rows(np.asarray(genotypes), mesh_ctx)
    g = jnp.asarray(genotypes, dtype=dtype)
    n_base = np.shape(x)[1]
    if test_x is not None:
        if covariance is not None or v_inv is not None:
            # the reference rejects testing covariates under a
            # covariance (igwas.cpp:70-76)
            raise ValueError(
                "testing covariates cannot be combined with a GRM "
                "covariance (igwas.cpp:70-76)"
            )
        x = np.column_stack([np.asarray(x), np.asarray(test_x)])
        covariate_names = list(covariate_names) + list(test_names or [])
    xm = jnp.asarray(x, dtype=dtype)
    n, c = xm.shape
    group_p = None
    converged = None
    if covariance is not None:
        lam, u = covariance
        uj = jnp.asarray(u, dtype=dtype)
        g_rot = g @ uj
        x_rot = uj.T @ xm
        # per-SNP initial variances: h2 * var(snp) genetic, rest
        # residual (reml.prepare's OLS-variance seeding applied to the
        # SNP outcome, reml.cpp:1100-1131)
        # to_host: `genotypes` may be mesh-sharded (multi-host safe)
        g_np = to_host(genotypes).astype(np.float64)
        snp_var = g_np.var(axis=1, ddof=1)
        theta0s = np.column_stack(
            [initial_h2 * snp_var, (1.0 - initial_h2) * snp_var]
        )
        beta, a_inv_diag, thetas, logl, grad_norm = _igwas_ml_core(
            g_rot,
            x_rot,
            jnp.asarray(lam, dtype=dtype),
            jnp.asarray(theta0s, dtype=dtype),
            n_iterations,
        )
        beta = to_host(beta)
        se = np.sqrt(np.maximum(to_host(a_inv_diag), 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            chi2 = (beta / se) ** 2
        p = chi2_sf(1, chi2)
        model = "MLM-ML"
        # reduced model: E-only ML (the reference deletes every
        # non-E sub-covariance and refits, igwas.cpp:604-624) — for
        # V = s2*I the profile ML is closed-form from the OLS residuals
        _, sse_red, _ = _igwas_ols_core(g, xm)
        sse_red = to_host(sse_red).astype(np.float64)
        logl_null = -0.5 * (n * np.log(sse_red / n) + n)
        ratio = 2.0 * (to_host(logl).astype(np.float64) - logl_null)
        # one extra variance in the full model; the statistically
        # standard df=1 chi2 (the reference passes the fixed-effect df
        # difference, 0, to chi1_CDF here — a degenerate corner its own
        # LRT helper avoids, results.cpp:38-52)
        group_p = np.where(
            ratio < 0.0, -1.0, chi2_sf(1, np.maximum(ratio, 0.0))
        )
        converged = to_host(grad_norm) < 1e-2
    elif v_inv is None:
        beta, sse, a_inv_diag = _igwas_ols_core(g, xm)
        beta = to_host(beta)
        sse = to_host(sse)
        mse = sse[:, None] / (n - c)
        se = np.sqrt(mse * to_host(a_inv_diag)[None, :])
        t = beta / se
        p = 2.0 * t_sf(n - c, np.abs(t))
        model = "OLS"
        if c > n_base:
            # F-test of the tested-covariate block vs the base-only
            # reduced fit (SSR = sse_reduced - sse_full, h = c - n_base)
            _, sse_red, _ = _igwas_ols_core(g, xm[:, :n_base])
            h = float(c - n_base)
            f_stat = (to_host(sse_red) - sse) / h / (sse / (n - c))
            group_p = f_sf(h, float(n - c), np.maximum(f_stat, 0.0))
    else:
        beta, a_inv_diag = _igwas_gls_core(g, xm, jnp.asarray(v_inv, dtype=dtype))
        beta = to_host(beta)
        se = np.sqrt(to_host(a_inv_diag))[None, :] * np.ones((g.shape[0], 1))
        chi2 = (beta / se) ** 2
        p = chi2_sf(1, chi2)
        model = "GLS"
    trim = lambda v: None if v is None else v[:m_orig]
    return IGwasResults(
        snp_names=list(snp_names),
        covariate_names=list(covariate_names),
        beta=trim(beta),
        se=trim(se),
        p=trim(p),
        model=model,
        group_p=trim(group_p),
        converged=trim(converged),
        n_base=n_base,
    )
