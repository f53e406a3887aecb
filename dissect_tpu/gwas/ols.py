"""Batched per-SNP ordinary least squares.

Parity: GWAS::computeGLMWithoutCovariance (gwas.cpp:702-785): for each
SNP the incidence is [X | g]; b = (X'X)^-1 X'y, SE_i =
sqrt(MSE * (X'X)^-1_ii), t-tests with df = n - p, p = 2*t_sf(df, |t|).

TPU-first: the per-SNP loop becomes closed-form block-inverse updates
batched over the SNP axis — two big matmuls instead of M serial solves.
With A = X'X and for each SNP g: u = X'g, gt = g - X A^-1 u (residual-
ized genotype), d = gt'gt:
  b_snp   = gt'y / d
  b_cov   = A^-1 X'y - (A^-1 u) b_snp
  SSE     = SSE_base - b_snp^2 d
  (X'X)^-1 block-inverse diagonal: cov part A^-1_ii + (A^-1 u)_i^2/d,
  SNP part 1/d.
This reproduces the reference's full-coefficient output exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.runtime.stats import f_sf, t_sf


@dataclasses.dataclass
class GwasResults:
    """Per-SNP association results (host arrays).

    snp_beta/se/stat/p: (M,); cov_beta/cov_se/cov_p: (M, c) the
    covariate coefficients refitted per SNP (the reference reports the
    final group's covariate estimates; we keep all)."""

    snp_beta: np.ndarray
    snp_se: np.ndarray
    snp_stat: np.ndarray
    snp_p: np.ndarray
    cov_beta: np.ndarray
    cov_se: np.ndarray
    cov_p: np.ndarray
    df: float
    model: str = "OLS"
    converged: "np.ndarray" = None  # per-SNP fit convergence (ML refits)
    # per-SNP GROUPPV (computeGroupSignificance, gwas.cpp:916-967):
    # OLS F-test / mixed-model chi2 LRT of the SNP fit vs the
    # covariate-only reduced model; -1 marks a negative LRT ratio
    group_p: "np.ndarray" = None


@partial(jax.jit, static_argnames=())
def _ols_core(g, y, x):
    """g: (M, n) genotypes; y: (n,); x: (n, c).  Returns device arrays."""
    a = x.T @ x
    a_inv = jnp.linalg.inv(a)
    xty = x.T @ y
    b0 = a_inv @ xty  # base OLS coefficients
    y_res = y - x @ b0
    sse_base = y @ y_res  # y'y - b0'X'y

    u = g @ x  # (M, c)
    au = u @ a_inv  # (M, c) = (A^-1 u)^T rows
    g_res_dot_y = g @ y_res  # g~' y  (residualized either side)
    gg = jnp.einsum("mi,mi->m", g, g)
    d = gg - jnp.einsum("mc,mc->m", u, au)  # g~'g~
    d_safe = jnp.where(d > 0, d, jnp.inf)

    b_snp = g_res_dot_y / d_safe
    b_cov = b0[None, :] - au * b_snp[:, None]
    sse = sse_base - b_snp**2 * d_safe
    return b_snp, b_cov, sse, d_safe, au, jnp.diagonal(a_inv)


def ols_gwas(
    genotypes,
    y,
    x,
    dtype=None,
) -> GwasResults:
    """Run batched OLS GWAS.

    genotypes: (M, n) standardized-or-raw dosage rows (missing already
    imputed/zeroed by the caller); y: (n,); x: (n, c) incl. mean column.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    g = jnp.asarray(genotypes, dtype=dtype)
    yv = jnp.asarray(y, dtype=dtype)
    xm = jnp.asarray(x, dtype=dtype)
    n, c = xm.shape
    m = g.shape[0]
    b_snp, b_cov, sse, d, au, a_inv_diag = _ols_core(g, yv, xm)

    # to_host: the SNP axis may be sharded over a multi-host mesh,
    # where np.asarray on a not-fully-addressable array raises
    from dissect_tpu.runtime.distributed_io import to_host

    df = float(n - (c + 1))
    mse = to_host(sse) / df
    d = to_host(d)
    snp_var = mse / d
    snp_se = np.sqrt(snp_var)
    snp_beta = to_host(b_snp)
    snp_t = snp_beta / snp_se
    snp_p = 2.0 * t_sf(df, np.abs(snp_t))

    cov_var = mse[:, None] * (
        to_host(a_inv_diag)[None, :] + to_host(au) ** 2 / d[:, None]
    )
    cov_se = np.sqrt(cov_var)
    cov_beta = to_host(b_cov)
    cov_t = cov_beta / cov_se
    cov_p = 2.0 * t_sf(df, np.abs(cov_t))
    # GROUPPV (gwas.cpp:919-939): SSR = b'X'y(full) - b'X'y(reduced)
    # = b_snp^2 * d with h=1 added coefficient; F = (SSR/h)/MSE.
    group_p = f_sf(1.0, df, snp_beta**2 * d / mse)
    return GwasResults(
        snp_beta=snp_beta,
        snp_se=snp_se,
        snp_stat=snp_t,
        snp_p=snp_p,
        cov_beta=cov_beta,
        cov_se=cov_se,
        cov_p=cov_p,
        df=df,
        model="OLS",
        group_p=group_p,
    )
