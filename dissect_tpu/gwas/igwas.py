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
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.runtime.stats import chi2_sf, t_sf


@dataclasses.dataclass
class IGwasResults:
    snp_names: List[str]
    covariate_names: List[str]
    beta: np.ndarray  # (M, c)
    se: np.ndarray
    p: np.ndarray
    model: str

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


def igwas(
    genotypes,
    snp_names: Sequence[str],
    x,
    covariate_names: Sequence[str],
    v_inv=None,
    dtype=None,
) -> IGwasResults:
    """Batched inverse GWAS.

    genotypes: (M, n) outcome rows (standardized dosages); x: (n, c)
    tested covariates incl. mean column; v_inv: optional (n, n) GRM
    covariance inverse for the mixed-model-corrected variant.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    g = jnp.asarray(genotypes, dtype=dtype)
    xm = jnp.asarray(x, dtype=dtype)
    n, c = xm.shape
    if v_inv is None:
        beta, sse, a_inv_diag = _igwas_ols_core(g, xm)
        beta = np.asarray(beta)
        mse = np.asarray(sse)[:, None] / (n - c)
        se = np.sqrt(mse * np.asarray(a_inv_diag)[None, :])
        t = beta / se
        p = 2.0 * t_sf(n - c, np.abs(t))
        model = "OLS"
    else:
        beta, a_inv_diag = _igwas_gls_core(g, xm, jnp.asarray(v_inv, dtype=dtype))
        beta = np.asarray(beta)
        se = np.sqrt(np.asarray(a_inv_diag))[None, :] * np.ones((g.shape[0], 1))
        chi2 = (beta / se) ** 2
        p = chi2_sf(1, chi2)
        model = "GLS"
    return IGwasResults(
        snp_names=list(snp_names),
        covariate_names=list(covariate_names),
        beta=beta,
        se=se,
        p=p,
        model=model,
    )
