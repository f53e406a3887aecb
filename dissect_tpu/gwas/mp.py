"""Multi-phenotype pipeline: residual precomputation + massive GWAS.

Parity:
  * MPResiduals (mpresiduals.{h,cpp}): diagonalize the GRM once
    (one eigendecomposition), rotate every phenotype and the covariates
    by U^T (mpresiduals.cpp:86-94), run per-phenotype REML with the
    diagonal-V O(n) fast path (mpresiduals.cpp:103-156), emit residuals
    e = s2_E * Py rotated back by U, saved as a LabeledMatrix
    (.rowids/.colids/.dat).
  * mpgwas (gwasmp.cpp): per-SNP x per-phenotype scalar OLS on the
    column-centered residual matrix: b = X'y/X'X, SSE = y'y - b X'y,
    MSE = SSE/(n-1), t with df = n-1
    (computeGLMWithoutCovarianceMultiplePhenos, gwasmp.cpp:399-527).

TPU-first: the reference deals SNPs round-robin to grouped
communicators; here the whole (M, P) effect matrix comes from ONE
genotype x residual matmul — the grouped-communicator machinery
disappears into the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.io.covariate import Covariate, read_covariates
from dissect_tpu.io.ids import intersection_keeping_order
from dissect_tpu.io.labeled_matrix import LabeledMatrix
from dissect_tpu.io.phenotype import Phenotype
from dissect_tpu.model.kernels import Kernel
from dissect_tpu.reml.builders import build_variance_model, initial_residual_variance
from dissect_tpu.reml.engine import REMLEngine, REMLOptions
from dissect_tpu.runtime.stats import t_sf


def compute_mp_residuals(
    kernel: Kernel,
    phenotypes: Sequence[Phenotype],
    phenotype_names: Optional[Sequence[str]] = None,
    covariate: Optional[Covariate] = None,
    options: Optional[REMLOptions] = None,
    mesh=None,
) -> LabeledMatrix:
    """Per-phenotype REML residuals in the GRM eigenbasis.

    Individuals = intersection of the kernel, every phenotype column and
    the covariates, in kernel order.  Returns residuals as a
    LabeledMatrix (individuals x phenotypes).
    """
    options = options or REMLOptions()
    if phenotype_names is None:
        phenotype_names = [f"pheno_{i + 1}" for i in range(len(phenotypes))]
    common = kernel.individual_keys
    for p in phenotypes:
        common = intersection_keeping_order(common, p.keys)
    if covariate is None:
        covariate = read_covariates(default_keys=common)
    common = intersection_keeping_order(common, covariate.keys)
    if not common:
        raise ValueError("no common individuals")
    n = len(common)

    kern = kernel.filter_individuals(common).diagonalize(mesh=mesh)
    u = np.asarray(kern.eigenvectors, dtype=np.float64)
    lam = np.asarray(kern.eigenvalues, dtype=np.float64)
    x = covariate.filter_individuals(common).matrix
    x_rot = u.T @ x

    residuals = np.zeros((n, len(phenotypes)))
    for j, p in enumerate(phenotypes):
        pm = p.as_dict()
        y = np.array([pm[k] for k in common])
        y_rot = u.T @ y
        pheno_var = initial_residual_variance(y_rot, x_rot)
        model = build_variance_model(
            [lam], [kern.name], [pheno_var], [options.initial_h2], diagonal=True
        )
        engine = REMLEngine(model, y_rot, x_rot, options)
        result = engine.fit()
        if not result.success:
            raise RuntimeError(f"REML failed for phenotype {phenotype_names[j]}")
        residuals[:, j] = u @ engine.residuals()
    return LabeledMatrix(list(common), list(phenotype_names), residuals)


@dataclasses.dataclass
class MpGwasResults:
    snp_names: List[str]
    phenotype_names: List[str]
    beta: np.ndarray  # (M, P)
    se: np.ndarray
    t: np.ndarray
    p: np.ndarray

    def write(self, prefix: str):
        """One .mpgwas table: SNP PHENO BETA SE T PV (reference layout
        storeResultsMultiplePhenotype, gwasmp.cpp)."""
        with open(prefix + ".mpgwas", "w") as fh:
            fh.write("SNP PHENO BETA SE T PV\n")
            for i, snp in enumerate(self.snp_names):
                for j, pheno in enumerate(self.phenotype_names):
                    fh.write(
                        f"{snp} {pheno} {self.beta[i, j]:.8g} "
                        f"{self.se[i, j]:.8g} {self.t[i, j]:.6g} "
                        f"{self.p[i, j]:.6g}\n"
                    )


@jax.jit
def _mp_core(g, y):
    xtx = jnp.einsum("mi,mi->m", g, g)
    xty = g @ y  # (M, P)
    yty = jnp.einsum("ip,ip->p", y, y)
    return xtx, xty, yty


def mp_gwas(
    genotypes,
    snp_names: Sequence[str],
    residuals: LabeledMatrix,
    center: bool = True,
    dtype=None,
    mesh_ctx=None,
) -> MpGwasResults:
    """Batched per-SNP x per-phenotype scalar regressions on residuals.

    genotypes: (M, n) rows aligned to residuals.row_labels (the caller
    standardizes/centers genotypes; missing -> 0).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    lm = residuals.center_columns() if center else residuals
    y = jnp.asarray(lm.values, dtype=dtype)
    m_orig = np.shape(genotypes)[0]
    if mesh_ctx is not None:
        # the grouped-communicator mpgwas analog (gwasmp.cpp:699+):
        # shard the SNP axis over the mesh, trim the padded rows below
        from dissect_tpu.runtime.distributed_io import shard_snp_rows

        genotypes, m_orig = shard_snp_rows(np.asarray(genotypes), mesh_ctx)
    g = jnp.asarray(genotypes, dtype=dtype)
    n = y.shape[0]
    xtx, xty, yty = _mp_core(g, y)
    # to_host: the SNP axis may be sharded over a multi-host mesh,
    # where np.asarray on a not-fully-addressable array raises
    from dissect_tpu.runtime.distributed_io import to_host

    xtx = to_host(xtx)[:m_orig]
    xty = to_host(xty)[:m_orig]
    yty = to_host(yty)

    bad = xtx <= 0
    xtx_safe = np.where(bad, np.inf, xtx)
    beta = xty / xtx_safe[:, None]
    df = n - 1.0
    sse = yty[None, :] - beta * xty
    mse = sse / df
    se = np.sqrt(mse / xtx_safe[:, None])
    t = beta / se
    p = 2.0 * t_sf(df, np.abs(t))
    return MpGwasResults(
        snp_names=list(snp_names),
        phenotype_names=list(lm.col_labels),
        beta=beta,
        se=se,
        t=t,
        p=p,
    )
