"""Grouped and recursive GWAS — joint per-group fits with F-tests.

Parity: GWAS::computeGroupedGWAS (gwas.cpp:314-478): each SNP group is
fit jointly as [X | G_S'] with OLS; group significance is the F-test
against the covariates-only reduced model (computeGroupSignificance,
gwas.cpp:916-967): SSR = b'X'y_full - b'X'y_reduced, F = (SSR/h)/MSE,
p = F_sf(h, n - p, F).  Linearly dependent SNP columns are dropped via
QR pivots before refitting (gwas.cpp:404-438, matrix.cpp:3501+).
Group variance = var(G_S b_S) and per-individual group effects
(computeGroupVariance, gwas.cpp:970-1034).  Correlated-SNP flagging
drops the less significant of highly correlated pairs
(getLessSignificantCorrelatedSNPs, gwas.cpp:1156).

Recursive GWAS (computeRecursiveGWAS, gwas.cpp:239-284): iterate
group-fit -> keep significant -> regroup until the significant set
reaches a fixed point.

TPU-first: groups are bucketed by size and each bucket's joint solves
run as ONE batched (vmapped) Cholesky solve — the grouped-communicator
task parallelism of the reference collapses into batched linear algebra.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.io.labeled_matrix import LabeledMatrix
from dissect_tpu.linalg.qr import dependent_columns
from dissect_tpu.runtime.stats import chi2_sf, f_sf, t_sf


@dataclasses.dataclass
class GroupResult:
    group: str
    snp_names: List[str]
    beta: np.ndarray  # (c + s,) covariates then SNPs
    se: np.ndarray
    p: np.ndarray
    f_statistic: float
    f_p_value: float
    group_variance: float
    dropped_snps: List[str]
    success: bool = True


@partial(jax.jit, static_argnames=())
def _joint_ols_batch(gs, y, x):
    """gs: (B, s, n) genotype rows per group; returns batched OLS pieces."""

    def one(g):
        xg = jnp.concatenate([x, g.T], axis=1)  # (n, c+s)
        a = xg.T @ xg
        a_inv = jnp.linalg.inv(a)
        b = a_inv @ (xg.T @ y)
        btxty = b @ (xg.T @ y)
        return b, jnp.diagonal(a_inv), btxty

    return jax.vmap(one)(gs)


@partial(jax.jit, static_argnames=("n_iterations",))
def _joint_ml_batch(gs_rot, y_rot, x_rot, lam, theta0, n_iterations):
    """Batched per-group ML fits under the mixed-model covariance.

    The group fits of the reference run computeGLMWithCovariance — an
    embedded ML REML per group (gwas.cpp:314-478, 787-914).  In the
    covariance eigenbasis V(theta) = t1*diag(lam) + t2*I is diagonal,
    so each group's Fisher-scoring ML fit is O(n) per iteration, and
    all groups of one size run as a single vmapped kernel."""
    from dissect_tpu.gwas.mlm import _ml_fit_diagonal

    def one(g_rot):
        xg = jnp.concatenate([x_rot, g_rot.T], axis=1)
        return _ml_fit_diagonal(lam, y_rot, xg, theta0, n_iterations)

    return jax.vmap(one)(gs_rot)


def grouped_gwas(
    genotypes,
    snp_names: Sequence[str],
    grouping: "OrderedDict[str, List[str]]",
    y,
    x,
    significance_threshold: float = 5e-8,
    correlation_threshold: float = 0.99,
    compute_effects: bool = False,
    covariance=None,
    ml_iterations: int = 15,
    dtype=None,
    mesh_ctx=None,
) -> Tuple[Dict[str, GroupResult], Optional[LabeledMatrix]]:
    """Joint fit per SNP group, batched by group size.

    Without `covariance`: OLS with the F-test GROUPPV.  With
    `covariance` = (eigenvalues, eigenvectors, theta0) of the
    mixed-model kernel: per-group ML refits in the eigenbasis with the
    chi2 likelihood-ratio GROUPPV against the covariates-only ML fit
    (computeGroupSignificance's MLModelType branch, gwas.cpp:940-957).

    With `mesh_ctx`, each size-bucket's group axis is sharded over the
    whole mesh (the grouped-communicator parallel path applied to
    grouped fits, gwas.cpp:557-687): the batched solvers lead with the
    group axis, so XLA SPMD splits the joint fits across chips; padded
    batch rows (repeats of the last group) are discarded below.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    g_all = np.asarray(genotypes, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n, c = x.shape
    name_to_idx = {nm: i for i, nm in enumerate(snp_names)}

    lam = u = theta0 = y_rot = x_rot = logl0 = None
    if covariance is not None:
        from dissect_tpu.gwas.mlm import _ml_fit_diagonal

        eigenvalues, eigenvectors, warm = covariance
        lam = jnp.asarray(eigenvalues, dtype=dtype)
        u = np.asarray(eigenvectors, dtype=np.float64)
        theta0 = jnp.asarray(np.asarray(warm, dtype=np.float64), dtype=dtype)
        y_rot = jnp.asarray(u.T @ y, dtype=dtype)
        x_rot = jnp.asarray(u.T @ x, dtype=dtype)
        # reduced (covariates-only) ML fit for the LRT baseline
        _, _, _, logl0, _ = jax.jit(
            _ml_fit_diagonal, static_argnames=("n_iterations",)
        )(lam, y_rot, x_rot, theta0, n_iterations=ml_iterations)
        logl0 = float(logl0)

    # reduced (covariates-only) OLS fit
    a0 = x.T @ x
    b0 = np.linalg.solve(a0, x.T @ y)
    btxty0 = b0 @ (x.T @ y)
    yty = y @ y

    # per-group dependent-column filtering (host, QR)
    filtered: "OrderedDict[str, Tuple[List[str], List[str]]]" = OrderedDict()
    for group, snps in grouping.items():
        idx = [name_to_idx[s] for s in snps]
        sub = g_all[idx]
        deps = dependent_columns(np.hstack([x, sub.T]))
        deps = [d - c for d in deps if d >= c]
        kept = [s for j, s in enumerate(snps) if j not in set(deps)]
        dropped = [s for j, s in enumerate(snps) if j in set(deps)]
        filtered[group] = (kept, dropped)

    # bucket by size, batch each bucket
    buckets: Dict[int, List[str]] = {}
    for group, (kept, _) in filtered.items():
        if kept:
            buckets.setdefault(len(kept), []).append(group)

    results: Dict[str, GroupResult] = {}
    effects_cols: Dict[str, np.ndarray] = {}
    yj = jnp.asarray(y, dtype=dtype)
    xj = jnp.asarray(x, dtype=dtype)
    for size, group_list in sorted(buckets.items()):
        gs = np.stack(
            [g_all[[name_to_idx[s] for s in filtered[g][0]]] for g in group_list]
        )
        n_groups = len(group_list)

        def batched(arr):
            """Device placement for a (B, ...) group batch: sharded
            over the mesh's group axis when a mesh is given."""
            if mesh_ctx is None:
                return jnp.asarray(arr, dtype=dtype)
            from dissect_tpu.runtime.distributed_io import shard_snp_rows

            sharded, _ = shard_snp_rows(
                np.asarray(arr, dtype=np.float64), mesh_ctx
            )
            return jnp.asarray(sharded, dtype=dtype)

        p_coef = c + size
        df = n - p_coef
        h = p_coef - c
        if covariance is not None:
            gs_rot = np.einsum("bsn,nm->bsm", gs, u)
            bs, a_inv_diags, _, logls, grad_norms = _joint_ml_batch(
                batched(gs_rot), y_rot, x_rot, lam, theta0,
                ml_iterations,
            )
            # to_host: batch axis may be sharded over a multi-host mesh
            from dissect_tpu.runtime.distributed_io import to_host

            bs = to_host(bs).astype(np.float64)[:n_groups]
            a_inv_diags = to_host(a_inv_diags).astype(np.float64)[:n_groups]
            logls = to_host(logls).astype(np.float64)[:n_groups]
            grad_norms = to_host(grad_norms).astype(np.float64)[:n_groups]
        else:
            bs, a_inv_diags, btxtys = _joint_ols_batch(
                batched(gs), yj, xj
            )
            from dissect_tpu.runtime.distributed_io import to_host

            bs = to_host(bs).astype(np.float64)[:n_groups]
            a_inv_diags = to_host(a_inv_diags).astype(np.float64)[:n_groups]
            btxtys = to_host(btxtys).astype(np.float64)[:n_groups]
        for bi, group in enumerate(group_list):
            kept, dropped = filtered[group]
            if covariance is not None:
                # chi2 Wald per coefficient + LRT group test
                # (gwas.cpp:889-903, 940-957)
                se = np.sqrt(np.maximum(a_inv_diags[bi], 0.0))
                with np.errstate(divide="ignore", invalid="ignore"):
                    chi2 = (bs[bi] / se) ** 2
                pvals = chi2_sf(1, chi2)
                lrt = 2.0 * (logls[bi] - logl0)
                if lrt < 0:
                    f_stat, f_p = float(lrt), -1.0  # gwas.cpp:946-949
                else:
                    f_stat = float(lrt)
                    f_p = float(chi2_sf(h, lrt))
                ok = bool(np.isfinite(logls[bi]))
            else:
                sse = yty - btxtys[bi]
                mse = sse / df
                se = np.sqrt(np.maximum(mse * a_inv_diags[bi], 0.0))
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = bs[bi] / se
                pvals = 2.0 * t_sf(df, np.abs(t))
                ssr = btxtys[bi] - btxty0
                if ssr < 0 or mse <= 0:
                    f_stat, f_p = np.nan, np.nan
                    ok = False
                else:
                    f_stat = (ssr / h) / mse
                    f_p = float(f_sf(h, df, f_stat))
                    ok = True
            snp_beta = bs[bi][c:]
            geno = gs[bi]
            group_effect = geno.T @ snp_beta
            results[group] = GroupResult(
                group=group,
                snp_names=kept,
                beta=bs[bi],
                se=se,
                p=pvals,
                f_statistic=float(f_stat),
                f_p_value=f_p,
                group_variance=float(np.var(group_effect, ddof=1)),
                dropped_snps=dropped,
                success=ok,
            )
            if compute_effects:
                effects_cols[group] = group_effect

    effects = None
    if compute_effects and effects_cols:
        cols = [g for g in grouping if g in effects_cols]
        effects = LabeledMatrix(
            [f"ind_{i}" for i in range(n)],
            cols,
            np.column_stack([effects_cols[g] for g in cols]),
        )
    return results, effects


def flag_correlated_snps(
    genotypes, snp_names: Sequence[str], p_values, threshold: float = 0.99
) -> List[str]:
    """The less-significant SNP of each highly correlated pair
    (getLessSignificantCorrelatedSNPs, gwas.cpp:1156)."""
    g = np.asarray(genotypes, dtype=np.float64)
    g = g - g.mean(axis=1, keepdims=True)
    norms = np.linalg.norm(g, axis=1)
    norms[norms == 0] = 1.0
    corr = (g @ g.T) / np.outer(norms, norms)
    flagged = set()
    m = len(snp_names)
    for i in range(m):
        for j in range(i + 1, m):
            if abs(corr[i, j]) > threshold:
                loser = i if p_values[i] > p_values[j] else j
                flagged.add(snp_names[loser])
    return sorted(flagged)


def recursive_gwas(
    genotypes,
    snp_names: Sequence[str],
    y,
    x,
    group_size: int = 100,
    significance_threshold: float = 5e-8,
    max_iterations: int = 20,
    iteration_thresholds: Optional[Sequence[float]] = None,
    max_fit_ratio: Optional[float] = None,
    covariance=None,
    mesh_ctx=None,
) -> Tuple[List[str], Dict[str, GroupResult]]:
    """Iterative grouped fit -> keep significant -> regroup
    (computeRecursiveGWAS, gwas.cpp:239-284).  Returns the fixed-point
    significant SNP set and the final group results.

    iteration_thresholds: per-iteration keep thresholds (the last one
    repeats; --rgwas-thresholds, options.cpp:803-806); the final
    `significance_threshold` applies on the last pass.  max_fit_ratio
    caps the kept SNPs at ratio*n_individuals by p-value rank
    (relationFitSNPsIndividuals, --rgwas-ratio, options.cpp:799-802)."""
    current = list(snp_names)
    name_to_idx = {nm: i for i, nm in enumerate(snp_names)}
    g_all = np.asarray(genotypes, dtype=np.float64)
    n_individuals = g_all.shape[1]
    last_results: Dict[str, GroupResult] = {}
    for it in range(max_iterations):
        if iteration_thresholds:
            threshold = iteration_thresholds[
                min(it, len(iteration_thresholds) - 1)
            ]
        else:
            threshold = significance_threshold
        grouping: "OrderedDict[str, List[str]]" = OrderedDict()
        for gi, start in enumerate(range(0, len(current), group_size), 1):
            grouping[f"g{gi}"] = current[start : start + group_size]
        sub = g_all[[name_to_idx[s] for s in current]]
        results, _ = grouped_gwas(
            sub, current, grouping, y, x,
            significance_threshold=significance_threshold,
            covariance=covariance,
            mesh_ctx=mesh_ctx,
        )
        last_results = results
        kept: List[Tuple[float, str]] = []
        for res in results.values():
            c = len(res.beta) - len(res.snp_names)
            for j, snp in enumerate(res.snp_names):
                if res.p[c + j] < threshold:
                    kept.append((res.p[c + j], snp))
        if max_fit_ratio is not None:
            cap = max(1, int(max_fit_ratio * n_individuals))
            kept = sorted(kept)[:cap]
        kept_set = {snp for _, snp in kept}
        significant = [s for s in snp_names if s in kept_set]
        if significant == current or not significant:
            break
        current = significant
    # the final significance filter (reference reports SNPs passing the
    # genome-wide threshold from the last joint fit)
    final: List[str] = []
    for res in last_results.values():
        c = len(res.beta) - len(res.snp_names)
        for j, snp in enumerate(res.snp_names):
            if res.p[c + j] < significance_threshold:
                final.append(snp)
    final_set = set(final)
    return [s for s in snp_names if s in final_set], last_results
