"""Mesh-sharded genome-scale GWAS — the --parallel-gwas analog.

The reference distributes the per-SNP loop by dealing SNP rows
round-robin to grouped communicators with y/X/V replicated per group
(gwas.cpp:557-687, genotype.cpp:1623).  Here the SNP axis of every
batched per-SNP solver is sharded over the whole mesh
(shard_snp_rows) and XLA SPMD splits the computation; these tests pin
(a) that the arrays really are sharded across all 8 virtual devices
and (b) that results are identical to the single-device path.
"""

import jax
import numpy as np
import pytest

from dissect_tpu.runtime.mesh import MeshContext
from tests.conftest import make_dosage, make_plink


@pytest.fixture
def ctx():
    return MeshContext.create()


@pytest.fixture
def mixed_model_case(rng):
    m, n = 50, 64
    d = make_dosage(rng, m, n)
    z = (d - d.mean(1, keepdims=True)).astype(np.float64)
    a = rng.normal(size=(n, 16))
    k = a @ a.T / 16 + 0.05 * np.eye(n)
    lam, u = np.linalg.eigh(k)
    y = z[:6].sum(0) * 0.2 + rng.normal(size=n)
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    return z, y, x, lam, u


def test_shard_snp_rows_spans_all_devices(ctx, rng):
    from dissect_tpu.runtime.distributed_io import shard_snp_rows

    z = rng.normal(size=(50, 64))  # 50 % 8 != 0 -> padded to 56
    zs, m = shard_snp_rows(z, ctx)
    assert m == 50 and zs.shape == (56, 64)
    assert len(zs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(zs)[:50], z)
    np.testing.assert_array_equal(np.asarray(zs)[50:], np.tile(z[-1], (6, 1)))


def test_mlm_ml_refit_sharded_equals_single(ctx, mixed_model_case):
    from dissect_tpu.gwas.mlm import mlm_gwas_ml_refit
    from dissect_tpu.runtime.distributed_io import shard_snp_rows

    z, y, x, lam, u = mixed_model_case
    ref = mlm_gwas_ml_refit(z, y, x, lam, u, (0.5, 0.5))
    zs, m = shard_snp_rows(z, ctx)
    res = mlm_gwas_ml_refit(zs, y, x, lam, u, (0.5, 0.5))
    np.testing.assert_allclose(res.snp_beta[:m], ref.snp_beta, rtol=1e-6)
    np.testing.assert_allclose(res.snp_p[:m], ref.snp_p, rtol=1e-5, atol=1e-12)
    np.testing.assert_array_equal(res.converged[:m], ref.converged)


def test_ols_sharded_equals_single(ctx, rng):
    from dissect_tpu.gwas.ols import ols_gwas
    from dissect_tpu.runtime.distributed_io import shard_snp_rows

    z = rng.normal(size=(48, 40))
    y = rng.normal(size=40)
    x = np.column_stack([np.ones(40), rng.normal(size=40)])
    ref = ols_gwas(z, y, x)
    zs, m = shard_snp_rows(z, ctx)
    res = ols_gwas(zs, y, x)
    np.testing.assert_allclose(res.snp_beta[:m], ref.snp_beta, rtol=1e-6)
    np.testing.assert_allclose(res.snp_p[:m], ref.snp_p, rtol=1e-5, atol=1e-12)


def test_chunked_gwas_sharded_pipeline(ctx, rng):
    """_chunked_gwas with a mesh: chunks are uploaded sharded (next
    chunk in flight while the current computes), padded rows trimmed,
    and the concatenated results match one unsharded pass."""
    from dissect_tpu.analysis.dispatcher import _chunked_gwas
    from dissect_tpu.gwas.ols import ols_gwas

    z = rng.normal(size=(70, 32))
    y = rng.normal(size=32)
    x = np.ones((32, 1))
    ref = ols_gwas(z, y, x)
    res = _chunked_gwas(lambda zc: ols_gwas(zc, y, x), z, chunk=24, ctx=ctx)
    np.testing.assert_allclose(res.snp_beta, ref.snp_beta, rtol=1e-6)
    np.testing.assert_allclose(res.snp_p, ref.snp_p, rtol=1e-5, atol=1e-12)
    assert res.snp_beta.shape == (70,)


def test_igwas_sharded_equals_single(ctx, mixed_model_case):
    from dissect_tpu.gwas.igwas import igwas

    z, y, x, lam, u = mixed_model_case
    names = [f"s{i}" for i in range(z.shape[0])]
    ref = igwas(z, names, x, ["mean", "quantitative_q"], covariance=(lam, u))
    res = igwas(
        z, names, x, ["mean", "quantitative_q"], covariance=(lam, u),
        mesh_ctx=ctx,
    )
    np.testing.assert_allclose(res.beta, ref.beta, rtol=1e-6)
    np.testing.assert_allclose(res.group_p, ref.group_p, rtol=1e-5, atol=1e-12)
    assert res.beta.shape[0] == z.shape[0]


def test_mp_gwas_sharded_equals_single(ctx, rng):
    from dissect_tpu.gwas.mp import mp_gwas
    from dissect_tpu.io.labeled_matrix import LabeledMatrix

    m, n, p = 30, 24, 3
    z = rng.normal(size=(m, n))
    lm = LabeledMatrix(
        [f"F{i}@I{i}" for i in range(n)],
        [f"ph{j}" for j in range(p)],
        rng.normal(size=(n, p)),
    )
    names = [f"s{i}" for i in range(m)]
    ref = mp_gwas(z, names, lm)
    res = mp_gwas(z, names, lm, mesh_ctx=ctx)
    np.testing.assert_allclose(res.beta, ref.beta, rtol=1e-6)
    np.testing.assert_allclose(res.p, ref.p, rtol=1e-5, atol=1e-12)
    assert res.beta.shape == (m, p)


def test_retry_unfitted_rescues_snps(mixed_model_case):
    """The warm-started retry pass (the batched analog of the
    reference's averaged sequential warm starts, gwas.cpp:836-869)
    strictly shrinks the unfitted set on an iteration-starved run."""
    from dissect_tpu.gwas.mlm import mlm_gwas_ml_refit

    z, y, x, lam, u = mixed_model_case
    base = mlm_gwas_ml_refit(
        z, y, x, lam, u, (0.5, 0.5), n_iterations=3, retry_unfitted=False
    )
    n_base = int(base.converged.sum())
    assert n_base < len(base.converged), "case must leave unfitted SNPs"
    retried = mlm_gwas_ml_refit(
        z, y, x, lam, u, (0.5, 0.5), n_iterations=3, retry_unfitted=True
    )
    n_retry = int(retried.converged.sum())
    assert n_retry > n_base
    # converged-in-both SNPs keep their single-pass answers
    both = base.converged & retried.converged
    np.testing.assert_allclose(
        retried.snp_beta[both], base.snp_beta[both], rtol=1e-6
    )


def test_cli_gwas_ols_distributed(tmp_path, rng):
    """--gwas without a GRM (OLS) through the CLI on the 8-device mesh
    equals the single-device run."""
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    d = make_dosage(rng, 40, 48)
    bfile, _ = make_plink(tmp_path, d, prefix="c")
    y = d[:5].sum(0) * 0.3 + rng.normal(size=48)
    pheno = tmp_path / "p.txt"
    with open(pheno, "w") as fh:
        for i in range(48):
            fh.write(f"F{i} I{i} {y[i]:.6f}\n")

    def run(args):
        try:
            main(args)
        finally:
            set_mesh_context(None)

    run(["--gwas", "--bfile", bfile, "--pheno", str(pheno),
         "--out", f"{tmp_path}/s", "--mesh", "none"])
    run(["--gwas", "--bfile", bfile, "--pheno", str(pheno),
         "--out", f"{tmp_path}/d", "--mesh", "8", "--force-distributed"])
    p1 = np.loadtxt(f"{tmp_path}/s.gwas.snps", skiprows=1, usecols=(8,))
    p8 = np.loadtxt(f"{tmp_path}/d.gwas.snps", skiprows=1, usecols=(8,))
    np.testing.assert_allclose(p8, p1, rtol=1e-4, atol=1e-10)


def test_parallel_gwas_flag_engages_mesh(tmp_path, rng):
    """--parallel-gwas shards the SNP axis even below
    --distributed-threshold (the reference flag that split the grid
    into grouped communicators, gwas.cpp:557-687) and produces the
    same results as the unsharded run."""
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    d = make_dosage(rng, 30, 40)
    bfile, _ = make_plink(tmp_path, d, prefix="c")
    y = d[:4].sum(0) * 0.3 + rng.normal(size=40)
    pheno = tmp_path / "p.txt"
    with open(pheno, "w") as fh:
        for i in range(40):
            fh.write(f"F{i} I{i} {y[i]:.6f}\n")

    def run(args):
        try:
            main(args)
        finally:
            set_mesh_context(None)

    run(["--gwas", "--bfile", bfile, "--pheno", str(pheno),
         "--out", f"{tmp_path}/s", "--mesh", "none"])
    run(["--gwas", "--bfile", bfile, "--pheno", str(pheno),
         "--out", f"{tmp_path}/d", "--mesh", "8", "--parallel-gwas"])
    p1 = np.loadtxt(f"{tmp_path}/s.gwas.snps", skiprows=1, usecols=(8,))
    p8 = np.loadtxt(f"{tmp_path}/d.gwas.snps", skiprows=1, usecols=(8,))
    np.testing.assert_allclose(p8, p1, rtol=1e-4, atol=1e-10)


def test_grouped_gwas_sharded_equals_single(ctx, rng):
    """Bucketed joint group fits sharded over the mesh's group axis
    equal the single-device run (OLS and mixed-model buckets)."""
    from collections import OrderedDict

    from dissect_tpu.gwas.grouped import grouped_gwas

    m, n = 36, 48
    d = make_dosage(rng, m, n)
    z = (d - d.mean(1, keepdims=True)).astype(np.float64)
    names = [f"s{i}" for i in range(m)]
    grouping = OrderedDict(
        (f"g{j}", [f"s{i}" for i in range(j * 4, j * 4 + 4)])
        for j in range(9)
    )  # 9 groups of 4 -> padded to 16 on an 8-device mesh
    y = z[:5].sum(0) * 0.3 + rng.normal(size=n)
    x = np.ones((n, 1))
    a = rng.normal(size=(n, 12))
    k = a @ a.T / 12 + 0.1 * np.eye(n)
    lam, u = np.linalg.eigh(k)
    for cov in (None, (lam, u, (0.5, 0.5))):
        ref, _ = grouped_gwas(z, names, grouping, y, x, covariance=cov)
        res, _ = grouped_gwas(
            z, names, grouping, y, x, covariance=cov, mesh_ctx=ctx
        )
        assert ref.keys() == res.keys()
        for g in ref:
            np.testing.assert_allclose(
                res[g].beta, ref[g].beta, rtol=1e-6, atol=1e-10
            )
            np.testing.assert_allclose(
                res[g].f_p_value, ref[g].f_p_value, rtol=1e-5, atol=1e-12
            )


def test_mpgwas_and_igwas_chunked_dispatch(tmp_path, rng, monkeypatch):
    """Genome-scale chunked streaming for mpgwas and igwas (chunk
    patched small): identical outputs to the one-shot run."""
    import dissect_tpu.analysis.dispatcher as disp
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    d = make_dosage(rng, 50, 40)
    bfile, _ = make_plink(tmp_path, d, prefix="c")
    y = d[:4].sum(0) * 0.3 + rng.normal(size=40)
    y2 = d[4:8].sum(0) * 0.3 + rng.normal(size=40)
    pheno = tmp_path / "p.txt"
    with open(pheno, "w") as fh:
        for i in range(40):
            fh.write(f"F{i} I{i} {y[i]:.6f} {y2[i]:.6f}\n")
    tc = tmp_path / "tc.txt"
    with open(tc, "w") as fh:
        for i in range(40):
            fh.write(f"F{i} I{i} {rng.normal():.6f}\n")

    def run(args):
        try:
            main(args)
        finally:
            set_mesh_context(None)

    base = ["--bfile", bfile, "--pheno", str(pheno), "--mesh", "none"]
    run(["--make-grm"] + base + ["--out", f"{tmp_path}/g"])
    run(["--mpresiduals", "--grm", f"{tmp_path}/g"] + base
        + ["--out", f"{tmp_path}/one"])
    run(["--mpgwas"] + base + ["--out", f"{tmp_path}/one"])
    run(["--igwas", "--bfile", bfile, "--igwas-qcovar", str(tc),
         "--mesh", "none", "--out", f"{tmp_path}/ig1"])

    monkeypatch.setattr(disp, "GWAS_CHUNK_SNPS", 16)
    import shutil
    for suffix in (".residuals.dat", ".residuals.rowids",
                   ".residuals.colids"):
        shutil.copy(f"{tmp_path}/one{suffix}", f"{tmp_path}/two{suffix}")
    run(["--mpgwas"] + base + ["--out", f"{tmp_path}/two"])
    run(["--igwas", "--bfile", bfile, "--igwas-qcovar", str(tc),
         "--mesh", "none", "--out", f"{tmp_path}/ig2"])

    a = open(f"{tmp_path}/one.mpgwas").read()
    b = open(f"{tmp_path}/two.mpgwas").read()
    assert a == b
    a = open(f"{tmp_path}/ig1.igwas").read()
    b = open(f"{tmp_path}/ig2.igwas").read()
    assert a == b
