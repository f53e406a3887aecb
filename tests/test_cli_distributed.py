"""CLI-level distributed dispatch: the 8-device mesh path must produce
the same results as the single-device path.

Parity intent: the reference is grid-distributed by default — the
Communicator is constructed before any analysis (main.cpp:57) and
results are independent of the grid shape (ScaLAPACK semantics).  Here
`--force-distributed` engages the sharded engines (streaming P('i','j')
GRM, row-sharded DistributedREMLEngine, distributed QDWH eigensolver)
through the SAME user-facing CLI, and outputs must match the default
run to numerical tolerance.
"""

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink


@pytest.fixture
def cohort(tmp_path, rng):
    d = make_dosage(rng, 60, 72)
    bfile, data = make_plink(tmp_path, d, prefix="cohort")
    z = (d - d.mean(1, keepdims=True)) / (d.std(1, keepdims=True) + 1e-9)
    y = z[:12].sum(0) / np.sqrt(12) * 0.7 + rng.normal(size=72) * 0.7
    pheno = tmp_path / "pheno.txt"
    with open(pheno, "w") as fh:
        for i in range(72):
            fh.write(f"F{i} I{i} {y[i]:.6f}\n")
    return bfile, str(pheno), tmp_path


def _run(args):
    from dissect_tpu.analysis.dispatcher import main
    from dissect_tpu.runtime.mesh import set_mesh_context

    try:
        main(args)
    finally:
        set_mesh_context(None)  # don't leak the mesh into other tests


DIST = ["--mesh", "8", "--force-distributed"]


def _read_grm_pair(prefix):
    from dissect_tpu.io.grm_io import read_grm

    k = read_grm(prefix)
    return np.asarray(k["kernel"]), np.asarray(k["counts"])


def test_cli_grm_distributed_equals_single(cohort):
    bfile, pheno, tmp = cohort
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/single",
          "--mesh", "none"])
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/dist"] + DIST)
    k1, c1 = _read_grm_pair(f"{tmp}/single")
    k8, c8 = _read_grm_pair(f"{tmp}/dist")
    np.testing.assert_allclose(k8, k1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c8, c1)


def test_cli_reml_distributed_equals_single(cohort):
    bfile, pheno, tmp = cohort
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/g",
          "--mesh", "none"])

    def read_reml(path):
        out = {}
        for line in open(path):
            parts = line.split()
            try:
                if len(parts) >= 3 and (
                    parts[0].startswith("Var(") or "/" in parts[0]
                ):
                    out[parts[0]] = (float(parts[1]), float(parts[2]))
            except ValueError:
                continue
        return out

    _run(["--reml", "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/rs", "--mesh", "none"])
    _run(["--reml", "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/rd"] + DIST)
    single, dist = read_reml(f"{tmp}/rs.reml"), read_reml(f"{tmp}/rd.reml")
    assert single.keys() == dist.keys() and "Var(GRM)" in single
    for name in single:
        np.testing.assert_allclose(
            dist[name], single[name], rtol=5e-4, atol=1e-6, err_msg=name
        )


def test_cli_reml_distributed_pads_indivisible_n(cohort):
    """72 individuals minus some: n not divisible by 8 devices * block —
    the engine identity-pads instead of raising (ScaLAPACK partial
    trailing blocks analog, matrix.cpp:1748-1786)."""
    bfile, pheno, tmp = cohort
    keep = tmp / "keep.txt"
    with open(keep, "w") as fh:
        for i in range(67):  # prime-ish count
            fh.write(f"F{i} I{i}\n")
    _run(["--make-grm", "--bfile", bfile, "--keep", str(keep),
          "--out", f"{tmp}/g67", "--mesh", "none"])
    _run(["--reml", "--grm", f"{tmp}/g67", "--pheno", pheno,
          "--out", f"{tmp}/rs67", "--mesh", "none"])
    _run(["--reml", "--grm", f"{tmp}/g67", "--pheno", pheno,
          "--out", f"{tmp}/rd67"] + DIST)
    v1 = [l for l in open(f"{tmp}/rs67.reml") if l.startswith("Var(GRM)")][0]
    v8 = [l for l in open(f"{tmp}/rd67.reml") if l.startswith("Var(GRM)")][0]
    np.testing.assert_allclose(
        float(v8.split()[1]), float(v1.split()[1]), rtol=5e-4, atol=1e-6
    )


def test_cli_pca_distributed_equals_single(cohort):
    bfile, pheno, tmp = cohort
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/g",
          "--mesh", "none"])
    _run(["--pca", "--grm", f"{tmp}/g", "--num-eval", "5",
          "--out", f"{tmp}/ps", "--mesh", "none"])
    _run(["--pca", "--grm", f"{tmp}/g", "--num-eval", "5",
          "--out", f"{tmp}/pd"] + DIST)
    w1 = np.loadtxt(f"{tmp}/ps.pca.eigenvalues")
    w8 = np.loadtxt(f"{tmp}/pd.pca.eigenvalues")
    np.testing.assert_allclose(w8, w1, rtol=1e-6, atol=1e-8)


def test_cli_gwas_distributed_null_fit(cohort):
    """Mixed-model GWAS with the distributed diagonalization for the
    null fit matches the single-device run (gwas.cpp:1509-1595)."""
    bfile, pheno, tmp = cohort
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/g",
          "--mesh", "none"])
    _run(["--gwas", "--bfile", bfile, "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/ws", "--mesh", "none"])
    _run(["--gwas", "--bfile", bfile, "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/wd"] + DIST)
    p1 = np.loadtxt(f"{tmp}/ws.gwas.snps", skiprows=1, usecols=(8,))
    p8 = np.loadtxt(f"{tmp}/wd.gwas.snps", skiprows=1, usecols=(8,))
    np.testing.assert_allclose(p8, p1, rtol=1e-3, atol=1e-8)


def test_mesh_spec_parsing():
    from dissect_tpu.runtime.distributed import parse_mesh_spec

    assert parse_mesh_spec("none") is None
    ctx = parse_mesh_spec("auto")
    assert ctx is not None and ctx.n_devices == 8
    ctx = parse_mesh_spec("2x4")
    assert ctx.mesh.devices.shape == (2, 4)
    ctx = parse_mesh_spec("4")
    assert ctx.n_devices == 4
    with pytest.raises(ValueError):
        parse_mesh_spec("4x4")


def test_cli_default_block_size_reml(cohort):
    """--default-block-size (the BLACS_BLOCKSIZE analog) sets the
    distributed Cholesky panel width; results are block-size
    independent (ScaLAPACK semantics)."""
    bfile, pheno, tmp = cohort
    _run(["--make-grm", "--bfile", bfile, "--out", f"{tmp}/g",
          "--mesh", "none"])
    _run(["--reml", "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/rb", "--default-block-size", "4"] + DIST)
    _run(["--reml", "--grm", f"{tmp}/g", "--pheno", pheno,
          "--out", f"{tmp}/rs2", "--mesh", "none"])
    vb = [l for l in open(f"{tmp}/rb.reml") if l.startswith("Var(GRM)")][0]
    vs = [l for l in open(f"{tmp}/rs2.reml") if l.startswith("Var(GRM)")][0]
    np.testing.assert_allclose(
        float(vb.split()[1]), float(vs.split()[1]), rtol=5e-4, atol=1e-6
    )
