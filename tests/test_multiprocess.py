"""2-process CPU multi-host simulation of the distributed IO path.

Spawns two real processes (each with 4 virtual CPU devices) that
initialize jax.distributed against a local coordinator and run the
production CLI --make-grm through _stream_grm_multiprocess — the
branch single-process tests can never reach.  The root-written .grm.*
artifact must equal the single-process result (parity intent:
per-process BED block-row reads + collective assembly,
genotype.cpp:639-707 / communicator.cpp:565-628).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_dosage, make_plink

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).resolve().parent / "multiproc_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_grm_matches_single(tmp_path, rng):
    d = make_dosage(rng, 40, 48, missing_rate=0.03)
    bfile, data = make_plink(tmp_path, d, prefix="cohort")
    y = rng.normal(size=48)
    with open(f"{tmp_path}/multi.pheno.txt", "w") as fh:
        for i, ind in enumerate(data.individuals):
            fh.write(f"{ind.family_id} {ind.individual_id} {y[i]:.6g}\n")

    # single-process reference result
    from dissect_tpu.analysis.dispatcher import main as cli_main
    from dissect_tpu.runtime.mesh import set_mesh_context

    try:
        cli_main(["--make-grm", "--bfile", bfile, "--out",
                  f"{tmp_path}/single", "--mesh", "none"])
        cli_main(["--reml", "--grm", f"{tmp_path}/single", "--pheno",
                  f"{tmp_path}/multi.pheno.txt", "--reml-maxit", "40",
                  "--out", f"{tmp_path}/single.r", "--mesh", "none"])
    finally:
        set_mesh_context(None)

    coordinator = f"localhost:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = str(REPO)
    env["DISSECT_TPU_PLATFORM"] = "cpu"  # belt-and-braces platform pin
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), coordinator, bfile,
             f"{tmp_path}/multi"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=str(tmp_path), text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_{i}_OK" in out

    from dissect_tpu.io.grm_io import read_grm

    single = read_grm(f"{tmp_path}/single")
    multi = read_grm(f"{tmp_path}/multi")
    assert single["individual_keys"] == multi["individual_keys"]
    np.testing.assert_allclose(
        np.asarray(multi["kernel"]), np.asarray(single["kernel"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(multi["counts"]), np.asarray(single["counts"])
    )

    # --reml through the DistributedREMLEngine on 2 processes: the
    # root-written variances must match the single-process fit
    def reml_vars(path):
        out = {}
        for line in open(path):
            parts = line.split()
            if len(parts) >= 2 and parts[0].startswith("Var("):
                try:
                    out.setdefault(parts[0], float(parts[1]))
                except ValueError:
                    pass
        return out

    v_single = reml_vars(f"{tmp_path}/single.r.reml")
    v_multi = reml_vars(f"{tmp_path}/multi.r.reml")
    assert set(v_single) == set(v_multi) and v_single
    for key in v_single:
        np.testing.assert_allclose(
            v_multi[key], v_single[key], rtol=5e-3, atol=1e-6,
            err_msg=key,
        )
    # --pca through the distributed dispatch (randomized top-4 here)
    evals = np.loadtxt(f"{tmp_path}/multi.p.pca.eigenvalues")
    assert np.isfinite(evals).all() and evals.shape == (4,)
