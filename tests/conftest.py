"""Test configuration: virtual 8-device CPU mesh + float64.

Multi-device behavior is tested without TPU hardware by forcing the CPU
backend to expose 8 devices (the strategy recommended for the new
framework in SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count).
float64 is enabled for numerical parity checks against numpy references.
"""

import os

# jax may already be pre-imported with JAX_PLATFORMS=axon (the TPU tunnel);
# XLA_FLAGS is still read lazily at CPU-backend init, and the platform is
# switched via jax.config (effective as long as no backend has been used).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def make_dosage(rng, n_snps, n_individuals, maf_low=0.05, maf_high=0.5,
                missing_rate=0.0):
    """Random biallelic dosages (M, N) int8 with optional missingness,
    guaranteed polymorphic."""
    while True:
        p = rng.uniform(maf_low, maf_high, size=n_snps)
        d = (rng.random((n_snps, n_individuals)) < p[:, None]).astype(np.int8)
        d += (rng.random((n_snps, n_individuals)) < p[:, None]).astype(np.int8)
        if missing_rate > 0:
            miss = rng.random((n_snps, n_individuals)) < missing_rate
            d = np.where(miss, np.int8(-1), d)
        observed = d >= 0
        alt = np.where(observed, d, 0).sum(1)
        nobs = observed.sum(1)
        poly = (alt > 0) & (alt < 2 * nobs)
        if poly.all():
            return d


@pytest.fixture
def dosage_small(rng):
    return make_dosage(rng, 64, 32)


def make_plink(tmp_path, dosage, prefix="sim"):
    from dissect_tpu.io.bed import IndividualInfo, PlinkData, SnpInfo, write_plink

    m, n = dosage.shape
    data = PlinkData(
        snps=[
            SnpInfo(str(1 + i % 22), f"snp{i}", 0.0, 1000 + i, "A", "C")
            for i in range(m)
        ],
        individuals=[IndividualInfo(f"F{i}", f"I{i}") for i in range(n)],
        _dosage=dosage,
    )
    path = str(tmp_path / prefix)
    write_plink(path, data)
    return path, data
