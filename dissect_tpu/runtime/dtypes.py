"""Precision policy — the TPU answer to the reference's fp64/fp32 mix.

The reference iterates REML with fp32 Cholesky inversions early and
switches to fp64 near convergence (reference: matrix.cpp:3080-3138,
reml.cpp:1673-1724, flag --no-single-precision options.cpp:1098).  TPU
fp64 is weak, so the policy here is:

  * big matmuls (GRM syrk, P-matrix gemms) in fp32 with fp32 accumulation
    (`preferred_element_type`), optionally bf16 inputs for the MXU;
  * scalar-sensitive reductions (log-dets, traces, gradients) accumulated
    in fp32 (or fp64 when x64 is enabled, e.g. CPU tests / final refine);
  * the REML "refinement" iterations can run in fp64 when
    `jax.config.jax_enable_x64` is on (CPU or TPU-emulated).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through compute paths."""

    compute: jnp.dtype  # bulk matmul / elementwise dtype
    accum: jnp.dtype  # accumulation dtype (preferred_element_type)
    solve: jnp.dtype  # Cholesky / eigensolver dtype
    index: jnp.dtype = jnp.int32

    @property
    def highest(self):
        return jnp.promote_types(jnp.promote_types(self.compute, self.accum), self.solve)


def default_policy() -> Policy:
    """fp64 everywhere when x64 is on (tests / parity), else fp32."""
    if x64_enabled():
        f = jnp.dtype(jnp.float64)
        return Policy(compute=f, accum=f, solve=f)
    f = jnp.dtype(jnp.float32)
    return Policy(compute=f, accum=f, solve=f)


def fast_tpu_policy() -> Policy:
    """bf16 MXU inputs, fp32 accumulation — for throughput benchmarks."""
    return Policy(compute=jnp.dtype(jnp.bfloat16), accum=jnp.dtype(jnp.float32), solve=jnp.dtype(jnp.float32))
