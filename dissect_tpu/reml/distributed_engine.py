"""Distributed dense AI-REML — beyond-HBM covariance matrices.

At 100k+ individuals the (N, N) covariance no longer fits one chip's
HBM, and XLA's native cholesky would gather it.  This engine keeps V,
V^-1, P and every kernel ROW-SHARDED over mesh axis 'i' for the whole
iteration:

  * V assembly, the P projection, subVPy products and all traces are
    plain jnp ops under SPMD (XLA inserts the ICI collectives — the
    pdgemm/pdsymm replacements);
  * the factorization is the shard_map blocked Cholesky
    (linalg/distributed.py, the pdpotrf_ replacement), and V^-1 comes
    from the blocked triangular solve against a sharded identity
    followed by one sharded syrk (W = L^-1, Vi = W^T W — the pdpotri_
    replacement, matrix.cpp:3080-3153).

The float64 host Newton loop is inherited unchanged from REMLEngine —
only the quantities evaluation differs.  Per-device memory is
O(N^2 / D) per resident matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dissect_tpu.linalg.distributed import (
    distributed_cholesky,
    distributed_triangular_solve,
)
from dissect_tpu.model.covariance import CovarianceModel
from dissect_tpu.reml.engine import REMLEngine, REMLOptions


@partial(jax.jit, static_argnames=("mesh", "block", "use_ml"))
def _distributed_dense_quantities(cc, theta, y, x, mesh, block, use_ml=False):
    """Dense REML quantities with a row-sharded covariance.

    Mirrors engine._dense_quantities but replaces the one-chip
    Cholesky/inverse with the distributed factorization.  Multi-trait
    placement is supported through the same CompiledCovariance; the
    sharded axis is the (T n) row axis.
    """
    row_spec = NamedSharding(mesh, P("i", None))

    v = jax.lax.with_sharding_constraint(cc.assemble_dense(theta), row_spec)
    l, logdet_v = distributed_cholesky(v, mesh, "i", block)
    eye = jax.lax.with_sharding_constraint(
        jnp.eye(v.shape[0], dtype=v.dtype), row_spec
    )
    w = distributed_triangular_solve(l, eye, mesh, "i", block)  # L^-1
    vi = jax.lax.with_sharding_constraint(w.T @ w, row_spec)

    vix = vi @ x
    xtvix = x.T @ vix
    xtvix_i = jnp.linalg.inv(xtvix)  # (c, c), replicated
    sign, logdet_x = jnp.linalg.slogdet(xtvix)
    p = jax.lax.with_sharding_constraint(
        vi - vix @ xtvix_i @ vix.T, row_spec
    )
    py = p @ y
    ytpy = y @ py
    mpy = cc.elements_times_vector(py)
    tr_e = cc.element_traces_dense(vi if use_ml else p)
    ypmpy_e = mpy @ py
    a = cc.coefficient_jacobian(theta)
    grad = 0.5 * (a.T @ ypmpy_e - a.T @ tr_e)
    subvpy = jnp.einsum("ei,ek->ik", mpy, a)
    psubvpy = p @ subvpy
    ai = 0.5 * subvpy.T @ psubvpy
    h = cc.coefficient_hessian(theta)
    tr_p_e = cc.element_traces_dense(p) if use_ml else tr_e
    ai = ai + 0.25 * jnp.einsum("ekl,e->kl", h, tr_p_e - ypmpy_e)
    return {
        "logdet_v": logdet_v,
        "logdet_xtvix": logdet_x,
        "ytpy": ytpy,
        "grad": grad,
        "ai": ai,
        "finite": jnp.isfinite(logdet_v)
        & jnp.isfinite(ytpy)
        & jnp.all(jnp.isfinite(grad))
        & jnp.all(jnp.isfinite(ai)),
        "py": py,
        "vix": vix,
        "xtvix_i": xtvix_i,
        "vi": vi,
    }


class DistributedREMLEngine(REMLEngine):
    """REMLEngine whose quantities run with row-sharded matrices.

    `block` is the Cholesky panel width; (T n) must be divisible by the
    mesh's 'i' size and by `block`.  float64 refinement is disabled (it
    would gather the matrices to one host).
    """

    def __init__(
        self,
        model: CovarianceModel,
        y: np.ndarray,
        x: np.ndarray,
        mesh: Mesh,
        options: Optional[REMLOptions] = None,
        block: int = 256,
        dtype=None,
    ):
        import dataclasses

        options = options or REMLOptions()
        options = dataclasses.replace(options, float64_refine=False)
        super().__init__(model, y, x, options, dtype=dtype)
        if model.n_total % mesh.shape["i"] or model.n_total % block:
            raise ValueError(
                f"n_total={model.n_total} must divide by mesh 'i' size and block"
            )
        self.mesh = mesh
        self.block = block
        # shard every element matrix over rows
        import dataclasses as _dc

        spec = NamedSharding(mesh, P("i", None))
        self.cc = _dc.replace(
            self.cc,
            element_matrices=tuple(
                jax.device_put(m, spec) for m in self.cc.element_matrices
            ),
        )
        use_ml = options.use_ml
        self._quantities = lambda theta: _distributed_dense_quantities(
            self.cc,
            jnp.asarray(theta, dtype=self.dtype),
            self.y,
            self.x,
            self.mesh,
            self.block,
            use_ml,
        )
