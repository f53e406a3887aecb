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

Arbitrary N is supported by identity-padding: every trait block is
zero-padded up to the next multiple of (devices * block) and V gains
ones on the pad diagonal.  The pad rows of y/X are zero and every
element matrix is zero there, so log|V|, y'Py, gradients, traces and
the AI matrix are EXACT for the unpadded problem (the analog of
ScaLAPACK's partial trailing blocks, matrix.cpp:1748-1786); post-fit
vectors (BLUPs, residuals, Py) are sliced back to the real layout.

The float64 host Newton loop is inherited unchanged from REMLEngine;
the mixed-precision ENDGAME (the reference's fp32-early/fp64-late
switch, reml.cpp:1673-1724, matrix.cpp:3080-3138) runs the SAME
row-sharded quantities in float64 on the mesh — the matrices are never
gathered to one host, so the double-precision finish survives at
beyond-HBM N.  Per-device memory is O(N^2 / D) per resident matrix.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dissect_tpu.linalg.distributed import spd_inverse_logdet_cyclic
from dissect_tpu.model.covariance import CovarianceModel
from dissect_tpu.reml.engine import REMLEngine, REMLOptions


def pick_block(n_total: int, n_devices: int, requested: Optional[int] = None) -> int:
    """Cholesky panel width: largest power of two <= n_total/devices,
    capped at 256 (the MXU-friendly panel), floored at 8."""
    if requested is not None:
        return requested
    per_dev = max(n_total // max(n_devices, 1), 8)
    block = 8
    while block * 2 <= min(per_dev, 256):
        block *= 2
    return block


@partial(jax.jit, static_argnames=("mesh", "block", "use_ml"))
def _distributed_dense_quantities(
    cc, theta, y, x, pad_diag, mesh, block, use_ml=False
):
    """Dense REML quantities with a row-sharded covariance.

    Mirrors engine._dense_quantities but replaces the one-chip
    Cholesky/inverse with the distributed factorization.  Multi-trait
    placement is supported through the same CompiledCovariance; the
    sharded axis is the (T n) row axis.  `pad_diag` carries ones on the
    identity-pad rows (zeros everywhere real); all returned quantities
    are exact for the unpadded problem.
    """
    row_spec = NamedSharding(mesh, P("i", None))

    v = cc.assemble_dense(theta) + jnp.diag(pad_diag.astype(theta.dtype))
    v = jax.lax.with_sharding_constraint(v, row_spec)
    # block-CYCLIC factorization: balanced trailing updates, the
    # reference's BLACS layout (communicator.cpp:82-96)
    vi, logdet_v = spd_inverse_logdet_cyclic(v, mesh, "i", block)

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

    `block` is the Cholesky panel width (auto-picked when None); any
    (T n) works — every trait block is identity-padded up to the next
    multiple of devices*block internally.
    """

    def __init__(
        self,
        model: CovarianceModel,
        y: np.ndarray,
        x: np.ndarray,
        mesh: Mesh,
        options: Optional[REMLOptions] = None,
        block: Optional[int] = None,
        dtype=None,
    ):
        options = options or REMLOptions()
        super().__init__(model, y, x, options, dtype=dtype)
        if self.cc.diagonal:
            raise ValueError(
                "DistributedREMLEngine is the dense-covariance path; "
                "diagonalized models run O(n) on one device"
            )
        n_dev = mesh.shape["i"]
        self.block = pick_block(model.n_total, n_dev, block)
        self.mesh = mesh
        quantum = n_dev * self.block

        real_sizes = self.cc.trait_sizes
        padded_sizes = tuple(s + ((-s) % quantum) for s in real_sizes)
        spec = NamedSharding(mesh, P("i", None))
        mats = []
        for m, (ti, tj) in zip(self.cc.element_matrices, self.cc.blocks):
            pr = padded_sizes[ti] - m.shape[0]
            pc = padded_sizes[tj] - m.shape[1]
            mp = np.pad(np.asarray(m, dtype=self.dtype), ((0, pr), (0, pc)))
            mats.append(jax.device_put(mp, spec))
        self.cc = dataclasses.replace(
            self.cc, trait_sizes=padded_sizes, element_matrices=tuple(mats)
        )
        # real-row index into the padded (T n_pad) layout
        pad_off = np.cumsum([0] + list(padded_sizes))[:-1]
        self._real_idx = np.concatenate(
            [po + np.arange(s) for po, s in zip(pad_off, real_sizes)]
        ).astype(np.int64)
        total_pad = sum(padded_sizes)
        pad_mask = np.ones(total_pad)
        pad_mask[self._real_idx] = 0.0
        self._pad_diag = jnp.asarray(pad_mask, dtype=self.dtype)
        y_pad = np.zeros(total_pad)
        y_pad[self._real_idx] = np.asarray(y, dtype=np.float64)
        x_arr = np.asarray(x, dtype=np.float64)
        x_pad = np.zeros((total_pad, x_arr.shape[1]))
        x_pad[self._real_idx] = x_arr
        self.y = jnp.asarray(y_pad, dtype=self.dtype)
        self.x = jnp.asarray(x_pad, dtype=self.dtype)

        use_ml = options.use_ml
        self._quantities = lambda theta: _distributed_dense_quantities(
            self.cc,
            jnp.asarray(theta, dtype=self.dtype),
            self.y,
            self.x,
            self._pad_diag,
            self.mesh,
            self.block,
            use_ml,
        )

    # --- post-fit consumers: slice the pad rows back out -------------------
    def compute_blup_individuals(self, sub_id: str):
        return super().compute_blup_individuals(sub_id)[self._real_idx]

    def compute_blup_errors(self, sub_id: str):
        err = super().compute_blup_errors(sub_id)
        return None if err is None else err[self._real_idx]

    def final_py(self) -> np.ndarray:
        return np.asarray(
            self._final_device_state()["py"], dtype=np.float64
        )[self._real_idx]

    def _refine_float64(self, theta, fixed, n_steps):
        """float64 endgame WITHOUT gathering: the same row-sharded
        quantities re-run at float64 on the mesh (the distributed analog
        of the reference's precision switch, reml.cpp:1673-1724).
        Returns (theta, logL, quantities, AI^-1, converged) like the
        base engine's endgame — steps stop early at convergence so a
        stalled fp32 fit can be salvaged here."""
        use_ml = self.options.use_ml
        var_threshold = self.options.variance_convergence_threshold
        spec = NamedSharding(self.mesh, P("i", None))
        converged = False
        with jax.enable_x64():
            put = lambda a: jax.device_put(np.asarray(a, dtype=np.float64), spec)
            cc64 = dataclasses.replace(
                self.cc,
                element_matrices=tuple(
                    put(m) for m in self.cc.element_matrices
                ),
            )
            y64 = jnp.asarray(np.asarray(self.y, dtype=np.float64))
            x64 = jnp.asarray(np.asarray(self.x, dtype=np.float64))
            pad64 = jnp.asarray(np.asarray(self._pad_diag, dtype=np.float64))
            q = None
            prev_ll = -np.inf
            log_likelihood = -np.inf
            ai_inv_full = np.zeros((len(theta), len(theta)))
            for _ in range(max(n_steps, 1)):
                q = _distributed_dense_quantities(
                    cc64,
                    jnp.asarray(theta, dtype=jnp.float64),
                    y64,
                    x64,
                    pad64,
                    self.mesh,
                    self.block,
                    use_ml,
                )
                grad = np.asarray(q["grad"], dtype=np.float64)
                ai = np.asarray(q["ai"], dtype=np.float64)
                prev_ll = log_likelihood
                log_likelihood = -0.5 * (
                    float(q["logdet_v"])
                    + (0.0 if use_ml else float(q["logdet_xtvix"]))
                    + float(q["ytpy"])
                )
                free = ~fixed
                try:
                    ai_inv = np.linalg.inv(ai[np.ix_(free, free)])
                except np.linalg.LinAlgError:
                    break
                ai_inv_full = np.zeros_like(ai)
                ai_inv_full[np.ix_(free, free)] = ai_inv
                delta = ai_inv_full @ grad
                new_theta = theta + delta
                self._constrain_m1(new_theta)
                with np.errstate(divide="ignore", invalid="ignore"):
                    rel = np.abs(
                        (new_theta - theta) / np.where(theta == 0, 1, theta)
                    )
                ll_diff = log_likelihood - prev_ll
                theta = new_theta
                if bool(np.all(rel <= var_threshold)) and (
                    -1e-2 < ll_diff < 1e-4 or prev_ll == -np.inf
                ):
                    converged = True
                    break
            self.log.message(
                f"  f64d logL {log_likelihood:.6f}  "
                + " ".join(f"{t:.6g}" for t in theta)
            )
        q_np = {
            key: np.asarray(val, dtype=np.float64)
            for key, val in q.items()
            if key in ("logdet_v", "logdet_xtvix", "ytpy", "grad", "ai", "finite")
        }
        return theta, log_likelihood, q_np, ai_inv_full, converged
