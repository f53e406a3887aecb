"""Newton logistic regression.

Parity: glm.{h,cpp} — logit link (glm.h:36-40), probabilities
p = 1/(1+exp(-(X b + u))) (computeProbabilities, glm.cpp:145),
gradient X'(y - p) (computeLogLikelihoodGradient, glm.cpp:206), Hessian
-X' diag(p(1-p)) X, Newton iterations until all parameter relative
differences drop below threshold (allParametersRelativeDifferencesLowerThan,
glm.h:71).

TPU-first: the whole Newton loop is one jitted lax.while_loop; the
distributed X'WX products the reference delegates to pdgemm are plain
jnp matmuls under SPMD.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LogisticGLM:
    betas: np.ndarray
    se: np.ndarray
    probabilities: np.ndarray
    log_likelihood: float
    n_iterations: int
    success: bool


@partial(jax.jit, static_argnames=("max_iterations",))
def _fit_core(y, x, offset, beta0, threshold, max_iterations):
    def step(state):
        beta, _, it, _ = state
        eta = x @ beta + offset
        p = jax.nn.sigmoid(eta)
        w = p * (1.0 - p)
        grad = x.T @ (y - p)
        hess = (x.T * w) @ x
        delta = jnp.linalg.solve(hess, grad)
        new_beta = beta + delta
        rel = jnp.max(jnp.abs(delta) / jnp.maximum(jnp.abs(beta), 1e-12))
        return new_beta, rel, it + 1, jnp.all(jnp.isfinite(new_beta))

    def cond(state):
        _, rel, it, finite = state
        return (rel > threshold) & (it < max_iterations) & finite

    init = (beta0, jnp.asarray(jnp.inf, y.dtype), 0, jnp.asarray(True))
    beta, rel, n_iter, finite = jax.lax.while_loop(cond, step, init)
    eta = x @ beta + offset
    p = jax.nn.sigmoid(eta)
    w = p * (1.0 - p)
    hess = (x.T * w) @ x
    cov = jnp.linalg.inv(hess)
    logl = jnp.sum(y * eta - jnp.log1p(jnp.exp(eta)))
    return beta, jnp.sqrt(jnp.diagonal(cov)), p, logl, n_iter, finite & (rel <= threshold)


def fit_logistic(
    y,
    x,
    offset=None,
    beta0: Optional[np.ndarray] = None,
    threshold: float = 1e-6,
    max_iterations: int = 50,
    dtype=None,
) -> LogisticGLM:
    """Fit logit(P(y=1)) = X b (+ offset for fixed random effects).

    y coded 0/1 (callers translate the reference's 1/2 case-control
    coding).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    yv = jnp.asarray(y, dtype=dtype)
    xm = jnp.asarray(x, dtype=dtype)
    off = (
        jnp.zeros_like(yv)
        if offset is None
        else jnp.asarray(offset, dtype=dtype)
    )
    b0 = (
        jnp.zeros(xm.shape[1], dtype=dtype)
        if beta0 is None
        else jnp.asarray(beta0, dtype=dtype)
    )
    beta, se, p, logl, n_iter, ok = _fit_core(
        yv, xm, off, b0, threshold, max_iterations
    )
    return LogisticGLM(
        betas=np.asarray(beta),
        se=np.asarray(se),
        probabilities=np.asarray(p),
        log_likelihood=float(logl),
        n_iterations=int(n_iter),
        success=bool(ok),
    )
