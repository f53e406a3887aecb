"""Experimental logistic mixed model via MCMC.

Parity: glmm.{h,cpp} (marked "Unfinished" in the reference,
main.cpp:200): given a prepared covariance V = sum s2_i K_i from a REML
setup, random effects u are sampled by Metropolis-Hastings using the
conditional Gaussian proposal built from the precision matrix's
diagonal (MHSampling, glmm.cpp:104-200: proposal mean
-D^-1 (V^-1 - D) u, variance D^-1 with D = diag(V^-1)), accepted on the
logistic likelihood ratio; fixed effects beta are refit by Newton
logistic regression with the posterior-mean random effects as offset
(GLMM::fit / iteration, glmm.cpp:210+).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.glm.logistic import fit_logistic


@dataclasses.dataclass
class GLMMResult:
    betas: np.ndarray
    betas_se: np.ndarray
    random_effects: np.ndarray  # posterior mean
    acceptance_rate: float
    n_iterations: int
    success: bool


class GLMM:
    """Logistic mixed model: logit(P(y=1)) = X b + u, u ~ N(0, V)."""

    def __init__(self, y, x, v, seed: int = 1):
        self.y = np.asarray(y, dtype=np.float64)
        self.x = np.asarray(x, dtype=np.float64)
        self.v = np.asarray(v, dtype=np.float64)
        self.v_inv = np.linalg.inv(self.v)
        self.seed = seed

    def _mh_chain(self, beta, u0, n_samples, key):
        """MH over random effects with the conditional-Gaussian proposal."""
        d = np.diag(self.v_inv).copy()
        d_inv = 1.0 / d
        off_diag = self.v_inv - np.diag(d)
        eta_fixed = self.x @ beta
        u = u0.copy()
        samples = []
        accepted = 0
        rng = np.random.default_rng(np.asarray(key)[-1])
        for _ in range(n_samples):
            mean = -d_inv * (off_diag @ u)
            proposal = mean + rng.normal(size=len(u)) * np.sqrt(d_inv)
            # logistic log-likelihood ratio (prior terms cancel against the
            # proposal for the conditional update, glmm.cpp:200+)
            eta_new = eta_fixed + proposal
            eta_old = eta_fixed + u
            ll_new = np.sum(self.y * eta_new - np.log1p(np.exp(eta_new)))
            ll_old = np.sum(self.y * eta_old - np.log1p(np.exp(eta_old)))
            if np.log(rng.random()) < ll_new - ll_old:
                u = proposal
                accepted += 1
            samples.append(u.copy())
        return np.asarray(samples), accepted / max(n_samples, 1)

    def fit(
        self,
        n_outer: int = 10,
        n_samples: int = 50,
        burn_in: int = 10,
    ) -> GLMMResult:
        n = len(self.y)
        beta = np.zeros(self.x.shape[1])
        u = np.zeros(n)
        acc = 0.0
        glm = None
        for it in range(n_outer):
            samples, acc = self._mh_chain(
                beta, u, n_samples + burn_in, jax.random.PRNGKey(self.seed + it)
            )
            u = samples[burn_in:].mean(axis=0)
            glm = fit_logistic(self.y, self.x, offset=u, beta0=beta)
            if not glm.success:
                return GLMMResult(
                    betas=beta,
                    betas_se=np.zeros_like(beta),
                    random_effects=u,
                    acceptance_rate=acc,
                    n_iterations=it + 1,
                    success=False,
                )
            beta = glm.betas
        return GLMMResult(
            betas=beta,
            betas_se=glm.se if glm else np.zeros_like(beta),
            random_effects=u,
            acceptance_rate=acc,
            n_iterations=n_outer,
            success=True,
        )
