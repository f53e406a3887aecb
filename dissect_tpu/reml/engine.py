"""The AI-REML engine.

Parity: reml.{h,cpp}.  Architecture (TPU-first):

  * one jitted "quantities" function evaluates, for a given variance
    vector theta, everything the Newton loop needs: log|V|,
    log|X'ViX|, y'Py, the 0.5-scaled gradient, the AI matrix (with the
    crossed-derivatives correction), and per-element primitives
    (mirrors aiREMLStep's body, reml.cpp:2286-2498, computePMatrix
    reml.cpp:1836-1909, computeAIMatrix reml.cpp:1963-2051,
    computeyPsubVPy_trPsubVVector reml.cpp:2220-2253,
    computeAIMatrixCrossedDerivatesCorrection reml.cpp:2159-2218);
  * the host drives the iteration in float64 numpy — EM first step,
    AI steps with stale-relative-logL damping, constraint methods
    M1/M3, log-logistic reparameterization, convergence tests — the
    single-controller analog of the reference's root-side scalar logic
    (computeREML, reml.cpp:1543-1834).

Two covariance representations (chosen by the CovarianceModel):
  dense     V (Tn, Tn): Cholesky inverse (O(N^3)) per iteration;
  diagonal  V (n, T, T) per-individual blocks: vmapped T x T solves —
            O(n) per iteration, the diagonalized-kernel fast path
            (reml.cpp:480-545, 1896-1908) that powers mpresiduals and
            diagonal GWAS.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.linalg.small import MAX_UNROLL_Q, cholesky_diag_small, inv_spd_small
from dissect_tpu.linalg.spd import (
    fallback_inverse_logdet,
    lu_inverse_logdet,
    spd_inverse_logdet,
    spd_inverse_logdet_auto,
)
from dissect_tpu.model.covariance import (
    CovarianceModel,
    ParameterType,
)
from dissect_tpu.runtime.log import get_logger


@dataclasses.dataclass
class REMLOptions:
    """Defaults parity: options.cpp:102-180 and related flags."""

    max_iterations: int = 40  # --reml-maxit (options.cpp:179)
    variance_convergence_threshold: float = 1e-5  # options.cpp:110
    gradient_convergence_threshold: float = 1e-2  # options.cpp:111
    change_ai_step_threshold: float = 1e-3  # options.cpp:112
    allow_switch_from_ai_to_em: bool = False  # options.cpp:113
    first_step_em: bool = True  # options.cpp:114
    step_weighting_constant: float = 0.3  # options.cpp:120
    allow_convergence_with_constrained: bool = True  # options.cpp:130
    maximum_correlation_covariance_constrain: float = 1.0  # options.cpp:131
    use_log_logistic_scale: bool = False  # options.cpp:133
    variance_constrain_proportion: float = 1e-6  # options.cpp:180
    reml_method_em: bool = False  # --reml-method (REMLMethod=1 => EM only)
    gcta_mode: bool = False  # options.cpp:243
    allow_fixing_variances_to_zero: bool = False  # options.cpp:249
    use_ml: bool = False  # ML instead of REML (GWAS internal fits)
    initial_h2: float = 0.5  # --init-h2 (options.cpp:108)
    # second-derivatives matrix: the AI matrix with the crossed correction
    # (the reference default, forceUseREMLAIWhenNoLinearCovariance=true,
    # options.cpp:141) or the expected-information REML-F/ML-F matrix
    # 0.5 tr(P dV_k P dV_l) (computeREMLFMatrix, reml.cpp:2053-2157)
    use_f_matrix: bool = False
    # mixed precision: after an fp32 fit (TPU), finish with float64
    # Newton steps on the CPU backend — the reference's fp32-early /
    # fp64-late policy (singlePrecisionInversion switch,
    # reml.cpp:1673-1724, matrix.cpp:3080-3138).  No-op when the run is
    # already float64; auto-disabled above `float64_refine_max_n`.
    float64_refine: bool = True
    float64_refine_steps: int = 2
    float64_refine_max_n: int = 20000
    # squared-exponential kernel parameters (options.cpp:142-143)
    exp_kernel_initial_factor: float = 1.0  # --param-init-fac
    parameter_unfix_after: int = 8  # --steps-to-unfix


@dataclasses.dataclass
class REMLResult:
    success: bool
    log_likelihood: float
    variances: np.ndarray
    variance_names: List[str]
    ai_inverse: np.ndarray  # sampling covariance of the estimates
    n_iterations: int
    constrained: List[str]
    warnings: List[str]
    logdet_v: float = 0.0
    logdet_xtvix: float = 0.0

    def variance(self, name: str) -> float:
        return float(self.variances[self.variance_names.index(name)])

    def std_error(self, name: str) -> float:
        i = self.variance_names.index(name)
        return float(np.sqrt(self.ai_inverse[i, i]))


def _logistic(x):
    return 2.0 / (1.0 + np.exp(-x)) - 1.0


def _logistic_inv(y):
    return -np.log(2.0 / (y + 1.0) - 1.0)


class REMLEngine:
    """One REML/ML fit of V(theta) = sum_e g_e(theta) M_e to (y, X).

    y: (Tn,) trait-major concatenated phenotypes; X: (Tn, c) design.
    `y_extra` allows the multi-sample mean-likelihood mode (yList,
    reml.cpp:2304-2350) used by recursive-GWAS group fits.
    """

    def __init__(
        self,
        model: CovarianceModel,
        y: np.ndarray,
        x: np.ndarray,
        options: Optional[REMLOptions] = None,
        y_list: Optional[Sequence[np.ndarray]] = None,
        dtype=None,
    ):
        self.model = model
        self.cc = model.compile()
        self.options = options or REMLOptions()
        self.dimension = model.n_total
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.dtype = dtype
        self.y = jnp.asarray(y, dtype=dtype)
        self.x = jnp.asarray(x, dtype=dtype)
        if self.y.shape != (self.dimension,):
            raise ValueError(f"y shape {self.y.shape} != ({self.dimension},)")
        self.y_list = (
            None
            if y_list is None
            else jnp.asarray(np.stack(y_list), dtype=dtype)
        )
        use_ml = self.options.use_ml
        use_f = self.options.use_f_matrix
        if self.y_list is None:
            if self.cc.has_matrix_params:
                if self.cc.diagonal:
                    raise NotImplementedError(
                        "parameterized kernels are dense-mode only"
                    )
                core = _dense_quantities_autodiff
            else:
                core = (
                    _blockdiag_quantities if self.cc.diagonal else _dense_quantities
                )
            extra = (
                {"backend": jax.default_backend()}
                if core is _dense_quantities
                else {}
            )
            self._quantities = lambda theta: core(
                self.cc, theta, self.y, self.x, use_ml, use_f, **extra
            )
        else:
            self._quantities = lambda theta: _ylist_quantities(
                self.cc, theta, self.y_list, self.x, use_ml, use_f
            )
        # mutable fit state
        self.log = get_logger()

    # ------------------------------------------------------------- host loop
    def _expected_magnitude(self, i: int) -> float:
        v = self.model.variances[i]
        return self.model.group_magnitudes.get(v.group, 1.0)

    def _constrain_m1(self, theta: np.ndarray) -> (int, List[str]):
        """Clamp negative variances / over-bound covariances+correlations
        (constrainVariancesM1, covariancematrix.cpp:1183-1330)."""
        opts = self.options
        constrained: List[str] = []
        n_constrained = 0
        for i, v in enumerate(self.model.variances):
            if v.type == ParameterType.VARIANCE and theta[i] < 0:
                theta[i] = self._expected_magnitude(i) * opts.variance_constrain_proportion
                constrained.append(v.name)
                n_constrained += 1
        for i, v in enumerate(self.model.variances):
            if v.type == ParameterType.COVARIANCE and v.constrained_on_product_of:
                bound = opts.maximum_correlation_covariance_constrain
                for d in v.constrained_on_product_of:
                    bound *= theta[d]
                bound = math.sqrt(abs(bound))
                if abs(theta[i]) > bound:
                    theta[i] = math.copysign(bound, theta[i])
                    constrained.append(v.name)
                    n_constrained += 1
            elif v.type == ParameterType.CORRELATION:
                bound = opts.maximum_correlation_covariance_constrain
                if abs(theta[i]) > bound:
                    theta[i] = math.copysign(bound, theta[i])
                    constrained.append(v.name)
                    n_constrained += 1
        return n_constrained, constrained

    def _constrain_m3(
        self, old_theta: np.ndarray, delta: np.ndarray
    ) -> (np.ndarray, float):
        """Rescale the step until no variance is negative
        (constrainVariancesM3, covariancematrix.cpp:1430-1499)."""
        scaling = 1.0
        theta = old_theta + delta
        is_var = np.array(
            [v.type == ParameterType.VARIANCE for v in self.model.variances]
        )
        while np.any((theta < 0) & is_var):
            scaling *= self.options.step_weighting_constant
            theta = old_theta + delta * scaling
            if scaling == 0.0:
                raise RuntimeError("M3 constraint scaling underflow")
        return theta, scaling

    def _em_update(
        self, theta: np.ndarray, grad_half: np.ndarray
    ) -> np.ndarray:
        """EM: v <- (n v + v^2 * grad_full)/n (emREMLStep, reml.cpp:2500-2541)."""
        grad_full = 2.0 * grad_half
        n = float(self.dimension)
        return (n * theta + theta * theta * grad_full) / n

    def fit(
        self,
        initial_theta: Optional[np.ndarray] = None,
        checkpoint_path: Optional[str] = None,
    ) -> REMLResult:
        opts = self.options
        theta = np.array(
            self.model.initial_theta() if initial_theta is None else initial_theta,
            dtype=np.float64,
        )
        base_fixed = np.array([v.fixed for v in self.model.variances])
        unfix_after = np.array(
            [
                v.unfix_after if v.unfix_after is not None else -1
                for v in self.model.variances
            ]
        )
        fixed = base_fixed | (unfix_after >= 0)
        names = self.model.variance_names()
        k = len(theta)

        log_likelihood = -1e50
        rel_diff = np.inf
        start_iteration = 0
        if checkpoint_path is not None:
            from dissect_tpu.runtime.checkpoint import REMLCheckpoint

            ckpt = REMLCheckpoint.load(checkpoint_path)
            if ckpt is not None and ckpt.variance_names == names:
                theta = ckpt.theta.copy()
                log_likelihood = ckpt.log_likelihood
                rel_diff = ckpt.rel_diff
                start_iteration = ckpt.iteration
                self.log.message(
                    f"Resuming REML from checkpoint at iteration {start_iteration}"
                )
        success = True
        warnings: List[str] = []
        constrained: List[str] = []
        old_theta = theta.copy()
        delta_store = np.zeros(k)
        ai_inv_full = np.zeros((k, k))
        ll_converged = var_converged = grad_converged = False
        ll_history: List[float] = []
        fp32_stalled = False
        n_iter = 0
        q = None
        sreml = "ML" if opts.use_ml else "REML"
        self.log.message(f"Starting {sreml} iterations...")

        for it in range(start_iteration, opts.max_iterations):
            n_iter = it + 1
            # unfix inside-matrix parameters after their step count
            # (unfixVariancesAndParameters, reml.cpp:1684)
            fixed = base_fixed | ((unfix_after >= 0) & (it < unfix_after))
            em_step = (it == 0 and opts.first_step_em and not opts.use_ml) or (
                opts.reml_method_em and not opts.use_ml
            )
            q = {
                key: np.asarray(val, dtype=np.float64)
                for key, val in self._quantities(jnp.asarray(theta, dtype=self.dtype)).items()
                if key in ("logdet_v", "logdet_xtvix", "ytpy", "grad", "ai", "finite")
            }
            if not bool(q["finite"]):
                success = False
                break
            grad_half = q["grad"]
            old_theta = theta.copy()
            step_mods = ""

            if em_step:
                new_theta = self._em_update(theta, grad_half)
                new_theta[fixed] = theta[fixed]
                theta = new_theta
                delta_store = theta - old_theta
                step_mods += "EM"
            else:
                # invert AI with fixed-variance zeroing (reml.cpp:1997-2049)
                free = ~fixed
                ai = q["ai"][np.ix_(free, free)]
                try:
                    ai_inv = np.linalg.inv(ai)
                except np.linalg.LinAlgError:
                    success = False
                    break
                ai_inv_exp = np.zeros((k, k))
                ai_inv_exp[np.ix_(free, free)] = ai_inv
                ai_inv_full = ai_inv_exp
                delta = ai_inv_exp @ grad_half

                damp = rel_diff > opts.change_ai_step_threshold
                if opts.use_log_logistic_scale:
                    # log/logistic reparameterization (reml.cpp:2382-2456)
                    vv = theta.copy()
                    jac_inv = np.ones(k)
                    for i, v in enumerate(self.model.variances):
                        if v.type == ParameterType.CORRELATION:
                            vv[i] = _logistic_inv(theta[i])
                            e = np.exp(-vv[i])
                            jac_inv[i] = (1.0 + e) ** 2 / (2.0 * e)
                        else:
                            jac_inv[i] = 1.0 / theta[i]
                            vv[i] = np.log(theta[i])
                    delta_t = jac_inv * delta
                    if damp and opts.allow_switch_from_ai_to_em:
                        theta = self._em_update(theta, grad_half)
                        step_mods += "e"
                    else:
                        w = opts.step_weighting_constant if damp else 1.0
                        if damp:
                            step_mods += "q"
                        vv = vv + w * delta_t
                        for i, v in enumerate(self.model.variances):
                            if v.type == ParameterType.CORRELATION:
                                theta[i] = _logistic(vv[i])
                            else:
                                theta[i] = np.exp(vv[i])
                        step_mods += "l"
                else:
                    if damp and opts.allow_switch_from_ai_to_em and not opts.use_ml:
                        theta = self._em_update(theta, grad_half)
                        step_mods += "e"
                    else:
                        w = opts.step_weighting_constant if damp else 1.0
                        if damp:
                            step_mods += "q"
                        theta = theta + w * delta
                delta_store = delta
                theta[fixed] = old_theta[fixed]

            # log-likelihood of the step just taken (computeLogLikelihood,
            # reml.cpp:2267-2284) — evaluated at the *pre-update* theta
            prev_ll = log_likelihood
            if opts.use_ml:
                log_likelihood = -0.5 * (q["logdet_v"] + q["ytpy"])
            else:
                log_likelihood = -0.5 * (
                    q["logdet_v"] + q["logdet_xtvix"] + q["ytpy"]
                )
            ll_diff = log_likelihood - prev_ll
            rel_diff = abs(ll_diff / prev_ll) if prev_ll != 0 else np.inf

            # constraints (reml.cpp:1629-1669)
            n_constrained, constrained = self._constrain_m1(theta)
            constrained_method = 1 if n_constrained else 0
            frac = n_constrained / k
            if frac > 0.5 and it == 0:
                self.log.message(
                    f"Error: more than half of the parameters constrained in the "
                    f"first step. {sreml} stopped."
                )
                success = False
                break
            elif frac > 0.5:
                if opts.gcta_mode:
                    raise RuntimeError("more than half of parameters constrained")
                theta, scaling = self._constrain_m3(old_theta, delta_store)
                constrained_method = 2
                n_constrained = 0

            self.log.message(
                f"  {n_iter:3d} {step_mods:>4s}  logL {log_likelihood:.6f}  "
                + " ".join(f"{t:.6g}" for t in theta)
                + (f"  ({n_constrained} constrained)" if n_constrained else "")
            )

            if checkpoint_path is not None:
                from dissect_tpu.runtime.checkpoint import REMLCheckpoint

                REMLCheckpoint(
                    iteration=n_iter,
                    theta=theta,
                    log_likelihood=log_likelihood,
                    variance_names=names,
                    rel_diff=rel_diff,
                ).save(checkpoint_path)

            # convergence (reml.cpp:1687-1737)
            ll_converged = (ll_diff < 1e-4) and (ll_diff > -1e-2)
            with np.errstate(divide="ignore", invalid="ignore"):
                rel_changes = np.abs((theta - old_theta) / old_theta)
            var_converged = bool(np.all(rel_changes <= opts.variance_convergence_threshold))
            # fp32 logL evaluations carry noise above the 1e-4 threshold at
            # large n; once the variances are tightly converged (the
            # reference's fp32 -> fp64 switch condition, threshold/10,
            # reml.cpp:1712-1716) accept and let the float64 refinement
            # finish the fit in double precision.
            if (
                not ll_converged
                and self.dtype != jnp.float64
                and opts.float64_refine
                and bool(
                    np.all(
                        rel_changes <= opts.variance_convergence_threshold / 10.0
                    )
                )
            ):
                ll_converged = True
                step_mods += "s"
            grad_converged = bool(
                np.all(
                    (np.abs(grad_half) <= opts.gradient_convergence_threshold)
                    | np.array([names[i] in constrained for i in range(k)])
                )
            )
            # fp32 stall rescue: at the fp32 noise floor the AI steps
            # fall into a small limit cycle (~1e-3 relative) so neither
            # convergence test can ever fire; once the best logL has
            # stopped improving over a window of iterations, hand the
            # endgame to the float64 Newton instead of burning the
            # iteration budget and failing — the large-N regime the
            # reference's precision switch exists for (reml.cpp:1673-1724)
            ll_history.append(log_likelihood)
            if (
                self.dtype != jnp.float64
                and opts.float64_refine
                and self.dimension <= opts.float64_refine_max_n
                and not (ll_converged and var_converged)
                and bool(np.all(rel_changes <= 1e-2))
                and len(ll_history) >= 8
                and max(ll_history[-4:]) <= max(ll_history[:-4]) + 1e-3
            ):
                fp32_stalled = True
                self.log.message(
                    "  fp32 progress stalled at the precision floor; "
                    "switching to the float64 endgame"
                )
                break
            if (
                ll_converged
                and var_converged
                and constrained_method != 2
                and (
                    constrained_method != 1
                    or opts.allow_convergence_with_constrained
                )
                and not fixed.any()
            ):
                if constrained_method == 1:
                    warnings.append(
                        f"{n_constrained} parameters constrained: "
                        + ", ".join(constrained)
                    )
                if not grad_converged:
                    warnings.append(
                        "gradient did not converge below "
                        f"{opts.gradient_convergence_threshold}"
                    )
                break
        else:
            success = False

        if (
            (success or fp32_stalled)
            and opts.float64_refine
            and self.dtype != jnp.float64
            and self.dimension <= opts.float64_refine_max_n
        ):
            n_steps = (
                max(8, opts.float64_refine_steps)
                if fp32_stalled
                else opts.float64_refine_steps
            )
            theta, log_likelihood, q, ai_inv_full, f64_ok = (
                self._refine_float64(theta, fixed, n_steps)
            )
            if fp32_stalled:
                # success now rests on the double-precision Newton
                # actually converging (reml.cpp:1687-1702 in fp64 mode)
                success = f64_ok
                if not f64_ok:
                    warnings.append(
                        "fp32 iterations stalled and the float64 endgame "
                        "did not converge"
                    )

        if success:
            self.log.message(
                f"{sreml} finished with success (logL: {log_likelihood:.10g})"
            )
        else:
            self.log.message(f"Sorry, {sreml} failed to converge...")

        self.final_theta = theta
        self.final_quantities = q
        return REMLResult(
            success=success,
            log_likelihood=float(log_likelihood),
            variances=theta,
            variance_names=names,
            ai_inverse=ai_inv_full,
            n_iterations=n_iter,
            constrained=constrained,
            warnings=warnings,
            logdet_v=float(q["logdet_v"]) if q else 0.0,
            logdet_xtvix=float(q["logdet_xtvix"]) if q else 0.0,
        )

    def _refine_float64(self, theta, fixed, n_steps):
        """Final float64 Newton steps on the CPU backend (the fp64
        endgame of the reference's mixed-precision policy).  Returns
        (theta, logL, quantities, AI^-1, converged): steps stop early
        once the relative variance changes drop below the convergence
        threshold, so a stalled fp32 fit can be salvaged and declared
        converged here."""
        import jax as _jax

        cpu = _jax.devices("cpu")[0]
        use_ml, use_f = self.options.use_ml, self.options.use_f_matrix
        var_threshold = self.options.variance_convergence_threshold
        converged = False
        with _jax.enable_x64():
            put = lambda a: _jax.device_put(
                np.asarray(a, dtype=np.float64), cpu
            )
            cc64 = _jax.tree_util.tree_map(put, self.cc)
            y64, x64 = put(self.y), put(self.x)
            if cc64.has_matrix_params:
                core = _dense_quantities_autodiff
            else:
                core = (
                    _blockdiag_quantities if cc64.diagonal else _dense_quantities
                )
            q = None
            prev_ll = -np.inf
            log_likelihood = -np.inf
            ai_inv_full = np.zeros((len(theta), len(theta)))
            for _ in range(max(n_steps, 1)):
                q = core(
                    cc64, put(theta), y64, x64, use_ml, use_f,
                    **({"backend": "cpu"} if core is _dense_quantities
                       else {}),
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
                n_con, _names = self._constrain_m1(new_theta)
                with np.errstate(divide="ignore", invalid="ignore"):
                    rel = np.abs((new_theta - theta) / np.where(theta == 0, 1, theta))
                ll_diff = log_likelihood - prev_ll
                theta = new_theta
                self.log.message(
                    f"  f64  logL {log_likelihood:.6f}  "
                    + " ".join(f"{t:.6g}" for t in theta)
                )
                if bool(np.all(rel <= var_threshold)) and (
                    -1e-2 < ll_diff < 1e-4 or prev_ll == -np.inf
                ):
                    converged = True
                    break
        q_np = {
            key: np.asarray(val, dtype=np.float64)
            for key, val in q.items()
            if key in ("logdet_v", "logdet_xtvix", "ytpy", "grad", "ai", "finite")
        }
        return theta, log_likelihood, q_np, ai_inv_full, converged

    # ----------------------------------------------------------- post-fit ---
    def _final_device_state(self):
        out = self._quantities(jnp.asarray(self.final_theta, dtype=self.dtype))
        return out

    def final_py(self) -> np.ndarray:
        """Py at the fitted variances — the vector every BLUP flows
        from (computeSNPsBLUP consumes it, reml.cpp:3098-3356)."""
        return np.asarray(self._final_device_state()["py"], dtype=np.float64)

    def compute_blue(self):
        """beta = (X'ViX)^-1 X'Vi y with SEs (computeBLUE, reml.cpp:2924-2981)."""
        q = self._final_device_state()
        vix, xtvix_i = q["vix"], q["xtvix_i"]
        T, n = self.cc.n_traits, self.cc.n
        if self.cc.diagonal:
            b = jnp.einsum("tic,ti->c", vix, self.y.reshape(T, n))
        else:
            b = vix.T @ self.y
        beta = xtvix_i @ b
        se = jnp.sqrt(jnp.diagonal(xtvix_i))
        return np.asarray(beta), np.asarray(se)

    def compute_blup_individuals(self, sub_id: str):
        """u_hat = V_sub @ Py for the named sub-covariance with SEs from
        diag(V_sub P V_sub) (computeIndividualsBLUP, reml.cpp:2983-3096)."""
        q = self._final_device_state()
        py = q["py"]
        theta = jnp.asarray(self.final_theta, dtype=self.dtype)
        g = np.asarray(self.cc.coefficients(theta))
        off = self.cc.offsets
        blup = jnp.zeros((self.cc.n_total,), dtype=py.dtype)
        for ei, e in enumerate(self.model.elements):
            if e.subcovariance_id != sub_id:
                continue
            m = self.cc.element_matrix(ei, theta)
            ti, tj = e.block
            ri, ci = off[ti], off[tj]
            if self.cc.diagonal:
                nr = m.shape[0]
                blup = blup.at[ri : ri + nr].add(g[ei] * m * py[ci : ci + nr])
                if ti != tj:
                    blup = blup.at[ci : ci + nr].add(
                        g[ei] * m * py[ri : ri + nr]
                    )
            else:
                nr, nc = m.shape
                blup = blup.at[ri : ri + nr].add(g[ei] * (m @ py[ci : ci + nc]))
                if ti != tj:
                    blup = blup.at[ci : ci + nc].add(
                        g[ei] * (m.T @ py[ri : ri + nr])
                    )
        return np.asarray(blup)

    def compute_blup_errors(self, sub_id: str):
        """sqrt(diag(Cov_sub P Cov_sub)) — BLUP standard errors
        (computeBLUPErrors, reml.cpp:3058-3110 via diagonalOfABAt).
        Like the reference (reml.cpp:3250), restricted to the dense
        single-trait path; returns None otherwise."""
        if self.cc.diagonal or self.cc.n_traits != 1:
            return None
        from dissect_tpu.linalg.traces import diag_of_abat

        q = self._final_device_state()
        p = q["vi"] - q["vix"] @ q["xtvix_i"] @ q["vix"].T
        theta = jnp.asarray(self.final_theta, dtype=self.dtype)
        g = np.asarray(self.cc.coefficients(theta))
        cov = jnp.zeros((self.cc.n_total, self.cc.n_total), dtype=p.dtype)
        found = False
        for ei, e in enumerate(self.model.elements):
            if e.subcovariance_id != sub_id:
                continue
            found = True
            cov = cov + g[ei] * self.cc.element_matrix(ei, theta)
        if not found:
            return None
        d = np.asarray(diag_of_abat(cov, p))
        return np.sqrt(np.maximum(d, 0.0))

    def residuals(self):
        """e = sigma2_E * Py — the 'E' sub-covariance applied to Py
        (mpresiduals.cpp:141: V->multiply("E", Py))."""
        return self.compute_blup_individuals("E")


# --------------------------------------------------------------------------
# Module-level jitted quantities cores.  Taking the CompiledCovariance as a
# pytree argument (structure in aux data) means engines over models with the
# same element structure and shapes SHARE compilations — regional scans,
# reduced-model refits and GWAS null fits do not retrace.
# --------------------------------------------------------------------------


from functools import partial as _partial  # noqa: E402


def _placed_dense(cc, ei):
    """Element ei as a dense (n_total, n_total) placed matrix."""
    m = cc.element_matrices[ei]
    if cc.diagonal:
        m = jnp.diag(m)
    ti, tj = cc.blocks[ei]
    off = cc.offsets
    nt = cc.n_total
    out = jnp.zeros((nt, nt), dtype=m.dtype)
    ri, ci = off[ti], off[tj]
    nr, nc = m.shape
    out = out.at[ri : ri + nr, ci : ci + nc].add(m)
    if ti != tj:
        out = out.at[ci : ci + nc, ri : ri + nr].add(m.T)
    return out


def _placed_blockdiag(cc, ei):
    """Element ei as (n, T, T) per-individual blocks (diagonal mode)."""
    T, n = cc.n_traits, cc.n
    m = cc.element_matrices[ei]
    ti, tj = cc.blocks[ei]
    out = jnp.zeros((n, T, T), dtype=m.dtype)
    out = out.at[:, ti, tj].add(m)
    if ti != tj:
        out = out.at[:, tj, ti].add(m)
    return out


@_partial(jax.jit, static_argnames=("use_ml", "use_f_matrix", "backend"))
def _dense_quantities(cc, theta, y, x, use_ml=False, use_f_matrix=False,
                      backend=None):
    """Dense-V REML/ML quantities (aiREMLStep body, reml.cpp:2286-2498).

    `backend` (static) routes the huge-V inverse: the blocked cyclic
    pipeline on TPU-like platforms, XLA's fused solve on CPU."""
    T, n = cc.n_traits, cc.n
    v = cc.assemble_dense(theta)
    vi_c, logdet_c, ok_v = spd_inverse_logdet_auto(v, backend)
    vi, logdet_v, _ = jax.lax.cond(
        ok_v,
        lambda _: (vi_c, logdet_c, ok_v),
        lambda _: fallback_inverse_logdet(v, backend),
        operand=None,
    )
    vix = vi @ x
    xtvix = x.T @ vix
    xtvix_c, logdet_xc, ok_x = spd_inverse_logdet(xtvix)
    xtvix_i, logdet_x, _ = jax.lax.cond(
        ok_x,
        lambda _: (xtvix_c, logdet_xc, ok_x),
        lambda _: lu_inverse_logdet(xtvix),
        operand=None,
    )
    # P = Vi - ViX (X'ViX)^-1 (ViX)' is Vi minus a rank-c correction —
    # NEVER materialized: at Tn = 20k a dense P (plus its fusion temps)
    # is multiple extra 1.6 GB HBM buffers, the difference between a
    # bivariate 10k-cohort fit running and OOMing on one chip.
    def apply_p(z):
        return vi @ z - vix @ (xtvix_i @ (vix.T @ z))

    py = apply_p(y)
    ytpy = y @ py
    mpy = cc.elements_times_vector(py)  # (E, n_total)
    # tr(P M_e) = tr(Vi M_e) - tr((X'ViX)^-1 (ViX)' M_e (ViX))
    tr_vi_e = cc.element_traces_dense(vi)
    mw = cc.elements_times_matrix(vix)  # (E, Tn, c)
    quad_e = jnp.einsum("nc,enk->eck", vix, mw)  # (E, c, c)
    tr_p_full = tr_vi_e - jnp.einsum("ck,eck->e", xtvix_i, quad_e)
    tr_e = tr_vi_e if use_ml else tr_p_full
    ypmpy_e = mpy @ py
    a = cc.coefficient_jacobian(theta)  # (E, K)
    grad = 0.5 * (a.T @ ypmpy_e - a.T @ tr_e)
    subvpy = jnp.einsum("ei,ek->ik", mpy, a)  # (Tn, K)
    if use_f_matrix:
        # expected information: F_kl = 0.5 tr(W dV_k W dV_l) with W = P
        # (REML-F) or Vi (ML-F) — computeREMLFMatrix/computeMLFMatrix.
        # This opt-in path does need the dense W.
        w = vi if use_ml else vi - vix @ xtvix_i @ vix.T
        wm = jnp.stack(
            [w @ _placed_dense(cc, ei) for ei in range(cc.n_elements)]
        )  # (E, Tn, Tn)
        t_ef = jnp.einsum("eij,fji->ef", wm, wm)
        ai = 0.5 * a.T @ t_ef @ a
    else:
        psubvpy = apply_p(subvpy)
        ai = 0.5 * subvpy.T @ psubvpy
        # crossed second-derivative correction (reml.cpp:2159-2218)
        h = cc.coefficient_hessian(theta)  # (E, K, K)
        tr_p_e = tr_p_full if use_ml else tr_e
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


@_partial(jax.jit, static_argnames=("use_ml", "use_f_matrix"))
def _blockdiag_quantities(cc, theta, y, x, use_ml=False, use_f_matrix=False):
    """Diagonal-V fast path: V as (n, T, T) per-individual blocks — the
    BlockMatrix replacement (reml.cpp:1896-1908, blockmatrix.h:32-124)."""
    T, n = cc.n_traits, cc.n
    vb = cc.assemble_blockdiag(theta)  # (n, T, T)
    if T <= MAX_UNROLL_Q:
        # unrolled TxT Cholesky/inverse: pure VPU ops over the n batch,
        # no pivoted-LU while_loops (linalg/small.py)
        diag = cholesky_diag_small(vb)
        vi = inv_spd_small(vb)
    else:
        diag = jnp.diagonal(jnp.linalg.cholesky(vb), axis1=-2, axis2=-1)
        vi = jnp.linalg.inv(vb)
    ok_v = jnp.all(jnp.isfinite(diag)) & jnp.all(diag > 0)
    logdet_v = 2.0 * jnp.sum(jnp.log(jnp.where(diag > 0, diag, 1.0)))
    y4 = y.reshape(T, n)
    x4 = x.reshape(T, n, -1)
    vix = jnp.einsum("ist,tic->sic", vi, x4)
    xtvix = jnp.einsum("sic,sid->cd", x4, vix)
    xtvix_c, logdet_xc, ok_x = spd_inverse_logdet(xtvix)
    xtvix_i, logdet_x, _ = jax.lax.cond(
        ok_x,
        lambda _: (xtvix_c, logdet_xc, ok_x),
        lambda _: lu_inverse_logdet(xtvix),
        operand=None,
    )
    viy = jnp.einsum("ist,ti->si", vi, y4)
    b = jnp.einsum("tic,ti->c", vix, y4)
    coef = xtvix_i @ b
    py4 = viy - jnp.einsum("sic,c->si", vix, coef)
    ytpy = jnp.einsum("si,si->", y4, py4)
    # block-diagonal part of P (PDiagonal via diagonalOfABAt, reml.cpp:1906)
    p_blocks = vi - jnp.einsum("sic,cd,tid->ist", vix, xtvix_i, vix)
    tr_e = cc.element_traces_blockdiag(vi if use_ml else p_blocks)
    mpy = cc.elements_times_vector(py4.reshape(-1)).reshape(
        cc.n_elements, T, n
    )  # (E, T, n)
    ypmpy_e = jnp.einsum("eti,ti->e", mpy, py4)
    a = cc.coefficient_jacobian(theta)
    grad = 0.5 * (a.T @ ypmpy_e - a.T @ tr_e)
    subvpy = jnp.einsum("eti,ek->kti", mpy, a)  # (K, T, n)

    def apply_p(u):  # P u for u (T, n) without densifying P
        viu = jnp.einsum("ist,ti->si", vi, u)
        bu = jnp.einsum("tic,ti->c", vix, u)
        return viu - jnp.einsum("sic,c->si", vix, xtvix_i @ bu)

    if use_f_matrix:
        # diagonal-path F uses the block-diagonal part of P, matching the
        # reference's PDiagonal-based traces (computeREMLFMatrix with
        # this->P == NULL)
        w = vi if use_ml else p_blocks
        em = jnp.stack(
            [_placed_blockdiag(cc, ei) for ei in range(cc.n_elements)]
        )  # (E, n, T, T)
        # W (n,T,T) @ M_e (n,T,T) per individual: batched small matmuls
        wm = jnp.einsum("nst,entu->ensu", w, em)
        t_ef = jnp.einsum("ensu,fnus->ef", wm, wm)
        ai = 0.5 * a.T @ t_ef @ a
    else:
        psubvpy = jax.vmap(apply_p)(subvpy)
        ai = 0.5 * jnp.einsum("kti,lti->kl", subvpy, psubvpy)
        h = cc.coefficient_hessian(theta)
        tr_p_e = cc.element_traces_blockdiag(p_blocks) if use_ml else tr_e
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
        "py": py4.reshape(-1),
        "vix": vix,
        "xtvix_i": xtvix_i,
        "vi": vi,
    }


@_partial(jax.jit, static_argnames=("use_ml", "use_f_matrix"))
def _ylist_quantities(cc, theta, y_list, x, use_ml=False, use_f_matrix=False):
    """Multi-sample mean likelihood (yList, reml.cpp:2296-2350): AI from
    the first sample, gradient / y'Py / AI averaged over samples."""
    core = _blockdiag_quantities if cc.diagonal else _dense_quantities

    def one(yy):
        return core(cc, theta, yy, x, use_ml, use_f_matrix)

    outs = jax.vmap(one)(y_list)
    first = jax.tree_util.tree_map(lambda o: o[0], outs)
    out = dict(first)
    out["grad"] = jnp.mean(outs["grad"], axis=0)
    out["ytpy"] = jnp.mean(outs["ytpy"], axis=0)
    out["ai"] = jnp.mean(outs["ai"], axis=0)
    out["finite"] = jnp.all(outs["finite"])
    return out


@_partial(jax.jit, static_argnames=("use_ml",))
def _dense_quantities_autodiff(cc, theta, y, x, use_ml=False, use_f_matrix=False):
    """General dense core for theta-dependent element matrices
    (squared-exponential kernels, applyExponentialOperator,
    covariancematrix.cpp:780-960): dV/dtheta comes from jacfwd of the
    whole assembly instead of the coefficient-Jacobian shortcut, so any
    differentiable parameterization works."""
    v = cc.assemble_dense(theta)
    vi_c, logdet_c, ok_v = spd_inverse_logdet_auto(v)
    vi, logdet_v, _ = jax.lax.cond(
        ok_v,
        lambda _: (vi_c, logdet_c, ok_v),
        lambda _: fallback_inverse_logdet(v),
        operand=None,
    )
    vix = vi @ x
    xtvix = x.T @ vix
    xtvix_c, logdet_xc, ok_x = spd_inverse_logdet(xtvix)
    xtvix_i, logdet_x, _ = jax.lax.cond(
        ok_x,
        lambda _: (xtvix_c, logdet_xc, ok_x),
        lambda _: lu_inverse_logdet(xtvix),
        operand=None,
    )
    p = vi - vix @ xtvix_i @ vix.T
    py = p @ y
    ytpy = y @ py

    subvpy = jax.jacfwd(lambda th: cc.assemble_dense(th) @ py)(theta)  # (Tn, K)
    w = vi if use_ml else p
    tr_k = jax.jacfwd(lambda th: jnp.vdot(w, cc.assemble_dense(th)))(theta)
    ypvpy_k = subvpy.T @ py
    grad = 0.5 * (ypvpy_k - tr_k)
    psubvpy = p @ subvpy
    ai = 0.5 * subvpy.T @ psubvpy
    # crossed second-derivative correction with full d2V
    h_quad = jax.hessian(lambda th: py @ (cc.assemble_dense(th) @ py))(theta)
    h_tr = jax.hessian(lambda th: jnp.vdot(p, cc.assemble_dense(th)))(theta)
    ai = ai + 0.25 * (h_tr - h_quad)
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
