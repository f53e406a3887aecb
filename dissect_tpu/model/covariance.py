"""The symbolic covariance matrix V(theta) = sum_e c_e * g_e(theta) * M_e.

Parity: covariancematrix.{h,cpp}.  The reference's `Element` = {matrix,
block position, constant factor, variance list with transforms} and
`Variance` = {value, group, type, effect, fixed} (covariancematrix.h:
90-120) map onto a static element table compiled into jit-ready arrays:

  powers  (E, K)  exponent of variance k in element e's coefficient
                  (1 = nochange, 0.5 = squareRoot, 0 = absent) —
                  covering both VarianceAttributes transforms
                  (covariancematrix.h:100-105)
  factors (E,)    the constant factor c_e
  blocks  (E, 2)  trait-block placement (outcome subMatrix positions)

TPU-first derivative machinery: instead of the reference's per-element
symbolic product derivatives (computeDerivateCovariance,
covariancematrix.cpp:652-766, 958-1143), the coefficient function
g: R^K -> R^E is differentiated with jax.jacfwd / jax.hessian — K and E
are tiny — and every heavy quantity (dV/dtheta_k . Py, tr(P dV),
d2V corrections) assembles from per-element primitives via einsums.

Two runtime representations of V:
  dense     (T n, T n) for general kernels;
  diagonal  (n, T, T) per-individual trait blocks when every kernel is
            diagonal (eigen-rotated) — the TPU-native replacement of
            BlockMatrix (blockmatrix.h:32-124): batched T x T solves
            under vmap instead of a distributed block container.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ParameterType(enum.Enum):
    """Parity: ParameterAttributes type (covariancematrix.h:107-120)."""

    VARIANCE = "variance"
    COVARIANCE = "covariance"
    CORRELATION = "correlation"
    STANDARD_DEVIATION = "stddev"
    PARAMETER = "parameter"


class EffectType(enum.Enum):
    GENETIC = "genetic"
    ENVIRONMENT = "environment"
    OTHER = "other"


class VarianceTransform(enum.Enum):
    """Parity: nochange / squareRoot (covariancematrix.h:100-105)."""

    NOCHANGE = 1.0
    SQRT = 0.5


@dataclasses.dataclass
class Variance:
    name: str
    group: str
    type: ParameterType
    effect: EffectType
    initial_value: float
    fixed: bool = False
    # PARAMETER-type entries stay fixed for the first N Newton steps
    # (remlStepsToUnfixExpKernelParameter, options.cpp:143)
    unfix_after: Optional[int] = None
    # indices of variances whose product bounds this covariance
    # (constrainedDependingOnProductOfi, covariancematrix.h:117)
    constrained_on_product_of: Set[int] = dataclasses.field(default_factory=set)


@dataclasses.dataclass
class Element:
    """One summand of V (covariancematrix.h:90-105)."""

    name: str
    matrix_name: str
    block: Tuple[int, int]  # trait-block placement (row, col)
    factor: float = 1.0
    variance_factors: List[Tuple[str, VarianceTransform]] = dataclasses.field(
        default_factory=list
    )
    subcovariance_id: str = ""  # named sub-covariance (e.g. "GRM", "E")
    # inside-matrix parameter: the element matrix holds squared distances
    # D and evaluates as exp(-theta_p * D) (applyExponentialOperator,
    # covariancematrix.cpp:805; ParameterAttributes::insideMatrix)
    parameter_name: Optional[str] = None


class CovarianceModel:
    """Host-side builder; compiles to jit-ready arrays.

    Mirrors the construction API used by REML::prepare
    (reml.cpp:592-917): insertVarianceGroup, insertVariance,
    insertElement, appendVarianceToElement.
    """

    def __init__(
        self,
        n: int,
        n_traits: int = 1,
        diagonal: bool = False,
        trait_sizes: Optional[Sequence[int]] = None,
    ):
        self.n = n
        self.n_traits = n_traits
        # per-trait individual counts: uniform [n]*T unless given —
        # differing sizes model the reference's asymmetric kernel blocks
        # (nIndividualsTraits, reml.cpp:812-877)
        self.trait_sizes = (
            [n] * n_traits if trait_sizes is None else list(trait_sizes)
        )
        if len(self.trait_sizes) != n_traits:
            raise ValueError("trait_sizes length != n_traits")
        self.diagonal = diagonal
        self.matrices: Dict[str, jax.Array] = {}
        self.variances: List[Variance] = []
        self._variance_index: Dict[str, int] = {}
        self.elements: List[Element] = []
        self.group_magnitudes: Dict[str, float] = {}

    # --- construction --------------------------------------------------------
    def insert_variance_group(self, name: str, expected_magnitude: float):
        """Parity: insertVarianceGroup (covariancematrix.cpp:131-141)."""
        self.group_magnitudes[name] = float(expected_magnitude)

    def insert_variance(
        self,
        name: str,
        group: str,
        ptype: ParameterType,
        effect: EffectType,
        initial_value: float,
        constrained_on_product_of: Optional[Sequence[str]] = None,
    ) -> int:
        if name in self._variance_index:
            return self._variance_index[name]
        deps: Set[int] = set()
        if constrained_on_product_of:
            deps = {self._variance_index[d] for d in constrained_on_product_of}
        idx = len(self.variances)
        self.variances.append(
            Variance(
                name=name,
                group=group,
                type=ptype,
                effect=effect,
                initial_value=float(initial_value),
                constrained_on_product_of=deps,
            )
        )
        self._variance_index[name] = idx
        return idx

    def insert_matrix(self, name: str, matrix):
        """Register a kernel matrix: (rows, cols) dense (rectangular for
        asymmetric cross-trait blocks) or (n,) diagonal."""
        m = jnp.asarray(matrix)
        if self.diagonal:
            if m.shape != (self.n,):
                raise ValueError(f"matrix {name}: shape {m.shape} != ({self.n},)")
        elif m.ndim != 2:
            raise ValueError(f"matrix {name}: expected a 2D matrix")
        self.matrices[name] = m

    def insert_element(
        self,
        subcovariance_id: str,
        name: str,
        matrix_name: str,
        block: Tuple[int, int] = (0, 0),
        factor: float = 1.0,
    ) -> Element:
        if matrix_name not in self.matrices:
            raise ValueError(f"unknown matrix {matrix_name}")
        e = Element(
            name=name,
            matrix_name=matrix_name,
            block=block,
            factor=factor,
            subcovariance_id=subcovariance_id,
        )
        self.elements.append(e)
        return e

    def append_parameter_to_element(self, element_name: str, param_name: str):
        """Attach an inside-matrix parameter (insideMatrix position,
        covariancematrix.h:100-105): M_e(theta) = exp(-theta_p * D_e)."""
        if param_name not in self._variance_index:
            raise ValueError(f"unknown variance {param_name}")
        for e in self.elements:
            if e.name == element_name:
                e.parameter_name = param_name
                return
        raise ValueError(f"unknown element {element_name}")

    def append_variance_to_element(
        self, element_name: str, variance_name: str, transform: VarianceTransform
    ):
        """Parity: appendVarianceToElement."""
        if variance_name not in self._variance_index:
            raise ValueError(f"unknown variance {variance_name}")
        for e in self.elements:
            if e.name == element_name:
                e.variance_factors.append((variance_name, transform))
                return
        raise ValueError(f"unknown element {element_name}")

    # --- accessors -----------------------------------------------------------
    @property
    def n_variances(self) -> int:
        return len(self.variances)

    @property
    def n_total(self) -> int:
        return sum(self.trait_sizes)

    def initial_theta(self) -> np.ndarray:
        return np.array([v.initial_value for v in self.variances], dtype=np.float64)

    def variance_names(self) -> List[str]:
        return [v.name for v in self.variances]

    def subcovariance_ids(self) -> List[str]:
        seen: List[str] = []
        for e in self.elements:
            if e.subcovariance_id not in seen:
                seen.append(e.subcovariance_id)
        return seen

    def genetic_variance_indices(self) -> List[int]:
        return [
            i
            for i, v in enumerate(self.variances)
            if v.effect == EffectType.GENETIC and v.type == ParameterType.VARIANCE
        ]

    def delete_subcovariance(self, sub_id: str) -> "CovarianceModel":
        """A copy with the named sub-covariance removed — used by reduced
        models for LRTs (deleteCovariance, reml.cpp:1335-1460).  Variances
        that no longer appear in any element are dropped."""
        kept_elements = [e for e in self.elements if e.subcovariance_id != sub_id]
        used = {vn for e in kept_elements for vn, _ in e.variance_factors}
        model = CovarianceModel(
            self.n, self.n_traits, self.diagonal, trait_sizes=self.trait_sizes
        )
        model.group_magnitudes = dict(self.group_magnitudes)
        for v in self.variances:
            if v.name in used:
                deps = [
                    self.variances[d].name
                    for d in v.constrained_on_product_of
                    if self.variances[d].name in used
                ]
                model.insert_variance(
                    v.name, v.group, v.type, v.effect, v.initial_value, deps
                )
        for name, m in self.matrices.items():
            if any(e.matrix_name == name for e in kept_elements):
                model.insert_matrix(name, m)
        for e in kept_elements:
            ne = model.insert_element(
                e.subcovariance_id, e.name, e.matrix_name, e.block, e.factor
            )
            ne.variance_factors = [
                (vn, t) for vn, t in e.variance_factors if vn in used
            ]
            if e.parameter_name in used:
                ne.parameter_name = e.parameter_name
        return model

    # --- compilation ---------------------------------------------------------
    def compile(self) -> "CompiledCovariance":
        E, K = len(self.elements), self.n_variances
        powers = np.zeros((E, K), dtype=np.float64)
        factors = np.zeros((E,), dtype=np.float64)
        blocks = np.zeros((E, 2), dtype=np.int32)
        pids = np.full((E,), -1, dtype=np.int32)
        mats = []
        for ei, e in enumerate(self.elements):
            factors[ei] = e.factor
            blocks[ei] = e.block
            m = self.matrices[e.matrix_name]
            ti, tj = e.block
            if not self.diagonal:
                expected = (self.trait_sizes[ti], self.trait_sizes[tj])
                if m.shape != expected:
                    raise ValueError(
                        f"element {e.name}: matrix {e.matrix_name} shape "
                        f"{m.shape} != block shape {expected}"
                    )
            mats.append(m)
            if e.parameter_name is not None:
                pids[ei] = self._variance_index[e.parameter_name]
            for vn, transform in e.variance_factors:
                powers[ei, self._variance_index[vn]] += transform.value
        return CompiledCovariance(
            trait_sizes=tuple(self.trait_sizes),
            diagonal=self.diagonal,
            element_matrices=tuple(mats),
            blocks=tuple(map(tuple, blocks.tolist())),
            powers=jnp.asarray(powers),
            factors=jnp.asarray(factors),
            param_ids=tuple(pids.tolist()),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CompiledCovariance:
    """Static, jit-friendly covariance structure.

    `element_matrices` holds one (rows, cols) array per element —
    rectangular for asymmetric cross-trait blocks — or (n,) vectors in
    diagonal mode.  Element metadata is hashable static data; the class
    is a pytree (arrays as leaves, structure as aux data) so jitted
    functions taking a CompiledCovariance share compilation across
    model instances with identical structure — essential for regional /
    reduced-model / per-SNP workflows that build many models.
    """

    trait_sizes: Tuple[int, ...]
    diagonal: bool
    element_matrices: Tuple[jax.Array, ...]
    blocks: Tuple[Tuple[int, int], ...]
    powers: jax.Array  # (E, K)
    factors: jax.Array  # (E,)
    param_ids: Tuple[int, ...] = ()  # inside-matrix parameter per element, -1 = none

    def tree_flatten(self):
        return (
            (self.element_matrices, self.powers, self.factors),
            (self.trait_sizes, self.diagonal, self.blocks, self.param_ids),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        element_matrices, powers, factors = children
        trait_sizes, diagonal, blocks, param_ids = aux
        return cls(
            trait_sizes=trait_sizes,
            diagonal=diagonal,
            element_matrices=tuple(element_matrices),
            blocks=blocks,
            powers=powers,
            factors=factors,
            param_ids=param_ids,
        )

    # --- shape helpers -------------------------------------------------------
    @property
    def n_traits(self) -> int:
        return len(self.trait_sizes)

    @property
    def n(self) -> int:
        """Per-trait size for UNIFORM models (the common case)."""
        return self.trait_sizes[0]

    @property
    def uniform(self) -> bool:
        return all(s == self.trait_sizes[0] for s in self.trait_sizes)

    @property
    def n_total(self) -> int:
        return sum(self.trait_sizes)

    @property
    def offsets(self) -> Tuple[int, ...]:
        out, acc = [], 0
        for s in self.trait_sizes:
            out.append(acc)
            acc += s
        return tuple(out)

    @property
    def has_matrix_params(self) -> bool:
        return any(p >= 0 for p in self.param_ids)

    @property
    def n_elements(self) -> int:
        return len(self.element_matrices)

    @property
    def n_variances(self) -> int:
        return self.powers.shape[1]

    def element_matrix(self, ei: int, theta: jax.Array) -> jax.Array:
        """The (possibly theta-dependent) element matrix: raw M, or
        exp(-theta_p * D) for squared-exponential elements
        (applyExponentialOperator, covariancematrix.cpp:805)."""
        m = self.element_matrices[ei]
        p = self.param_ids[ei] if self.param_ids else -1
        if p >= 0:
            m = jnp.exp(-theta[p] * m)
        return m

    # --- coefficient function g(theta) --------------------------------------
    def coefficients(self, theta: jax.Array) -> jax.Array:
        """g_e(theta) = c_e * prod_k theta_k^{p_ek} (E,).

        Exponent 1 keeps sign (covariances/correlations may be
        negative); exponent 0.5 is sqrt(|theta|) — the reference's
        squareRoot transform applies only to positive variances
        (covariancematrix.cpp computeElementVarianceProduct)."""
        t = theta[None, :]
        lin = jnp.where(self.powers == 1.0, t, 1.0).prod(axis=1)
        sq = jnp.where(self.powers == 0.5, jnp.sqrt(jnp.abs(t)), 1.0).prod(axis=1)
        return self.factors * lin * sq

    def coefficient_jacobian(self, theta: jax.Array) -> jax.Array:
        """dg/dtheta (E, K) — replaces computeDerivateCovariance(i)."""
        return jax.jacfwd(self.coefficients)(theta)

    def coefficient_hessian(self, theta: jax.Array) -> jax.Array:
        """d2g/dtheta2 (E, K, K) — replaces computeDerivateCovariance(i, j)."""
        return jax.hessian(self.coefficients)(theta)

    # --- assembly ------------------------------------------------------------
    def assemble_dense(self, theta: jax.Array) -> jax.Array:
        """V as (n_total, n_total) (computeCovariance,
        covariancematrix.cpp:545-577) with static trait-block offsets."""
        g = self.coefficients(theta)
        off = self.offsets
        nt = self.n_total
        dtype = self.element_matrices[0].dtype
        v = jnp.zeros((nt, nt), dtype=dtype)
        for ei in range(self.n_elements):
            m = self.element_matrix(ei, theta)
            if self.diagonal:
                m = jnp.diag(m)
            ti, tj = self.blocks[ei]
            ri, ci = off[ti], off[tj]
            nr, nc = m.shape
            v = v.at[ri : ri + nr, ci : ci + nc].add(g[ei] * m)
            if ti != tj:
                v = v.at[ci : ci + nc, ri : ri + nr].add(g[ei] * m.T)
        return v

    def assemble_blockdiag(self, theta: jax.Array) -> jax.Array:
        """V as (n, T, T) per-individual blocks — diagonal kernels only
        (computeBlockCovariance, covariancematrix.cpp:579-650)."""
        if not self.diagonal or not self.uniform:
            raise ValueError("blockdiag assembly requires uniform diagonal matrices")
        g = self.coefficients(theta)
        T, n = self.n_traits, self.n
        v = jnp.zeros((n, T, T), dtype=self.element_matrices[0].dtype)
        for ei in range(self.n_elements):
            m = self.element_matrix(ei, theta)
            ti, tj = self.blocks[ei]
            v = v.at[:, ti, tj].add(g[ei] * m)
            if ti != tj:
                v = v.at[:, tj, ti].add(g[ei] * m)
        return v

    # --- per-element primitives for REML ------------------------------------
    # NOTE: these primitives evaluate theta-INDEPENDENT element matrices;
    # parameterized (inside-matrix) models use the autodiff core instead.
    def elements_times_vector(self, u: jax.Array) -> jax.Array:
        """M_e^(placed) @ u for every element -> (E, n_total).

        u is flat (n_total,).  The building block of subVPy
        (reml.cpp:1947-1960)."""
        off = self.offsets
        nt = self.n_total
        outs = []
        for ei in range(self.n_elements):
            m = self.element_matrices[ei]
            ti, tj = self.blocks[ei]
            ri, ci = off[ti], off[tj]
            out = jnp.zeros((nt,), dtype=u.dtype)
            if self.diagonal:
                nr = nc = m.shape[0]
                out = out.at[ri : ri + nr].add(m * u[ci : ci + nc])
                if ti != tj:
                    out = out.at[ci : ci + nc].add(m * u[ri : ri + nr])
            else:
                nr, nc = m.shape
                out = out.at[ri : ri + nr].add(m @ u[ci : ci + nc])
                if ti != tj:
                    out = out.at[ci : ci + nc].add(m.T @ u[ri : ri + nr])
            outs.append(out)
        return jnp.stack(outs)

    def elements_times_matrix(self, u: jax.Array) -> jax.Array:
        """M_e^(placed) @ U for every element, U (n_total, c) ->
        (E, n_total, c).  The tall-skinny companion of
        `elements_times_vector`, used to form tr(P M_e) without ever
        materializing the dense P (P is rank-c off V^-1)."""
        off = self.offsets
        nt = self.n_total
        c = u.shape[1]
        outs = []
        for ei in range(self.n_elements):
            m = self.element_matrices[ei]
            ti, tj = self.blocks[ei]
            ri, ci = off[ti], off[tj]
            out = jnp.zeros((nt, c), dtype=u.dtype)
            if self.diagonal:
                nr = nc = m.shape[0]
                out = out.at[ri : ri + nr].add(m[:, None] * u[ci : ci + nc])
                if ti != tj:
                    out = out.at[ci : ci + nc].add(
                        m[:, None] * u[ri : ri + nr]
                    )
            else:
                nr, nc = m.shape
                out = out.at[ri : ri + nr].add(m @ u[ci : ci + nc])
                if ti != tj:
                    out = out.at[ci : ci + nc].add(m.T @ u[ri : ri + nr])
            outs.append(out)
        return jnp.stack(outs)

    def element_traces_dense(self, p: jax.Array) -> jax.Array:
        """tr(P M_e^(placed)) for every element -> (E,).

        P is (n_total, n_total) symmetric; cross blocks contribute twice
        (trace identity, matrix.cpp:3835)."""
        off = self.offsets
        traces = []
        for ei in range(self.n_elements):
            m = self.element_matrices[ei]
            ti, tj = self.blocks[ei]
            ri, ci = off[ti], off[tj]
            if self.diagonal:
                nr = m.shape[0]
                block = p[ri : ri + nr, ci : ci + nr]
                t = jnp.sum(jnp.diagonal(block) * m)
            else:
                nr, nc = m.shape
                t = jnp.einsum(
                    "ij,ij->", p[ri : ri + nr, ci : ci + nc], m
                )
            traces.append(jnp.where(ti != tj, 2.0, 1.0) * t)
        return jnp.stack(traces)

    def element_traces_blockdiag(self, p_blocks: jax.Array) -> jax.Array:
        """tr(P M_e) from the (n, T, T) block-diagonal part of P."""
        traces = []
        for ei in range(self.n_elements):
            m = self.element_matrices[ei]
            ti, tj = self.blocks[ei]
            t = jnp.sum(p_blocks[:, ti, tj] * m)
            traces.append(jnp.where(ti != tj, 2.0, 1.0) * t)
        return jnp.stack(traces)
