"""Kernels — GRM and relatives.

Parity: kernel.{h,cpp}.  KernelType enum mirrors kernel.h:35-47:
GRM, epistatic GRM (K .* K, kernel.cpp:279-316), interaction kernel
(elementwise product on overlapping ids, kernel.cpp:176-247), discrete /
multi-discrete / continuous covariate kernels, squared-exponential
kernel from coordinate distances (kernel.cpp:742+), environmental
(identity), covariance-matrix kernels, GCTA gz GRMs (kernel.cpp:1198).

The GRM build is the framework's hottest kernel: normalize genotypes
then kernel = Z^T Z, N = missings^T missings (kernel.cpp:92-109),
normalized form = kernel ./ N elementwise (kernel.cpp:382-460).  Here it
streams BED chunks through the fused standardize+syrk accumulator
(linalg/syrk.py) — O(M N^2) MACs on the MXU.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dissect_tpu.io.bed import PlinkData
from dissect_tpu.io.ids import indices_of
from dissect_tpu.linalg.syrk import grm_accumulator
from dissect_tpu.linalg.eigen import eigh_full


class KernelType(enum.Enum):
    """Parity: kernel.h:35-47."""

    GRM = "grm"
    EPISTATIC_GRM = "epistatic_grm"
    DISCRETE_COVARIATE = "discrete_covariate"
    MULTI_DISCRETE_COVARIATE = "multi_discrete_covariate"
    CONTINUOUS_COVARIATE = "continuous_covariate"
    SQUARED_EXPONENTIAL = "squared_exponential"
    COVARIANCE_MATRIX = "covariance_matrix"
    ENVIRONMENTAL = "environmental"
    INTERACTION = "interaction"
    GCTA_GRM = "gcta_grm"


@dataclasses.dataclass
class Kernel:
    """A named similarity kernel over individuals.

    `matrix` is the normalized kernel (device array).  For GRM-type
    kernels `counts` holds the per-pair shared-SNP counts N and
    `matrix` = raw ./ N (normalize(), kernel.cpp:382-460).  When
    `diagonalized`, `eigenvalues`/`eigenvectors` replace the dense form
    (diagonalizeKernel, kernel.cpp:2106-2141).
    """

    name: str
    type: KernelType
    individual_keys: List[str]
    matrix: Optional[jax.Array] = None
    counts: Optional[jax.Array] = None  # N matrix (GRM); None if flat-normalized
    snp_names: List[str] = dataclasses.field(default_factory=list)
    normalized: bool = True
    diagonalized: bool = False
    eigenvalues: Optional[jax.Array] = None
    eigenvectors: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return len(self.individual_keys)

    # --- construction helpers ------------------------------------------------
    def dense(self) -> jax.Array:
        """The dense normalized kernel, recovering U diag(w) U^T if
        diagonalized (recoverKernelFromEigenDecomposition, kernel.cpp:2143)."""
        if not self.diagonalized:
            return self.matrix
        u, w = self.eigenvectors, self.eigenvalues
        return (u * w[None, :]) @ u.T

    # --- transforms ----------------------------------------------------------
    def epistatic(self) -> "Kernel":
        """K .* K epistasis kernel (kernel.cpp:279-316)."""
        k = self.dense()
        return Kernel(
            name=self.name + "xE",
            type=KernelType.EPISTATIC_GRM,
            individual_keys=list(self.individual_keys),
            matrix=k * k,
            snp_names=list(self.snp_names),
        )

    def interaction(self, other: "Kernel", name: Optional[str] = None) -> "Kernel":
        """Elementwise product on the id overlap (kernel.cpp:176-247)."""
        common = [k for k in self.individual_keys if k in set(other.individual_keys)]
        a = self.filter_individuals(common)
        b = other.filter_individuals(common)
        return Kernel(
            name=name or (self.name + "x" + other.name),
            type=KernelType.INTERACTION,
            individual_keys=common,
            matrix=a.dense() * b.dense(),
        )

    def diagonalize(self, mesh=None, **dc_options) -> "Kernel":
        """Eigendecompose; drop the dense kernel and counts
        (diagonalizeKernel, kernel.cpp:2106-2141).

        With `mesh` the sign-function divide-and-conquer solver
        (linalg/dc_eigen.py) runs the full spectrum as sharded matmuls
        + blocked Cholesky — the path for N x N kernels that exceed a
        single device's HBM."""
        if self.diagonalized:
            return self
        # the D&C solver only pays for itself when the spectrum is
        # actually sharded: on one device XLA's native eigh is ~10x
        # faster (measured, BENCH extras), so a trivial mesh degrades
        # to the local solve
        if mesh is not None and mesh.devices.size > 1:
            from dissect_tpu.linalg.dc_eigen import distributed_eigh

            w, u = distributed_eigh(self.dense(), mesh=mesh, **dc_options)
        else:
            w, u = eigh_full(self.dense())
        return Kernel(
            name=self.name,
            type=self.type,
            individual_keys=list(self.individual_keys),
            snp_names=list(self.snp_names),
            diagonalized=True,
            eigenvalues=w,
            eigenvectors=u,
        )

    # --- filtering / pruning -------------------------------------------------
    def filter_individuals(self, keep_keys: Sequence[str]) -> "Kernel":
        """Symmetric row+col filter to `keep_keys`, in that order
        (kernel.cpp:1378)."""
        if self.diagonalized:
            raise ValueError("cannot filter a diagonalized kernel; recover first")
        idx = np.asarray(indices_of(keep_keys, self.individual_keys))
        return Kernel(
            name=self.name,
            type=self.type,
            individual_keys=list(keep_keys),
            matrix=self.matrix[np.ix_(idx, idx)],
            counts=None if self.counts is None else self.counts[np.ix_(idx, idx)],
            snp_names=list(self.snp_names),
            normalized=self.normalized,
        )

    def slice_asymmetric(self, row_keys: Sequence[str], col_keys: Sequence[str]):
        """K[rows, cols] asymmetric sub-block (the asymmetric individual
        filter, kernel.cpp:1493) — the cross-trait kernel block for
        differing per-trait individual sets."""
        ri = np.asarray(indices_of(row_keys, self.individual_keys))
        ci = np.asarray(indices_of(col_keys, self.individual_keys))
        return np.asarray(self.dense())[np.ix_(ri, ci)]

    def prune(self, cutoff: float) -> "Kernel":
        """Greedily drop individuals until no off-diagonal relatedness
        exceeds `cutoff` (pruneKernel/searchNoHighRelatedIndividuals,
        kernel.cpp:1974-2038): repeatedly remove the individual involved
        in the most over-threshold pairs."""
        from dissect_tpu.runtime.distributed_io import to_host

        k_dev = jnp.asarray(self.dense())
        if getattr(k_dev, "is_fully_addressable", True):
            # device-side gate: skip the whole-matrix fetch when no
            # off-diagonal pair exceeds the cutoff (the common case)
            off = jnp.abs(k_dev - jnp.diag(jnp.diagonal(k_dev)))
            if not bool(jnp.any(off > cutoff)):
                return self
        k = to_host(self.dense())
        n = k.shape[0]
        over = (np.abs(np.triu(k, 1)) > cutoff)
        keep = np.ones(n, dtype=bool)
        while True:
            counts = (over & keep[None, :] & keep[:, None]).sum(0) + (
                over & keep[None, :] & keep[:, None]
            ).sum(1)
            if counts.max(initial=0) == 0:
                break
            keep[int(np.argmax(counts))] = False
        kept = [self.individual_keys[i] for i in range(n) if keep[i]]
        return self.filter_individuals(kept)

    def sanitize(self, min_overlap_ratio: float = 0.1) -> "Kernel":
        """Drop individuals whose pairwise SNP overlap is degenerate
        (sanitizeKernel, kernel.cpp:1993): requires counts; individuals
        with any pair overlapping fewer than ratio * max(N) are pruned."""
        if self.counts is None:
            return self
        from dissect_tpu.runtime.distributed_io import to_host

        # gate with a device-side reduction: fetching the full counts
        # matrix costs a whole-matrix device->host transfer (a real
        # cost on PCIe, a dominant one through a chip tunnel) and in
        # the common no/low-missingness case nothing is pruned
        c_dev = jnp.asarray(self.counts)
        if getattr(c_dev, "is_fully_addressable", True):
            cmax = c_dev.max()
            if not bool(jnp.any(c_dev < cmax * min_overlap_ratio)):
                return self
        c = to_host(self.counts)
        threshold = c.max() * min_overlap_ratio
        bad_pairs = c < threshold
        keep = np.ones(self.n, dtype=bool)
        while True:
            active = bad_pairs & keep[None, :] & keep[:, None]
            counts = active.sum(0)
            if counts.max(initial=0) == 0:
                break
            keep[int(np.argmax(counts))] = False
        kept = [self.individual_keys[i] for i in range(self.n) if keep[i]]
        if len(kept) == self.n:
            return self
        return self.filter_individuals(kept)

    def keep_with_relatedness_outside(
        self, low: float, high: float
    ) -> "Kernel":
        """Keep only individuals participating in at least one pair whose
        relatedness falls OUTSIDE [low, high]
        (keepWithRelatednessOutside, kernel.cpp:2039-2070) — used to
        focus analyses on informative related/unrelated pairs."""
        from dissect_tpu.runtime.distributed_io import to_host

        k = to_host(self.dense())
        n = k.shape[0]
        off = k.copy()
        np.fill_diagonal(off, (low + high) / 2.0)  # diagonal never triggers
        outside = (off < low) | (off > high)
        keep = outside.any(axis=1)
        kept = [self.individual_keys[i] for i in range(n) if keep[i]]
        if len(kept) == n:
            return self
        return self.filter_individuals(kept)

    # --- combination ---------------------------------------------------------
    def add(self, other: "Kernel", subtract: bool = False) -> "Kernel":
        """Denormalize -> add/subtract raw kernels and counts -> renormalize
        (addGRMs, kernel.cpp:1705).  Requires identical individuals."""
        if self.individual_keys != other.individual_keys:
            raise ValueError("addGRMs requires identical individual sets")
        if self.counts is None or other.counts is None:
            raise ValueError("addGRMs requires counts (N) matrices")
        sign = -1.0 if subtract else 1.0
        raw = self.matrix * self.counts + sign * other.matrix * other.counts
        counts = self.counts + sign * other.counts
        snps = (
            [s for s in self.snp_names if s not in set(other.snp_names)]
            if subtract
            else self.snp_names + other.snp_names
        )
        return Kernel(
            name=self.name,
            type=self.type,
            individual_keys=list(self.individual_keys),
            matrix=raw / jnp.where(counts == 0, 1.0, counts),
            counts=counts,
            snp_names=snps,
        )


def grm_from_plink(
    data: PlinkData,
    chunk_size: int = 2048,
    dtype=jnp.float32,
    flat_normalization: bool = False,
    name: str = "GRM",
    sharding=None,
    drop_monomorphic: bool = False,
) -> Kernel:
    """Build the GRM from a PLINK fileset via streaming fused syrk.

    Parity: Kernel::Kernel(Genotype*) (kernel.cpp:61-125):
    kernel = Z^T Z over standardized genotypes, N = missings^T missings
    (or the constant SNP count under --grm-flat-normalization), then
    elementwise kernel/N.  Monomorphic SNPs are rejected as in
    normalizeGenotypes (genotype.cpp:915-940).
    """
    stats = data.stats()
    if bool(stats.monomorphic.any()):
        if drop_monomorphic:
            # --keep-zerostd-snps analog: silently drop instead of the
            # reference's .badsnps abort (genotype.cpp:915-940)
            keep = [
                data.snps[i].name
                for i in np.nonzero(~stats.monomorphic)[0]
            ]
            data = data.filter(keep_snps=keep)
            stats = data.stats()
        else:
            bad = [
                data.snps[i].name for i in np.nonzero(stats.monomorphic)[0][:10]
            ]
            raise ValueError(
                "monomorphic SNPs present (filter them first), e.g. "
                + ", ".join(bad)
            )
    mean = stats.mean
    inv_std = 1.0 / stats.std
    acc = grm_accumulator(data.n_individuals, dtype=dtype, sharding=sharding)
    for start, stop, chunk in data.iter_chunks(chunk_size):
        mu, istd = mean[start:stop], inv_std[start:stop]
        if stop - start < chunk_size:
            # pad the ragged last chunk with all-missing rows so every
            # update shares ONE compiled shape (missing contributes
            # nothing to either the kernel or the counts)
            pad = chunk_size - (stop - start)
            fill = (
                np.nan if np.issubdtype(chunk.dtype, np.floating) else -1
            )
            chunk = np.concatenate(
                [chunk, np.full((pad, chunk.shape[1]), fill, dtype=chunk.dtype)]
            )
            mu = np.concatenate([mu, np.zeros(pad)])
            istd = np.concatenate([istd, np.ones(pad)])
        acc.update(chunk, mu, istd)
    raw, counts = acc.finalize()
    if flat_normalization:
        counts = jnp.full_like(counts, float(data.n_snps))
    normalized = raw / jnp.where(counts == 0, 1.0, counts)
    return Kernel(
        name=name,
        type=KernelType.GRM,
        individual_keys=data.individual_keys,
        matrix=normalized,
        counts=counts,
        snp_names=data.snp_names,
    )


def kernel_from_discrete(
    name: str, keys: List[str], categories: Sequence[str]
) -> Kernel:
    """1 where two individuals share a category (createKernelFromDiscreteCovariates)."""
    cats = np.asarray(categories)
    same = (cats[:, None] == cats[None, :]).astype(np.float32)
    return Kernel(
        name=name,
        type=KernelType.DISCRETE_COVARIATE,
        individual_keys=list(keys),
        matrix=jnp.asarray(same),
    )


def couples_kernel(kernel: Kernel, couples: Dict[str, str]) -> Optional[Kernel]:
    """Indirect-effects kernel: relatedness of each individual's partner,
    relabeled with the original ids — K'[i, j] = K[partner(i), partner(j)]
    (introduceResortedGRMsByCouples, auxiliar.cpp:961-1040).

    `couples` maps FID@IID -> partner FID@IID.  Individuals without a
    partner present in the kernel are dropped; returns None when fewer
    than a quarter of the kernel's individuals survive
    (auxiliar.cpp:998-1002).
    """
    present = set(kernel.individual_keys)
    kept_keys: List[str] = []
    partner_keys: List[str] = []
    for key in kernel.individual_keys:
        partner = couples.get(key)
        if partner is None or partner not in present:
            continue
        kept_keys.append(key)
        partner_keys.append(partner)
    if len(kept_keys) * 4 <= kernel.n:
        return None
    resorted = kernel.filter_individuals(partner_keys)
    return Kernel(
        name="coup" + kernel.name,
        type=kernel.type,
        individual_keys=kept_keys,  # relabel with the original ids
        matrix=resorted.matrix,
        counts=resorted.counts,
        snp_names=list(kernel.snp_names),
    )


def kernel_from_multi_discrete(
    name: str, keys: List[str], category_sets: Sequence[Sequence[str]]
) -> Kernel:
    """K[i,j] = |cats_i ∩ cats_j| / sqrt(|cats_i| |cats_j|)
    (createKernelFromMultipleDiscreteCovariates, kernel.cpp:578-737):
    the normalized-indicator Gram matrix Z_norm Z_norm^T."""
    cats = sorted({c for s in category_sets for c in s})
    index = {c: i for i, c in enumerate(cats)}
    z = np.zeros((len(keys), len(cats)), dtype=np.float32)
    for i, s in enumerate(category_sets):
        for c in set(s):
            z[i, index[c]] = 1.0
    norms = np.sqrt(np.maximum(z.sum(axis=1), 1.0))
    zn = z / norms[:, None]
    return Kernel(
        name=name,
        type=KernelType.MULTI_DISCRETE_COVARIATE,
        individual_keys=list(keys),
        matrix=jnp.asarray(zn @ zn.T),
        snp_names=cats,
    )


def kernel_squared_exponential(
    name: str,
    keys: List[str],
    coords: np.ndarray,
    length_scale: Optional[float] = None,
) -> Kernel:
    """Squared-exponential kernel from coordinates (kernel.cpp:742+).

    With `length_scale=None` (the REML path) the kernel stores the
    SQUARED DISTANCES D and the covariance model evaluates
    exp(-alpha0 * D) with alpha0 a fitted ParameterAttributes::parameter
    (applyExponentialOperator, covariancematrix.cpp:805).  With an
    explicit length scale the exponential is materialized directly.
    """
    sq = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    if length_scale is None:
        return Kernel(
            name=name,
            type=KernelType.SQUARED_EXPONENTIAL,
            individual_keys=list(keys),
            matrix=jnp.asarray(sq),
        )
    return Kernel(
        name=name,
        type=KernelType.SQUARED_EXPONENTIAL,
        individual_keys=list(keys),
        matrix=jnp.exp(-0.5 * jnp.asarray(sq) / (length_scale**2)),
    )
