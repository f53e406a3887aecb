"""PCA — top eigenvectors of a kernel.

Parity: pca.{h,cpp}: eigendecompose the GRM (pdsyev_, pca.cpp:36-67),
keep the top --num-eval eigenvectors, write `.pca.eigenvalues` /
`.pca.eigenvectors` (pca.cpp:69-101).  Eigenvalues are reported in
descending order with their variance share.

TPU-first: full eigh lowers to XLA's matmul-rich QDWH solver; for
k << N the randomized subspace iteration (linalg/eigen.py) avoids the
full O(N^3) solve.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from dissect_tpu.linalg.eigen import eigh_full, eigh_topk
from dissect_tpu.model.kernels import Kernel
from dissect_tpu.runtime.distributed_io import to_host


@dataclasses.dataclass
class PCA:
    individual_keys: List[str]
    eigenvalues: np.ndarray  # (k,) descending
    eigenvectors: np.ndarray  # (n, k) columns matching eigenvalues
    # the FULL spectrum, descending, when a full solve ran (the
    # reference always has it — pdsyev is full; None for randomized
    # top-k / pre-diagonalized kernels)
    all_eigenvalues: "np.ndarray | None" = None

    def write(self, prefix: str, precision: int = 8):
        """Write .pca.eigenvalues / .pca.eigenvectors, matching the
        reference's formats exactly (pca.cpp:85-101): eigenvalues one
        per line, descending, no header — ALL of them when the full
        spectrum was computed; eigenvectors as 'FID IID v1 v2 ...'."""
        evals = (
            self.all_eigenvalues
            if self.all_eigenvalues is not None
            else self.eigenvalues
        )
        with open(prefix + ".pca.eigenvalues", "w") as fh:
            for w in evals:
                fh.write(f"{w:.{precision}g}\n")
        with open(prefix + ".pca.eigenvectors", "w") as fh:
            for i, key in enumerate(self.individual_keys):
                fid, iid = key.split("@", 1)
                row = " ".join(
                    f"{v:.{precision}g}" for v in self.eigenvectors[i]
                )
                fh.write(f"{fid} {iid} {row}\n")


def compute_pca(
    kernel: Kernel,
    n_components: int = 20,
    randomized: Optional[bool] = None,
    mesh=None,
) -> PCA:
    """Top-k eigenpairs of a kernel.

    `randomized=None` auto-selects subspace iteration when
    k < n/8 (matmul-rich, avoids the full solve); a diagonalized kernel
    reuses its stored eigendecomposition.  With `mesh` the full solve
    runs the distributed sign-function divide-and-conquer
    (linalg/dc_eigen.py) instead of a one-device eigh.
    """
    n = kernel.n
    k = min(n_components, n)
    if kernel.diagonalized:
        w = to_host(kernel.eigenvalues)
        v = to_host(kernel.eigenvectors)
        order = np.argsort(w)[::-1]
        return PCA(
            individual_keys=list(kernel.individual_keys),
            eigenvalues=w[order[:k]],
            eigenvectors=v[:, order[:k]],
            all_eigenvalues=w[order],
        )
    if randomized is None:
        randomized = k * 8 < n
    if randomized:
        w, v = eigh_topk(kernel.dense(), k=k)
        return PCA(
            individual_keys=list(kernel.individual_keys),
            eigenvalues=to_host(w),
            eigenvectors=to_host(v),
        )
    # a 1-device mesh degrades to XLA's native eigh (~10x faster there;
    # the D&C solver is for spectra that must be sharded)
    if mesh is not None and mesh.devices.size > 1:
        from dissect_tpu.linalg.dc_eigen import distributed_eigh

        w, v = distributed_eigh(kernel.dense(), mesh=mesh)
    else:
        w, v = eigh_full(kernel.dense())
    # to_host is collective on multi-host sharded eigenvectors: every
    # process reassembles, only the dispatcher's root writes files.
    w_all = to_host(w)[::-1]
    v = to_host(v)[:, ::-1][:, :k]
    return PCA(
        individual_keys=list(kernel.individual_keys),
        eigenvalues=w_all[:k],
        eigenvectors=v,
        all_eigenvalues=w_all,
    )
