"""Device mesh construction — the TPU-native replacement of the BLACS grid.

The reference factors `mpiNumTasks` into a near-square `nProcRows x
nProcCols` process grid and distributes every large matrix 2D
block-cyclically over it (reference: communicator.cpp:66-103).  Here the
equivalent is a 2D `jax.sharding.Mesh` with axes ``('i', 'j')``; arrays
carry `NamedSharding`s and XLA SPMD inserts the collectives that
BLACS/ScaLAPACK performed explicitly.

Unlike the reference, which errors out on prime process counts
(communicator.cpp:66-79), we accept any device count (primes degrade to a
1 x n grid).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _near_square_factors(n: int) -> tuple[int, int]:
    """Factor n into (rows, cols) with rows <= cols, rows maximal <= sqrt(n)."""
    rows = 1
    for d in range(1, int(math.isqrt(n)) + 1):
        if n % d == 0:
            rows = d
    return rows, n // rows


_COLLECTIVES_WARMED = False


def _warm_collectives() -> None:
    """One startup barrier per multi-process run (the BLACS-grid-init
    barrier analog, communicator.cpp:279-282).

    The CPU backend's Gloo collectives rendezvous through the
    coordination KV store with a hard ~30 s timeout; if the FIRST
    collective happens deep inside an analysis, workers arrive skewed
    by their own compiles and a loaded box blows the deadline.  Forcing
    one trivial all-device collective here — while process skew is
    interpreter-startup seconds — creates the global Gloo context once,
    up front."""
    global _COLLECTIVES_WARMED
    if _COLLECTIVES_WARMED or jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dissect_tpu_mesh_startup")
    _COLLECTIVES_WARMED = True


@dataclasses.dataclass
class MeshContext:
    """A 2D device mesh plus canonical sharding helpers.

    Axes:
      'i' — the row axis of the logical process grid.  For the genotype
            matrix (SNPs x individuals) this shards the SNP axis; for
            N x N kernels it shards matrix rows.
      'j' — the column axis; shards individuals / matrix columns.
    """

    mesh: Mesh

    @staticmethod
    def create(
        devices: Optional[Sequence[jax.Device]] = None,
        shape: Optional[tuple[int, int]] = None,
    ) -> "MeshContext":
        if devices is None:
            devices = jax.devices()
        n = len(devices)
        if shape is None:
            shape = _near_square_factors(n)
        if shape[0] * shape[1] != n:
            raise ValueError(f"mesh shape {shape} != device count {n}")
        dev_grid = np.asarray(devices).reshape(shape)
        _warm_collectives()
        return MeshContext(mesh=Mesh(dev_grid, ("i", "j")))

    # --- canonical shardings -------------------------------------------------
    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    @property
    def flat(self) -> Mesh:
        """1D mesh over all devices, axis 'i' — used by the row-sharded
        engines (blocked Cholesky, distributed eigensolver) where a
        single sharded axis engages every chip."""
        return Mesh(self.mesh.devices.reshape(-1), ("i",))

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def shard(self, x, spec: P):
        """Place an array on the mesh with the given PartitionSpec."""
        return jax.device_put(x, self.sharding(spec))

    @property
    def dist2d(self) -> NamedSharding:
        """2D sharding of a (rows, cols) matrix — the block-cyclic analog."""
        return self.sharding(P("i", "j"))

    @property
    def rows(self) -> NamedSharding:
        """Shard rows over the whole mesh (both axes flattened onto rows)."""
        return self.sharding(P(("i", "j"), None))

    @property
    def cols(self) -> NamedSharding:
        return self.sharding(P(None, ("i", "j")))

    @property
    def vec(self) -> NamedSharding:
        """1D sharding of a vector over the whole mesh."""
        return self.sharding(P(("i", "j")))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding(P())


# --- global mesh context (the reference's global `communicator` singleton,
#     main.cpp:51 — in single-controller JAX a process-global default mesh) ---

_MESH_CONTEXT: Optional[MeshContext] = None


def set_mesh_context(ctx: Optional[MeshContext]) -> None:
    global _MESH_CONTEXT
    _MESH_CONTEXT = ctx


def get_mesh_context(create: bool = False) -> Optional[MeshContext]:
    """Return the global MeshContext.

    With ``create=True``, lazily build one over all visible devices when no
    context has been set (the analog of Communicator construction at
    program start, communicator.cpp:40-103).
    """
    global _MESH_CONTEXT
    if _MESH_CONTEXT is None and create:
        _MESH_CONTEXT = MeshContext.create()
    return _MESH_CONTEXT
