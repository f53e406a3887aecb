"""Runtime startup: multi-process init + global mesh construction.

The reference constructs the `Communicator` before anything else
(main.cpp:57) and every analysis runs on the resulting BLACS grid
(communicator.cpp:40-103).  The TPU analog, called from the CLI's
main() before any analysis dispatch:

  1. `maybe_initialize_distributed()` — `jax.distributed.initialize`
     when the environment says this is one process of a multi-process
     run (the MPI_Init replacement).  Controlled by the standard JAX
     coordination env vars or DISSECT_TPU_DISTRIBUTED=1.
  2. `startup_runtime(args)` — build the process-global MeshContext
     (the Communicator singleton analog) according to --mesh.

Whether an individual analysis then USES the mesh is decided by
`use_distributed(...)`: above --distributed-threshold individuals (the
beyond-single-chip regime) or always under --force-distributed.
"""

from __future__ import annotations

import os
from typing import Optional

from dissect_tpu.runtime.mesh import MeshContext, get_mesh_context, set_mesh_context

_DIST_INITIALIZED = False

# env vars that signal a coordinated multi-process launch
_COORD_VARS = (
    "DISSECT_TPU_DISTRIBUTED",
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
)


def multiprocess_requested() -> bool:
    v = os.environ.get("DISSECT_TPU_DISTRIBUTED")
    if v is not None:
        return v not in ("", "0", "false")
    return any(os.environ.get(k) for k in _COORD_VARS[1:])


def maybe_initialize_distributed() -> bool:
    """`jax.distributed.initialize` once, when the env requests it.

    Returns True when running multi-process (after init).  Arguments
    (coordinator address, process count/index) come from the standard
    JAX env vars; with DISSECT_TPU_DISTRIBUTED=1 alone, initialize()
    autodetects (TPU pod metadata / single-process fallback).
    """
    global _DIST_INITIALIZED
    if not multiprocess_requested():
        return False
    if not _DIST_INITIALIZED:
        import jax

        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as exc:
            # already initialized elsewhere (e.g. a test harness)
            if "already" not in str(exc).lower():
                raise
        _DIST_INITIALIZED = True
    return True


def parse_mesh_spec(spec: Optional[str]) -> Optional[MeshContext]:
    """--mesh grammar: 'auto' (all devices, near-square 2D grid — the
    Communicator's nProcRows x nProcCols factoring), 'none' (single
    device semantics), 'RxC' (explicit grid), or 'N' (first N devices).
    """
    import jax

    if spec is None or spec == "auto":
        return MeshContext.create()
    if spec == "none":
        return None
    if "x" in spec:
        rows, cols = (int(t) for t in spec.split("x", 1))
        devices = jax.devices()[: rows * cols]
        if len(devices) < rows * cols:
            raise ValueError(
                f"--mesh {spec} needs {rows * cols} devices, "
                f"only {len(devices)} visible"
            )
        return MeshContext.create(devices, shape=(rows, cols))
    n = int(spec)
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f"--mesh {spec}: only {len(devices)} devices visible")
    return MeshContext.create(devices)


def apply_platform_override() -> None:
    """Honor DISSECT_TPU_PLATFORM (e.g. 'cpu'): an explicit platform
    override that survives environments where a site hook re-forces
    JAX_PLATFORMS (e.g. a TPU-tunnel image).  Must run before ANY
    backend use — call it first thing in the CLI main()."""
    plat = os.environ.get("DISSECT_TPU_PLATFORM")
    if not plat:
        return
    import jax

    if jax.config.jax_platforms != plat:
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized; keep what we have


def startup_runtime(args) -> Optional[MeshContext]:
    """CLI startup (the main.cpp:57 analog): distributed init + global
    mesh.  Returns the MeshContext (None with --mesh none)."""
    apply_platform_override()
    maybe_initialize_distributed()
    ctx = parse_mesh_spec(getattr(args, "mesh", "auto"))
    set_mesh_context(ctx)
    return ctx


def use_distributed(
    args, n_individuals: int, force: bool = False,
    allow_single_device: bool = False,
) -> Optional[MeshContext]:
    """The mesh to run this analysis on, or None for the single-device
    path.  Engaged above --distributed-threshold individuals (the
    reference is grid-distributed unconditionally, communicator.cpp:40;
    on TPU one chip is FASTER below the HBM limit, so the sharded
    engines only pay off at scale), under --force-distributed, or when
    the caller forces it (e.g. --parallel-gwas for the SNP-axis
    sharding, gwas.cpp:557-687).

    `allow_single_device`: REML callers set this so big-N fits on ONE
    accelerator chip still go through the sharded engine — same speed
    there (BENCH r03: blocked vs XLA inverse within 3%), but its f64
    endgame runs ON DEVICE (mixed fp32-factor/f64-refine), where the
    plain engine's host-CPU f64 Newton is intractable at Tn ~ 20k+."""
    ctx = get_mesh_context()
    if ctx is None:
        return None
    if ctx.n_devices <= 1 and not (
        allow_single_device
        and ctx.mesh.devices.flat[0].platform != "cpu"
        and n_individuals
        >= getattr(args, "distributed_threshold", 16384)
    ):
        return None
    if force or getattr(args, "force_distributed", False):
        return ctx
    if n_individuals >= getattr(args, "distributed_threshold", 16384):
        return ctx
    return None
