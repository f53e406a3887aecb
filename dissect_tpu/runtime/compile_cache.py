"""Persistent XLA compilation cache.

The reference pays no compile cost (ahead-of-time C++); under JAX every
jitted program is compiled on first use, and through a remote TPU
compile service that can take minutes for large Pallas kernels.  The
persistent cache amortizes this across processes: CLI runs, bench runs
and the driver's compile checks all share one on-disk cache.

Default location: <repo>/.jax_cache when running from a source checkout,
else ~/.cache/dissect_tpu/jax_cache.  Override with
DISSECT_TPU_COMPILE_CACHE=<dir>, disable with DISSECT_TPU_COMPILE_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os

_ENV = "DISSECT_TPU_COMPILE_CACHE"


def _host_key() -> str:
    """A fingerprint of this host's CPU capabilities.

    XLA:CPU persists AOT executables specialized to the build machine's
    vector extensions; loading one on a host with different features is
    at best a warning and at worst silent miscompiled code (observed: a
    cross-host cache hit that hung inside a device->host copy).  Keying
    the cache directory by CPU identity makes stale entries unreachable
    instead of trusting the loader's feature check.

    The key covers the model name as well as the ISA flags: XLA picks
    per-model tuning features (+prefer-no-scatter/+prefer-no-gather on
    some Xeons) that do not appear in cpuinfo flags, so two hosts with
    identical flags can still disagree on the AOT target."""
    try:
        with open("/proc/cpuinfo") as fh:
            flags = model = ""
            for line in fh:
                if line.startswith("flags") and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif line.startswith("model name") and not model:
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
            if flags:
                return hashlib.md5(f"{model}|{flags}".encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(
        f"{platform.machine()}-{platform.processor()}".encode()
    ).hexdigest()[:10]


def _tpu_platform() -> bool:
    """True when this process targets an accelerator backend.  TPU
    executables are serialized for the device, not the host CPU — they
    are valid on any host that can reach the chip.

    Detection order: DISSECT_TPU_PLATFORM / JAX_PLATFORMS when set;
    otherwise the actual default backend.  On a real TPU VM the env
    vars are normally UNSET (jax auto-selects tpu), so treating unset
    as CPU would silently re-partition the cache per host and bring
    back the host-key-churn recompiles this module exists to fix."""
    plat = os.environ.get(
        "DISSECT_TPU_PLATFORM", os.environ.get("JAX_PLATFORMS", "")
    )
    if plat:
        return "cpu" not in plat.lower().split(",")
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _migrate_siblings(cache: str) -> int:
    """Hardlink entries from sibling key dirs into the shared
    accelerator dir.

    Round 2 changed the host-key derivation (flags-only -> model+flags)
    after the cache had been warmed, orphaning every entry: the bench's
    large Pallas GRM program recompiled through the remote TPU service
    for >7 minutes and the round shipped a zeroed BENCH record.  TPU
    entries are device-targeted (host-independent), so they now live in
    one shared dir; this one-time adoption pulls entries out of the old
    per-host dirs.  Entries are content-hash-named (the XLA cache key
    covers program + compile target), so same-named files are identical
    and stray CPU entries from old dirs are inert here — a process with
    an accelerator-only JAX_PLATFORMS never looks up CPU keys.  Linking
    is idempotent and costs no disk.  Returns the entry count linked."""
    parent = os.path.dirname(cache)
    current = os.path.basename(cache)
    linked = 0
    try:
        siblings = [
            d for d in os.listdir(parent)
            if d != current and os.path.isdir(os.path.join(parent, d))
        ]
    except OSError:
        return 0
    if not siblings:
        return 0
    os.makedirs(cache, exist_ok=True)
    have = set(os.listdir(cache))
    for key in siblings:
        sib = os.path.join(parent, key)
        try:
            for name in os.listdir(sib):
                if name in have:
                    continue
                try:
                    os.link(os.path.join(sib, name), os.path.join(cache, name))
                    have.add(name)
                    linked += 1
                except OSError:
                    pass
        except OSError:
            pass
    return linked


def default_cache_dir() -> str | None:
    """Cache directory, or None when caching is disabled (env var = 0).

    An explicit env override is used verbatim (the caller owns host
    consistency); the defaults are one shared dir for accelerator runs
    and per-host-CPU dirs for CPU runs."""
    env = os.environ.get(_ENV)
    if env == "0":
        return None
    if env:
        return env
    # Accelerator executables are serialized for the DEVICE: one shared
    # dir, immune to host-CPU key churn (the round-2 zeroed-bench root
    # cause).  XLA:CPU AOT results are host-tuned (loading across hosts
    # is at best a warning, at worst SIGILL), so CPU runs stay
    # partitioned per host CPU identity.
    key = "tpu" if _tpu_platform() else _host_key()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(repo, ".git")) or os.path.isdir(
        os.path.join(repo, ".jax_cache")
    ):
        return os.path.join(repo, ".jax_cache", key)
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "dissect_tpu",
        "jax_cache",
        key,
    )


def enable_compile_cache() -> str | None:
    """Point JAX at the persistent cache; returns the directory or None."""
    cache = default_cache_dir()
    if cache is None:
        return None
    if not os.environ.get(_ENV) and os.path.basename(cache) == "tpu":
        # shared accelerator dir: adopt entries stranded in the old
        # per-host key dirs (an explicit override is used verbatim;
        # per-host CPU dirs never adopt foreign AOT results)
        _migrate_siblings(cache)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache
