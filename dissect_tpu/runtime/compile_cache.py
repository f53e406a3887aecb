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


def default_cache_dir() -> str | None:
    """Cache directory, or None when caching is disabled (env var = 0).

    An explicit env override is used verbatim (the caller owns host
    consistency); the default locations are partitioned per host CPU."""
    env = os.environ.get(_ENV)
    if env == "0":
        return None
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(repo, ".git")) or os.path.isdir(
        os.path.join(repo, ".jax_cache")
    ):
        return os.path.join(repo, ".jax_cache", _host_key())
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "dissect_tpu",
        "jax_cache",
        _host_key(),
    )


def enable_compile_cache() -> str | None:
    """Point JAX at the persistent cache; returns the directory or None."""
    cache = default_cache_dir()
    if cache is None:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache
