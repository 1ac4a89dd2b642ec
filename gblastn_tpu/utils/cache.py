"""JAX persistent compilation cache setup.

First-compile latency on TPU dominates small runs (the seeding pipeline
is several jitted kernels); enabling the persistent cache makes repeat
CLI invocations start hot. The role of the reference's one-time process
warm-up cost amortized across its long-lived pipeline process
(blastn_app.cpp Method2/3 keep one process alive across query files).
"""
from __future__ import annotations

import os

_enabled = False


def _host_fingerprint() -> str:
    """Hash of the host CPU feature set. XLA:CPU AOT cache entries are
    machine-specific but the cache key is not: loading an entry
    compiled on a CPU with different vector extensions SIGILLs or
    segfaults the process (observed with avx512 feature drift between
    build hosts). Keying the cache DIRECTORY by the feature set makes a
    foreign cache invisible instead of fatal."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:  # pragma: no cover
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    if os.environ.get("GBLASTN_TPU_NO_COMPILE_CACHE"):
        # The test suite disables persistent-cache WRITES entirely:
        # serializing giant cold-compiled XLA:CPU executables late in a
        # long process has segfaulted inside
        # compilation_cache.put_executable_and_time (three reproducible
        # crashes at the same write site), and concurrent first-compiles
        # from parallel test processes have corrupted entries before
        # (CLAUDE.md). Production runs (TPU) keep the cache.
        _enabled = True
        return
    import jax

    path = cache_dir or os.environ.get(
        "GBLASTN_TPU_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "gblastn_tpu",
            f"jax-{_host_fingerprint()}",
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
