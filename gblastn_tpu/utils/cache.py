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


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = cache_dir or os.environ.get(
        "GBLASTN_TPU_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "gblastn_tpu", "jax"
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
