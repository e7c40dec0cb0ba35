"""Persistent XLA compilation cache.

The fully fused GGS sampler is a large program (5 SGD phases x grad graphs
inside a scan) whose first compile can take minutes through a remote-compile
path; the persistent cache makes that a once-per-machine cost.  Called by
every entry point before the first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "POSEDIFFUSION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "posediffusion_tpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
