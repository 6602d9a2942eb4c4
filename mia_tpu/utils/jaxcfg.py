"""Process-wide JAX configuration for the device engines.

The reference is a single ahead-of-time compiled C binary; our equivalent of
"compile once" is a compilation cache.  Kernel shapes are deliberately
bucketed (see core/jax_engine.py) so the cache stays small and hot.

On the tunneled axon TPU backend the *server* keeps its own compile cache
("compile-cache v14" in the platform version string): re-compiles of a
previously seen module return in ~2 s, which is what makes warm runs fast.
JAX's client-side persistent cache is measurably HARMFUL there — executables
deserialized from the client disk cache hang at dispatch (reproduced: a
kernel that runs in 32 ms via a fresh/server-cached compile never returns
when loaded from the client cache).  So the client cache is strictly opt-in
via MIA_TPU_CACHE_DIR; by default we rely on the server cache.
"""
from __future__ import annotations

import os

_done = False


def setup_jax_cache() -> None:
    """Enable the client persistent compilation cache IF the user opted in
    by setting MIA_TPU_CACHE_DIR (idempotent; safe on any backend)."""
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get("MIA_TPU_CACHE_DIR")
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail the pipeline
        pass
