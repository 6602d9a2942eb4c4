"""Process-wide JAX configuration for the device engines.

The reference is a single ahead-of-time compiled C binary; our equivalent of
"compile once" is the persistent compilation cache.  Kernel shapes are
process-constant by design (see core/jax_engine.py) so the cache holds ONE
program per (reference bucket, backend) pair.

On the tunneled axon TPU backend the server keeps its own compile cache, but
it is unreliable under multi-tenancy (measured: the same program compiles in
5 s or 54 s run-to-run as entries evict).  The client-side persistent cache
removes that lottery: warm runs deserialize in ~0.1 s.  An earlier stack
(round 2) hung at dispatch when loading client-cached executables; that no
longer reproduces (verified with full 20k-read assemblies, byte-identical
output), so the client cache is ON by default — set MIA_TPU_NO_CACHE=1 to
fall back to server-side compiles only, or MIA_TPU_CACHE_DIR to relocate it.
"""
from __future__ import annotations

import os

_done = False


def apply_platform_override() -> None:
    """Honor MIA_JAX_PLATFORM (e.g. "cpu") even when a site plugin pins
    JAX_PLATFORMS at interpreter start: jax.config can still be updated as
    long as no backend has been initialised.  Used by the CPU-backend tests
    and the virtual-mesh dry run."""
    plat = os.environ.get("MIA_JAX_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def _machine_tag() -> str:
    """Stable fingerprint of this host's CPU feature set.  CPU-backend cache
    entries embed AOT machine features; loading an entry compiled on a
    different host generation triggers "could lead to SIGILL" warnings (and
    risk), so the cache directory is keyed per machine."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


def cache_dir_path() -> str:
    """Location of the persistent compile cache (and the warm-shape list)."""
    return os.environ.get("MIA_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mia-tpu", "xla", _machine_tag()
    )


def setup_jax_cache() -> None:
    """Enable the client persistent compilation cache (idempotent; safe on
    any backend).  Opt out with MIA_TPU_NO_CACHE=1.

    This is the difference between a usable and an unusable device engine on
    the tunneled TPU backend: the remote compile server re-compiles the SAME
    HLO in 35-235 s run-to-run (measured; its own cache does not persist
    across client processes), while a client-cache hit deserializes in
    ~3-5 s.  The cache engagement is also forced explicitly because the
    platform check in jax's compilation_cache is allowlist-based and the
    tunneled backend's eligibility proved flaky in practice."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("MIA_TPU_NO_CACHE"):
        return
    cache_dir = cache_dir_path()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        from jax._src import compilation_cache as _cc

        with _cc._cache_initialized_mutex:
            _cc._cache_checked = True
            _cc._cache_used = True
    except Exception:  # cache is an optimization; never fail the pipeline
        pass
