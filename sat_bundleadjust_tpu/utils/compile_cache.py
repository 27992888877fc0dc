"""Persistent XLA compilation cache.

Remote/tunneled TPU deployments pay minutes of compilation per program and
per shape; the persistent cache amortizes that across processes. The
JAX_COMPILATION_CACHE_DIR environment variable alone is NOT sufficient in
deployments whose sitecustomize re-initializes jax config (observed under
the axon platform plugin) — the jax.config.update calls below are.

Enabled from the CLI and bench entry points; library users call
enable_persistent_cache() themselves if desired.
"""

import os


def enable_persistent_cache(path=None):
    """Turn on the on-disk executable cache. Returns the cache dir.

    path precedence: argument > SATBA_CACHE_DIR env > ~/.cache/sat_bundleadjust_tpu/jax.
    Set SATBA_CACHE_DIR=0 to disable."""
    import jax

    env = os.environ.get("SATBA_CACHE_DIR")
    if env == "0":
        return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "sat_bundleadjust_tpu", "jax"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on the tunneled deployment even a trivial
        # eager op pays ~0.5 s of remote compile, and ops under the 1 s
        # default threshold were never written — measured 73 such misses
        # (~35 s) per fresh process (scripts/probe_compile_cache.py);
        # the large programs were hitting all along
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path
