"""Persistent XLA compilation cache.

Compiles on the tunneled TPU backend here run through a remote compiler
at ~2-8 min per jitted program; the persistent cache makes every CLI /
bench rerun hit the disk cache instead. Safe no-op when unsupported.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def honor_jax_platforms_env():
    """Honor an explicit ``JAX_PLATFORMS`` env even when a site hook
    pre-set the platform list via ``jax.config`` (standard JAX consults
    the env only when the config was never touched). Call before first
    device use; the CLIs and bench all route through this."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def enable_compile_cache(path: str | None = None):
    import jax

    # every CLI/script funnels through here before first device use, so
    # honoring an explicit JAX_PLATFORMS at this single point keeps
    # CPU-mode runs (smokes, tests) from dialing the TPU tunnel even
    # under the sitecustomize hook that force-sets jax_platforms
    honor_jax_platforms_env()

    path = path or os.environ.get("JAX_CACHE_DIR", _DEFAULT)
    try:
        # CPU AOT cache entries embed machine-feature flags that differ
        # between processes on this host and can SIGILL on reload — only
        # cache accelerator compiles (where it saves minutes).
        if jax.default_backend() == "cpu":
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is best-effort
        print(f"[compile_cache] disabled: {e}")
    return path
