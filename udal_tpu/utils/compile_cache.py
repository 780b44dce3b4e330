"""Persistent XLA compilation cache.

A cold start of the full d0 10-pass MC serving program pays ~13 minutes of
warmup+compile on the tunneled-TPU relay (BENCH_r03.json tail: 782.9 s).
The reference has no analogue (TF retraces per process but its graphs are
small); for a production deployment the fix is JAX's persistent compilation
cache: compiled executables are keyed by (HLO, compiler flags, device kind)
and reloaded on the next process start, turning the 13-minute cold start
into a disk read.

Enable with ``--compile_cache DIR`` on any udal_tpu CLI command or the
``UDAL_COMPILE_CACHE`` environment variable (flag wins). Safe to share the
directory across model sizes and op points — entries are content-addressed.
"""

from __future__ import annotations

import os

ENV_VAR = "UDAL_COMPILE_CACHE"


def enable_compile_cache(path: str, min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing). ``min_compile_secs`` filters out trivially cheap programs so
    the cache holds only the expensive serving/train executables."""
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax

    # The persistent cache is a process singleton initialized on first use;
    # once something has compiled under a previous dir, merely updating the
    # config is ignored. Reset it so enabling (or re-pointing) the cache
    # mid-process takes effect.
    try:
        from jax._src import compilation_cache as _cc

        if _cc.is_initialized():
            _cc.reset_cache()
    except (ImportError, AttributeError):  # private API moved — best effort
        pass
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def enable_from_env_or_flag(flag_value: str | None) -> str | None:
    """CLI hook: ``--compile_cache`` flag wins over ``UDAL_COMPILE_CACHE``;
    returns the enabled path or None if neither is set."""
    path = flag_value or os.environ.get(ENV_VAR)
    if not path:
        return None
    return enable_compile_cache(path)
