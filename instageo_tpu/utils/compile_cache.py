"""Persistent XLA compilation cache.

First compilation of the 100M+ models takes tens of seconds on a local
TPU host and can queue for minutes through a remote-compile service;
caching compiled executables on disk makes every later run (re-runs,
eval after train, serving restarts, queue workers) start hot.

Enabled by the train CLI and the serving engine. Opt out with
``INSTAGEO_COMPILE_CACHE=0``; point elsewhere with
``INSTAGEO_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_DIR = "/tmp/instageo_jax_cache"


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Idempotently turn on jax's persistent compilation cache."""
    if os.environ.get("INSTAGEO_COMPILE_CACHE", "1") == "0":
        return False
    cache_dir = (cache_dir
                 or os.environ.get("INSTAGEO_COMPILE_CACHE_DIR")
                 or DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception as e:  # never let caching break the run
        log.warning("compilation cache disabled: %s", e)
        return False
