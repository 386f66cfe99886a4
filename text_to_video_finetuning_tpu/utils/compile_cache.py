"""Persistent XLA compilation cache for the CLIs.

Full-model TPU compiles over the remote compile service take ~15 min cold;
the persistent cache makes the second `train.py`/`inference.py` launch
reuse them (warm start: seconds).  The test suite and `__graft_entry__`
already use the same mechanism (tests/conftest.py:24-27); this helper
gives the user-facing CLIs the same warm-start behavior.

Override the location with T2V_COMPILE_CACHE=<dir> (set it to an empty
string to disable).
"""

from __future__ import annotations

import os

ENV_VAR = "T2V_COMPILE_CACHE"
DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "t2v_tpu_xla_cache")


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (default:
    ~/.cache/t2v_tpu_xla_cache, override via T2V_COMPILE_CACHE).  Must run
    before the first jit compile; safe to call more than once."""
    import jax

    if path is None:
        path = os.environ.get(ENV_VAR, DEFAULT_DIR)
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; tiny shapes
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    return path
