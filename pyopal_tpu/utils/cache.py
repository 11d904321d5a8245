"""Persistent XLA compilation cache setup.

TPU kernel compilation (Mosaic) can take tens of seconds; enabling the
JAX persistent cache makes every process after the first reuse compiled
binaries.  Call `enable()` early (bench.py and the aligner do).
"""

from __future__ import annotations

import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
if os.path.exists(os.path.join(_ROOT, "setup.py")):
    # source checkout: keep the cache next to the repo (gitignored)
    _DEFAULT_DIR = os.path.join(_ROOT, ".jax_cache")
else:
    # installed package: site-packages may be read-only and should not
    # accumulate compiled binaries — use the user cache dir
    _DEFAULT_DIR = os.path.join(
        os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        ),
        "pyopal_tpu",
        "jax_cache",
    )

_enabled = False


def enable(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get("PYOPAL_TPU_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # pragma: no cover - cache is best-effort
        pass
