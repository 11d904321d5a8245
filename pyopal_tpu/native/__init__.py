"""Native (CPython C API) extensions: sequence codec + result types.

The TPU compute path is JAX/Pallas; these extensions cover the two
serial host-side hot loops outside the kernels, where the reference is
likewise native (Cython):

- ``_encoder``: ASCII->ordinal encoding / decoding and FASTA parsing
  (reference analog: ``Alphabet.encode_into``, ``lib.pyx:239-268``);
- ``_results``: result extension types + bulk builders that wrap the
  kernel's dense score/end arrays (reference analog: preallocated cdef
  results, ``platform/pyx.in:64-72``).

Both are optional — pure-Python fallbacks keep the package functional —
but a source checkout can bootstrap them in place with `ensure_built`
(used by ``tests/conftest.py``, ``bench.py`` and CI), so the fast paths
are active everywhere without committing platform-specific binaries.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

_EXTENSIONS = ("_encoder", "_results")


def _missing_extensions() -> list:
    missing = []
    for name in _EXTENSIONS:
        try:
            importlib.import_module(f"{__name__}.{name}")
        except ImportError:
            missing.append(name)
    return missing


def ensure_built(quiet: bool = True) -> bool:
    """Build any missing native extension in place (source checkouts).

    Runs ``setup.py build_ext --inplace`` in the repository root when an
    extension module fails to import and the C sources are present.
    Returns `True` when every extension is importable afterwards.
    No-op (returning `False`) for installed wheels without sources or
    when ``PYOPAL_TPU_NO_BUILD=1``.
    """
    if not _missing_extensions():
        return True
    if os.environ.get("PYOPAL_TPU_NO_BUILD"):
        return False
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(os.path.dirname(pkg_dir))
    if not os.path.exists(os.path.join(root, "setup.py")):
        return False
    try:
        # serialize concurrent in-place builds (e.g. pytest-xdist
        # workers importing simultaneously): whoever loses the race
        # blocks until the winner finishes, then re-probes
        lock_path = os.path.join(root, ".native_build.lock")
        with open(lock_path, "a+") as lock_file:
            try:
                import fcntl

                fcntl.flock(lock_file, fcntl.LOCK_EX)
            except ImportError:  # pragma: no cover - non-POSIX
                pass
            importlib.invalidate_caches()
            if not _missing_extensions():
                return True
            subprocess.run(
                [sys.executable, "setup.py", "build_ext", "--inplace"],
                cwd=root,
                check=True,
                capture_output=quiet,
            )
    except (OSError, subprocess.CalledProcessError):
        return False
    importlib.invalidate_caches()
    return not _missing_extensions()
