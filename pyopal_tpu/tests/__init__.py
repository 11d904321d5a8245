"""Tests shipped inside the package, runnable post-install.

Mirrors the reference's in-wheel test package
(``/root/reference/src/pyopal/tests/__init__.py:13-20``, run as
``python -m unittest pyopal.tests`` per ``pyproject.toml:73``)::

    python -m unittest pyopal_tpu.tests

Coverage on an installed artifact: golden answers (the reference
suite's pinned numbers), container and alphabet semantics, result
classes, the threaded front-end, the matrix catalog, every public
module's docstring examples, and one interpret-mode kernel
cross-check against the scalar oracle.  The
full development suite (engine sweeps, sharded mesh equality, IO,
docs) lives in the repository's ``tests/`` directory.
"""

import unittest

from . import (
    test_align,
    test_alphabet,
    test_database,
    test_doctest,
    test_engine,
    test_matrices,
    test_result,
    test_smoke,
)

_MODULES = [
    test_smoke,
    test_align,
    test_alphabet,
    test_database,
    test_doctest,
    test_engine,
    test_matrices,
    test_result,
]


def load_tests(loader, suite, pattern):
    for module in _MODULES:
        suite.addTests(loader.loadTestsFromModule(module))
    return suite
