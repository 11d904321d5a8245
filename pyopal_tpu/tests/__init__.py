"""Tests shipped inside the package, runnable post-install.

Mirrors the reference's in-wheel test package
(``/root/reference/src/pyopal/tests/__init__.py:13-20``, run as
``python -m unittest pyopal.tests`` per ``pyproject.toml:73``)::

    python -m unittest pyopal_tpu.tests

This is a compact smoke suite (golden answers, container semantics,
result classes) that needs no test data; the full development suite
lives in the repository's ``tests/`` directory.
"""

import unittest

from . import test_smoke


def load_tests(loader, suite, pattern):
    suite.addTests(loader.loadTestsFromModule(test_smoke))
    return suite
