"""Run the reference's own unittest suite against ``pyopal_tpu``.

The strongest parity statement available: PyOpal's shipped tests
(``/root/reference/src/pyopal/tests/``) are loaded *unmodified* from
the reference checkout (nothing is copied into this repo) with the
module aliases a porting user would effectively apply —
``pyopal -> pyopal_tpu`` and
``scoring_matrices.ScoringMatrix -> pyopal_tpu.ScoringMatrix`` —
and must pass wholesale.

Skipped automatically when the reference checkout is absent (wheels,
CI); the compatibility contract is then covered by this repo's own
mirrored golden tests.
"""

import importlib.util
import pathlib
import sys
import types
import unittest

import pytest

import pyopal_tpu

REF_TESTS = pathlib.Path("/root/reference/src/pyopal/tests")

pytestmark = pytest.mark.skipif(
    not REF_TESTS.is_dir(),
    reason="reference checkout not available",
)

#: reference test modules exercised verbatim.  test_doctest.py is
#: excluded: it walks ``pyopal``'s compiled submodules via pkgutil and
#: re-runs the *reference's* docstring examples, whose prose (repr
#: formats, platform module names) is not part of the behavioral
#: contract this package mirrors.
MODULES = (
    "test_aligner",
    "test_align",
    "test_database",
    "test_alphabet",
    "test_result",
)


def _install_aliases(monkeypatch):
    monkeypatch.setitem(sys.modules, "pyopal", pyopal_tpu)
    shim = types.ModuleType("scoring_matrices")
    shim.ScoringMatrix = pyopal_tpu.ScoringMatrix
    monkeypatch.setitem(sys.modules, "scoring_matrices", shim)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"reference_{name}", REF_TESTS / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(suite):
    result = unittest.TestResult()
    suite.run(result)
    problems = [
        f"{test}: {trace}"
        for test, trace in result.failures + result.errors
    ]
    assert not problems, (
        f"{len(problems)} reference test(s) failed:\n"
        + "\n".join(problems)
    )
    assert result.testsRun > 0


@pytest.mark.parametrize("name", MODULES)
def test_reference_suite(name, monkeypatch):
    _install_aliases(monkeypatch)
    mod = _load(name)
    loader = unittest.TestLoader()
    suite = unittest.TestSuite()
    for test in loader.loadTestsFromModule(mod):
        for case in test:
            # the 1000..35000-residue overflow sweeps run as
            # slow-marked tests below
            if "overflow" in case.id().lower():
                continue
            suite.addTest(case)
    _run(suite)


@pytest.mark.slow
@pytest.mark.parametrize("name", ("test_aligner",))
def test_reference_suite_overflow_sweeps(name, monkeypatch):
    _install_aliases(monkeypatch)
    mod = _load(name)
    loader = unittest.TestLoader()
    suite = unittest.TestSuite()
    for test in loader.loadTestsFromModule(mod):
        for case in test:
            if "overflow" in case.id().lower():
                suite.addTest(case)
    _run(suite)
