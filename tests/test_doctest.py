"""Run docstring examples of every public submodule as tests.

Mirror of the reference ``tests/test_doctest.py``: doubles as an
API-stability check for the documented examples (``Database.extend``,
``FullResult.cigar``, the ``align`` generator example, ...).
"""

import doctest
import importlib

import pytest

import pyopal_tpu

MODULES = [
    "pyopal_tpu",
    "pyopal_tpu._align",
    "pyopal_tpu.alphabet",
    "pyopal_tpu.aligner",
    "pyopal_tpu.database",
    "pyopal_tpu.matrices",
    "pyopal_tpu.results",
    "pyopal_tpu.io",
    "pyopal_tpu.parallel.api",
]


@pytest.mark.parametrize("name", MODULES)
def test_doctests(name):
    module = importlib.import_module(name)
    globs = dict(module.__dict__)
    # examples reference public names unqualified, like the reference
    # doctests do (test_doctest.py injects the package into globals)
    globs.update(
        {
            "pyopal_tpu": pyopal_tpu,
            "Aligner": pyopal_tpu.Aligner,
            "Alphabet": pyopal_tpu.Alphabet,
            "Database": pyopal_tpu.Database,
            "ScoringMatrix": pyopal_tpu.ScoringMatrix,
            "align": pyopal_tpu.align,
        }
    )
    runner = doctest.DocTestRunner(
        verbose=False,
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
    )
    finder = doctest.DocTestFinder(exclude_empty=True)
    failures = 0
    tries = 0
    for test in finder.find(module, name, globs=globs):
        result = runner.run(test)
        failures += result.failed
        tries += result.attempted
    assert failures == 0, f"{failures} doctest failure(s) in {name}"
