"""Run docstring examples of every public submodule as tests.

In-wheel mirror of the reference's shipped doctest walker
(``/root/reference/src/pyopal/tests/test_doctest.py``): the documented
examples (``Database.extend``, ``FullResult.cigar``, the ``align``
generator, ...) double as API-stability checks on an installed
artifact.  The repository's ``tests/test_doctest.py`` runs the same
modules under pytest.
"""

import doctest
import importlib
import unittest

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


class TestDoctests(unittest.TestCase):
    pass


def _make_case(name):
    def _case(self):
        module = importlib.import_module(name)
        globs = dict(module.__dict__)
        # examples reference public names unqualified, like the
        # reference doctests do (its test_doctest.py injects the
        # package into the example globals)
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
        failures = tries = 0
        for test in finder.find(module, name, globs=globs):
            result = runner.run(test)
            failures += result.failed
            tries += result.attempted
        self.assertEqual(
            failures, 0, f"{failures} doctest failure(s) in {name}"
        )

    return _case


for _name in MODULES:
    setattr(
        TestDoctests,
        "test_" + _name.replace(".", "_"),
        _make_case(_name),
    )
del _name
