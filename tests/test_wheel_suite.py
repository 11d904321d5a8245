"""Run the in-wheel test package as part of the development suite.

The wheel ships `pyopal_tpu.tests` (run post-install as
``python -m unittest pyopal_tpu.tests``, mirroring the reference's
``pyproject.toml:73``); collecting its TestCases here keeps the
shipped suite from rotting between releases.
"""

from pyopal_tpu.tests.test_align import TestAlign
from pyopal_tpu.tests.test_alphabet import TestAlphabet
from pyopal_tpu.tests.test_database import TestDatabase
from pyopal_tpu.tests.test_engine import TestEngineOracle
from pyopal_tpu.tests.test_matrices import TestCatalog
from pyopal_tpu.tests.test_result import (
    TestEndResult,
    TestFullResult,
    TestScoreResult,
)

__all__ = [
    "TestAlign",
    "TestAlphabet",
    "TestDatabase",
    "TestEngineOracle",
    "TestCatalog",
    "TestEndResult",
    "TestFullResult",
    "TestScoreResult",
]
