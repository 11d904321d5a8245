"""Native extension wiring: the C fast paths must be ACTIVE, not just
present as source (round-1 finding: ``_results`` was dead code).

These tests run after the package bootstrap (`pyopal_tpu.native
.ensure_built`, invoked on first import), so in a source checkout with
a C compiler — every dev box and CI — the extensions must be live; the
pure-Python fallbacks are only for crippled environments, which opt out
via ``PYOPAL_TPU_NO_BUILD``.
"""

import numpy as np
import pytest

import pyopal_tpu
from pyopal_tpu import Aligner, Database, results
from pyopal_tpu.native import _missing_extensions, ensure_built


def test_extensions_built():
    assert ensure_built(), f"native build failed: {_missing_extensions()}"
    assert _missing_extensions() == []


def test_native_result_types_active():
    assert results.ScoreResult.__module__ == "pyopal_tpu.native._results"
    assert results.EndResult.__module__ == "pyopal_tpu.native._results"
    # the public names re-export the same (native) types
    assert pyopal_tpu.ScoreResult is results.ScoreResult
    assert pyopal_tpu.EndResult is results.EndResult
    # FullResult subclasses the native EndResult
    assert issubclass(pyopal_tpu.FullResult, results.EndResult)


def test_native_encoder_active():
    from pyopal_tpu import alphabet

    assert alphabet._native_encoder is not None


def test_bulk_builders_native_and_consistent():
    scores = np.array([3, 0, -2], dtype=np.int32)
    qe = np.array([1, -1, 5], dtype=np.int32)
    te = np.array([2, -1, 7], dtype=np.int32)
    out = results.build_end_results(10, scores, qe, te)
    assert [r.target_index for r in out] == [10, 11, 12]
    assert [r.score for r in out] == [3, 0, -2]
    assert [r.query_end for r in out] == [1, -1, 5]
    assert [r.target_end for r in out] == [2, -1, 7]
    assert all(type(r) is results.EndResult for r in out)

    out = results.build_score_results(5, scores)
    assert [r.target_index for r in out] == [5, 6, 7]
    assert all(type(r) is results.ScoreResult for r in out)


def test_search_returns_native_objects():
    hits = Aligner().align("ACCTCG", Database(["AACCGCTG"]), mode="end")
    assert type(hits[0]).__module__ == "pyopal_tpu.native._results"
    assert hits[0].score == 47
