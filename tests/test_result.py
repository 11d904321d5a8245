"""Result class tests — mirrors reference ``tests/test_result.py``."""

import pickle

from pyopal_tpu import EndResult, FullResult, ScoreResult


class TestScoreResult:
    def test_init(self):
        r = ScoreResult(10, score=30)
        assert r.score == 30
        assert r.target_index == 10

    def test_repr(self):
        r = ScoreResult(target_index=10, score=30)
        assert repr(r) == "ScoreResult(10, score=30)"

    def test_pickle(self):
        r = pickle.loads(pickle.dumps(ScoreResult(target_index=10, score=30)))
        assert r.score == 30
        assert r.target_index == 10

    def test_eq(self):
        r1 = ScoreResult(target_index=10, score=30)
        r2 = ScoreResult(target_index=10, score=30)
        r3 = ScoreResult(target_index=12, score=50)
        assert r1 == r1
        assert r1 == r2
        assert r1 != r3
        assert r1 != 12


class TestEndResult:
    def test_init(self):
        r = EndResult(2, score=30, query_end=10, target_end=20)
        assert (r.score, r.target_index, r.query_end, r.target_end) == (
            30,
            2,
            10,
            20,
        )

    def test_repr(self):
        r = EndResult(target_index=10, score=30, query_end=10, target_end=20)
        assert (
            repr(r)
            == "EndResult(10, score=30, query_end=10, target_end=20)"
        )

    def test_pickle(self):
        r1 = EndResult(target_index=10, score=30, query_end=10, target_end=20)
        r2 = pickle.loads(pickle.dumps(r1))
        assert r2.score == 30
        assert r2.target_index == 10
        assert r2.query_end == 10
        assert r2.target_end == 20

    def test_eq(self):
        r1 = EndResult(target_index=10, score=30, query_end=10, target_end=20)
        r2 = EndResult(target_index=10, score=30, query_end=10, target_end=20)
        r3 = EndResult(target_index=10, score=35, query_end=20, target_end=60)
        assert r1 == r1
        assert r1 == r2
        assert r1 != r3
        assert r1 != 12


def _full(**kw):
    base = dict(
        target_index=10,
        score=30,
        query_end=10,
        target_end=20,
        query_start=0,
        target_start=10,
        query_length=100,
        target_length=100,
        alignment="M" * 10,
    )
    base.update(kw)
    return FullResult(**base)


class TestFullResult:
    def test_init(self):
        r = _full()
        assert r.score == 30
        assert r.target_index == 10
        assert r.query_end == 10
        assert r.target_end == 20
        assert r.query_start == 0
        assert r.target_start == 10
        assert r.query_length == 100
        assert r.target_length == 100
        assert r.alignment == "M" * 10

    def test_pickle(self):
        r = pickle.loads(pickle.dumps(_full()))
        assert r.score == 30
        assert r.alignment == "M" * 10
        assert r.target_length == 100

    def test_eq(self):
        assert _full() == _full()
        assert _full() != _full(target_index=2, score=48)
        assert _full() != 12

    def test_cigar(self):
        r = _full(alignment="IMMMXMIM")
        assert r.cigar() == "1D5M1D1M"
        assert _full(alignment="M" * 4).cigar() == "4M"
        assert _full(alignment="MMXDDM").cigar() == "3M2I1M"

    def test_identity(self):
        assert _full(alignment="MMXM").identity() == 0.75
        assert _full(alignment="MMDDM").identity() == 1.0

    def test_coverage(self):
        import pytest

        r = _full(alignment="MMMM")
        with pytest.raises(ValueError):
            r.coverage("nonsense")


def test_identity_gap_only_alignment_is_nan_without_warning():
    import math
    import warnings

    from pyopal_tpu.results import FullResult

    r = FullResult(0, 0, -1, -1, 0, 0, 2, 2, "DDII")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert math.isnan(r.identity())
