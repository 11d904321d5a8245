"""Aligner golden tests — mirrors reference ``tests/test_aligner.py``.

The pinned numbers (NW=44, SW=47, ends/starts/coverage) come from the
reference test suite and are the primary correctness contract
(``/root/reference/src/pyopal/tests/test_aligner.py:38-131``).
"""

import random

import pytest

import pyopal_tpu
from pyopal_tpu import Aligner, Database, ScoringMatrix


class TestAlignerInit:
    # same matrix as the reference's aligner-init tests
    # (/root/reference/src/pyopal/tests/test_aligner.py:10-18)
    def test_init_scoring_matrix_str(self):
        matrix = ScoringMatrix.from_name("VTML80")
        aligner = Aligner("VTML80")
        assert aligner.scoring_matrix == matrix

    def test_init_scoring_matrix_object(self):
        matrix = ScoringMatrix.from_name("VTML80")
        aligner = Aligner(matrix)
        assert aligner.scoring_matrix == matrix

    def test_init_scoring_matrix_error(self):
        with pytest.raises(TypeError):
            Aligner(1)

    def test_init_non_integer_matrix(self):
        m = ScoringMatrix([[1.5, -1.0], [-1.0, 1.5]], "AC")
        with pytest.raises(ValueError):
            Aligner(m)

    def test_pickle_eq(self):
        import pickle

        a = Aligner("BLOSUM62", gap_open=5, gap_extend=2)
        b = pickle.loads(pickle.dumps(a))
        assert a == b


class _TestSearchOverflow:
    """Long-sequence stress envelope (reference lengths 1000..35000).

    The reference exercises the int8->int16->int32 escalation here
    (``/root/reference/src/pyopal/tests/test_aligner.py:24-37``); the
    TPU engines are 32-bit throughout, so this validates long-sequence
    numerical behavior and the long-query fallback path instead.  The
    quick variant samples the envelope; the ``slow``-marked variant is
    the reference's dense sweep (every length, step 1000), crossing the
    2048 -> 4096 strip-kernel tier and the segmented-kernel boundary.
    """

    algorithm = NotImplemented

    @staticmethod
    def _proteins(step):
        r = random.Random(0)
        alphabet = "ACDEFGHIKLMNPQRSTVWY"
        return [
            "".join(r.choices(alphabet, k=k))
            for k in range(1000, 36000, step)
        ]

    def _check(self, proteins, mode="score"):
        database = Database(proteins)
        aligner = Aligner()
        results = aligner.align(
            proteins[0], database, mode=mode, algorithm=self.algorithm
        )
        assert len(results) == len(proteins)
        for res in results:
            assert isinstance(res.score, int)

    def test_overflow(self):
        # the envelope's endpoints only (1000 and 35000): the quick
        # variant checks the long-sequence path is live; the dense
        # slow variant covers every tier crossing in between
        self._check(self._proteins(34000))

    @pytest.mark.slow
    def test_overflow_dense(self):
        self._check(self._proteins(1000))

    @pytest.mark.slow
    def test_overflow_end_mode_tiers(self):
        # end mode has no strip kernel: queries beyond the ragged tier
        # take the segmented long-query path; cross both boundaries
        r = random.Random(1)
        alphabet = "ACDEFGHIKLMNPQRSTVWY"
        proteins = [
            "".join(r.choices(alphabet, k=k))
            for k in (1500, 2047, 2048, 2500, 4096, 5000)
        ]
        self._check(proteins, mode="end")


class TestSearchNW(_TestSearchOverflow):
    algorithm = "nw"

    def test_test1(self):
        # #0: 44 (0, 0) (5, 7)
        # T: AACCGCTG (0 - 7)
        # Q: _ACCTC_G (0 - 5)
        query = "ACCTCG"
        target = "AACCGCTG"
        aligner = Aligner()
        db = Database([target])

        results = aligner.align(query, db, algorithm=self.algorithm)
        assert len(db) == 1
        assert isinstance(results[0], pyopal_tpu.ScoreResult)
        assert results[0].score == 44

        results = aligner.align(query, db, algorithm=self.algorithm, mode="score")
        assert isinstance(results[0], pyopal_tpu.ScoreResult)
        assert results[0].score == 44

        results = aligner.align(query, db, algorithm=self.algorithm, mode="end")
        assert isinstance(results[0], pyopal_tpu.EndResult)
        assert results[0].score == 44
        assert results[0].query_end == 5
        assert results[0].target_end == 7

        results = aligner.align(query, db, algorithm=self.algorithm, mode="full")
        assert isinstance(results[0], pyopal_tpu.FullResult)
        assert results[0].score == 44
        assert results[0].alignment is not None
        assert results[0].query_start == 0
        assert results[0].query_end == 5
        assert results[0].target_start == 0
        assert results[0].target_end == 7
        assert results[0].coverage("query") == 1
        assert results[0].coverage("target") == 7 / 8
        assert results[0].cigar() == "1D5M1D1M"


class TestSearchOV(_TestSearchOverflow):
    algorithm = "ov"


class TestSearchHW(_TestSearchOverflow):
    algorithm = "hw"


class TestSearchSW(_TestSearchOverflow):
    algorithm = "sw"

    def test_test1(self):
        # #0: 47 (0, 1) (5, 7)
        # T: ACCGCTG (1 - 7)
        # Q: ACCTC_G (0 - 5)
        query = "ACCTCG"
        target = "AACCGCTG"
        aligner = Aligner()
        db = Database([target])

        results = aligner.align(query, db, algorithm=self.algorithm)
        assert isinstance(results[0], pyopal_tpu.ScoreResult)
        assert results[0].score == 47

        results = aligner.align(query, db, algorithm=self.algorithm, mode="end")
        assert isinstance(results[0], pyopal_tpu.EndResult)
        assert results[0].score == 47
        assert results[0].query_end == 5
        assert results[0].target_end == 7

        results = aligner.align(query, db, algorithm=self.algorithm, mode="full")
        assert isinstance(results[0], pyopal_tpu.FullResult)
        assert results[0].score == 47
        assert results[0].alignment is not None
        assert results[0].query_start == 0
        assert results[0].query_end == 5
        assert results[0].target_start == 1
        assert results[0].target_end == 7
        assert results[0].coverage("query") == pytest.approx(1)
        assert results[0].coverage("target") == pytest.approx(7 / 8)


class TestEmptyAlignment:
    """Empty-alignment contract: a local (sw) search where no cell ever
    scores above zero reports score 0 and ``-1`` end sentinels (the
    convention of the reference's ``opalInitSearchResult``,
    ``/root/reference/src/pyopal/opal.pxd:36-38``), through every API
    surface.  Regression test for the round-1 sentinel assert crash.
    """

    # BLOSUM50: A vs D scores -2, so "A" vs all-D targets peaks at 0
    QUERY = "A"
    TARGETS = ["DDDDD", "AAAA"]

    def test_align_end_mode(self):
        hits = Aligner().align(
            self.QUERY, Database(self.TARGETS), mode="end", algorithm="sw"
        )
        assert hits[0].score == 0
        assert hits[0].query_end == -1
        assert hits[0].target_end == -1
        # the non-empty hit in the same batch keeps real coordinates
        assert hits[1].score == 5
        assert hits[1].query_end == 0
        assert hits[1].target_end == 0

    def test_align_full_mode(self):
        hits = Aligner().align(
            self.QUERY, Database(self.TARGETS), mode="full", algorithm="sw"
        )
        empty = hits[0]
        assert empty.score == 0
        assert empty.query_end == -1
        assert empty.target_end == -1
        assert empty.alignment == ""
        assert empty.cigar() is None
        assert empty.coverage("query") == 0.0
        assert empty.coverage("target") == 0.0

    def test_align_batch(self):
        batches = Aligner().align_batch(
            [self.QUERY], Database(self.TARGETS), mode="end", algorithm="sw"
        )
        assert batches[0][0].score == 0
        assert batches[0][0].query_end == -1
        assert batches[0][0].target_end == -1

    def test_align_arrays(self):
        arrays = Aligner().align_arrays(
            [self.QUERY], Database(self.TARGETS), mode="end", algorithm="sw"
        )
        assert arrays["scores"][0, 0] == 0
        assert arrays["query_ends"][0, 0] == -1
        assert arrays["target_ends"][0, 0] == -1

    def test_align_generator(self):
        hits = list(
            pyopal_tpu.align(
                self.QUERY,
                self.TARGETS,
                mode="end",
                algorithm="sw",
                ordered=True,
            )
        )
        assert hits[0].score == 0
        assert hits[0].query_end == -1
        assert hits[0].target_end == -1

    def test_pickle_roundtrip(self):
        import pickle

        hit = Aligner().align(
            self.QUERY, Database(self.TARGETS), mode="end", algorithm="sw"
        )[0]
        clone = pickle.loads(pickle.dumps(hit))
        assert clone == hit
        assert clone.query_end == -1


class TestAlignErrors:
    def test_invalid_mode(self):
        with pytest.raises(ValueError):
            Aligner().align("A", Database(["A"]), mode="nonsense")

    def test_invalid_overflow(self):
        with pytest.raises(ValueError):
            Aligner().align("A", Database(["A"]), overflow="nonsense")

    def test_invalid_algorithm(self):
        with pytest.raises(ValueError):
            Aligner().align("A", Database(["A"]), algorithm="nonsense")

    def test_alphabet_mismatch(self):
        db = Database(["ATGC"], alphabet="ATGC")
        with pytest.raises(ValueError):
            Aligner().align("ATGC", db)

    def test_slice_end_lower_than_start(self):
        db = Database(["AAAA", "CCCC"])
        with pytest.raises(IndexError):
            Aligner().align("AAAA", db, start=1, end=0)

    def test_empty_database(self):
        assert Aligner().align("AAAA", Database([])) == []

    def test_slice(self):
        db = Database(["AAAA", "CCCC", "AAAA"])
        results = Aligner().align("AAAA", db, start=1)
        assert [r.target_index for r in results] == [1, 2]
        results = Aligner().align("AAAA", db, start=1, end=2)
        assert [r.target_index for r in results] == [1]


class TestAlignEdges:
    """Slice/empty-input edge semantics (SURVEY §7 "hard parts").

    The reference clamps ``end`` to the database size and hands the
    (possibly degenerate) slice to the kernel
    (``/root/reference/src/pyopal/lib.pyx:1365-1370``); a ``start``
    beyond the clamped end yields an empty hit list rather than an
    error (only an *explicit* ``end < start`` raises ``IndexError``).
    """

    def test_start_beyond_clamped_end(self):
        db = Database(["AAAA", "CCCC"])
        # end=UINT32_MAX clamps to 2; start=5 > 2 -> empty, no error
        assert Aligner().align("AAAA", db, start=5) == []
        assert Aligner().align("AAAA", db, start=2) == []

    def test_start_beyond_clamped_end_all_modes(self):
        db = Database(["AAAA"])
        aligner = Aligner()
        for mode in ("score", "end", "full"):
            assert aligner.align("AAAA", db, start=3, mode=mode) == []
        assert aligner.align_top_k("AAAA", db, start=3) == []

    @pytest.mark.parametrize("algorithm", ["nw", "hw", "ov", "sw"])
    def test_empty_query_score_end(self, algorithm):
        """An empty query aligns as one gap spanning each target.

        nw charges the full-target gap (``-(go + (T-1) * ge)``); the
        free-end algorithms score 0.  End coordinates follow the
        empty-alignment sentinel contract (query_end = -1).
        """
        db = Database(["AACCGCTG", "A", ""])
        aligner = Aligner()  # BLOSUM50, gap 3/1
        for mode in ("score", "end"):
            hits = aligner.align("", db, mode=mode, algorithm=algorithm)
            assert [h.target_index for h in hits] == [0, 1, 2]
            if algorithm == "nw":
                assert [h.score for h in hits] == [-10, -3, 0]
            else:
                assert [h.score for h in hits] == [0, 0, 0]
            if mode == "end":
                assert all(h.query_end == -1 for h in hits)
                if algorithm == "nw":
                    assert [h.target_end for h in hits] == [7, 0, -1]

    @pytest.mark.parametrize("algorithm", ["nw", "hw", "ov", "sw"])
    def test_empty_query_full_mode(self, algorithm):
        db = Database(["AACCGCTG", "A", ""])
        hits = Aligner().align("", db, mode="full", algorithm=algorithm)
        assert [h.target_index for h in hits] == [0, 1, 2]
        if algorithm == "nw":
            # the whole target is one insertion run
            assert [h.score for h in hits] == [-10, -3, 0]
            assert hits[0].alignment == "IIIIIIII"
            assert hits[0].cigar() == "8D"  # I ops consume the target
        else:
            assert [h.score for h in hits] == [0, 0, 0]
            assert all(h.alignment == "" for h in hits)
        assert all(h.query_length == 0 for h in hits)


class TestSliceValidation:
    """Negative offsets must be rejected, not wrapped Python-style
    (wrapping silently duplicated targets with bogus indices)."""

    def test_negative_start_rejected_everywhere(self):
        import pyopal_tpu as po

        db = po.Database(["AACCGCTG", "ATGCGCT", "TTATTACG"])
        al = po.Aligner()
        with pytest.raises(IndexError):
            al.align("ACCTG", db, start=-2)
        with pytest.raises(IndexError):
            al.align_top_k("ACCTG", db, start=-1)
        with pytest.raises(IndexError):
            al.align_batch(["ACCTG"], db, start=-1)
        with pytest.raises(IndexError):
            al.align_arrays(["ACCTG"], db, start=-1)

    def test_arrays_empty_slice_keeps_end_keys(self):
        import pyopal_tpu as po

        db = po.Database(["AACCGCTG"])
        out = po.Aligner().align_arrays(
            ["ACCTG"], db, mode="end", start=5
        )
        assert out["scores"].shape == (1, 0)
        assert out["query_ends"].shape == (1, 0)
        assert out["target_ends"].shape == (1, 0)

    def test_batch_accepts_iterator_queries(self):
        import pyopal_tpu as po

        db = po.Database(["AACCGCTG", "ATGCGCT"])
        al = po.Aligner()
        want = al.align_batch(["ACCTG", "TTAT"], db)
        got = al.align_batch(iter(["ACCTG", "TTAT"]), db)
        assert [[r.score for r in row] for row in got] == [
            [r.score for r in row] for row in want
        ]
        # empty-slice early return sizes by the materialized queries
        rows = al.align_batch(iter(["ACCTG", "TTAT"]), db, start=2)
        assert rows == [[], []]

    def test_threads_negative_raises(self):
        import pyopal_tpu as po

        with pytest.raises(ValueError):
            list(po.align("ACCTG", ["AACCGCTG"], threads=-1))
