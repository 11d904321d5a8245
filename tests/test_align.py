"""Threaded front-end tests — mirrors reference ``tests/test_align.py``."""

import pyopal_tpu


class TestAlignThreads:
    def test_test1(self):
        query = "ACCTCG"
        target = ["AACCGCTG", "AACCGCTA", "AACCGCTC", "AACCGCTT"]
        results = list(
            pyopal_tpu.align(
                query, target, threads=1, mode="full", algorithm="nw", ordered=True
            )
        )
        assert results[0].target_index == 0
        assert results[0].target_start == 0
        assert results[0].target_end == 7
        assert results[0].query_start == 0
        assert results[0].query_end == 5
        assert results[0].score == 44

    def test_2(self):
        query = "ACCTCG"
        target = ["AACCGCTG", "AACCGCTA", "AACCGCTC", "AACCGCTT"]
        results = list(
            pyopal_tpu.align(
                query, target, threads=2, mode="full", algorithm="nw", ordered=True
            )
        )
        assert results[0].target_index == 0
        assert results[0].target_start == 0
        assert results[0].target_end == 7
        assert results[0].query_start == 0
        assert results[0].query_end == 5
        assert results[0].score == 44

    def test_thread_count_invariance(self):
        query = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"
        import random

        r = random.Random(1)
        targets = [
            "".join(r.choices("ARNDCQEGHILKMFPSTWYV", k=r.randint(5, 80)))
            for _ in range(57)
        ]
        base = sorted(
            (res.target_index, res.score)
            for res in pyopal_tpu.align(query, targets, threads=1)
        )
        for threads in (0, 2, 3, 8):
            got = sorted(
                (res.target_index, res.score)
                for res in pyopal_tpu.align(query, targets, threads=threads)
            )
            assert got == base, f"threads={threads} changed results"

    def test_doctest_scores(self):
        targets = ["AACCGCTG", "ATGCGCT", "TTATTACG"]
        scores = [
            res.score
            for res in pyopal_tpu.align(
                "ACCTG", targets, gap_open=2, ordered=True
            )
        ]
        assert scores == [41, 31, 23]

    def test_matrix_by_name_and_errors(self):
        import pytest

        targets = ["AACCGCTG"]
        res = list(pyopal_tpu.align("ACCTCG", targets, "BLOSUM62"))
        assert len(res) == 1
        with pytest.raises(TypeError):
            list(pyopal_tpu.align("ACCTCG", targets, 42))
