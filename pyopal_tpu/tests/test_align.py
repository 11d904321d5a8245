"""In-wheel `pyopal_tpu.align` front-end tests.

Mirrors the reference's threaded front-end contract
(``/root/reference/src/pyopal/tests/test_align.py``): the chunked
multi-worker path must be result-identical to the single-worker path,
with the reference's golden scores.
"""

import unittest

import pyopal_tpu


class TestAlign(unittest.TestCase):
    QUERY = "ACCTCG"
    TARGETS = ["AACCGCTG", "AACCGCTA", "AACCGCTC", "AACCGCTT"]

    def _golden(self, threads):
        results = list(
            pyopal_tpu.align(
                self.QUERY,
                self.TARGETS,
                threads=threads,
                mode="full",
                algorithm="nw",
                ordered=True,
            )
        )
        first = results[0]
        self.assertEqual(first.target_index, 0)
        self.assertEqual(first.score, 44)
        self.assertEqual((first.query_end, first.target_end), (5, 7))
        self.assertEqual((first.query_start, first.target_start), (0, 0))

    def test_threads_1(self):
        self._golden(threads=1)

    def test_threads_2(self):
        self._golden(threads=2)

    def test_doctest_scores(self):
        targets = ["AACCGCTG", "ATGCGCT", "TTATTACG"]
        scores = [
            res.score
            for res in pyopal_tpu.align(
                "ACCTG", targets, gap_open=2, ordered=True
            )
        ]
        self.assertEqual(scores, [41, 31, 23])
