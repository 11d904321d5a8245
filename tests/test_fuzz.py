"""Seeded property fuzz: engine dispatch vs the scalar oracle.

Random (alphabet, matrix, gap, algorithm, mode, length-mix) configs
through the PUBLIC API, each cross-checked against the scalar oracle.
Deterministic seeds — failures reproduce exactly.  This sweeps corners
the targeted suites parameterize individually: tiny alphabets, zero
gaps, ge > go, matrices near the bf16-profile magnitude boundary,
empty/1-residue targets, and databases straddling block boundaries.
"""

import random

import numpy as np
import pytest

import pyopal_tpu as po
from pyopal_tpu.ops import naive


def _case(seed):
    rng = random.Random(seed)
    nrg = np.random.default_rng(seed)
    asize = rng.choice([2, 4, 20, 24, 27])
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ*"[:asize]
    # symmetric integer matrix; occasionally large magnitudes (still
    # within the bf16-exact profile window |s| <= 256)
    hi = rng.choice([5, 17, 250])
    m = nrg.integers(-hi, hi + 1, (asize, asize))
    m = ((m + m.T) // 2).astype(np.float32)
    matrix = po.ScoringMatrix(m, letters)
    go = rng.choice([0, 1, 3, 11])
    ge = rng.choice([0, 1, 2, 7])
    algo = rng.choice(["nw", "hw", "ov", "sw"])
    mode = rng.choice(["score", "end"])
    n = rng.randint(1, 40)
    lens = [rng.choice([0, 1, 2, 17, 63, 64, 65, 130]) for _ in range(n)]
    targets = [
        "".join(rng.choices(letters[: max(asize - 1, 1)], k=k))
        for k in lens
    ]
    qlen = rng.choice([1, 5, 33, 64, 100])
    query = "".join(rng.choices(letters[: max(asize - 1, 1)], k=qlen))
    return matrix, go, ge, algo, mode, targets, query


@pytest.mark.parametrize("seed", range(32))
def test_engine_matches_oracle_random_config(seed):
    matrix, go, ge, algo, mode, targets, query = _case(seed)
    db = po.Database(targets, alphabet=matrix.alphabet)
    aligner = po.Aligner(matrix, gap_open=go, gap_extend=ge)
    results = aligner.align(query, db, mode=mode, algorithm=algo)
    assert len(results) == len(targets)

    S = matrix.int_data()
    enc = lambda s: np.frombuffer(
        db.alphabet.encode(s), dtype=np.uint8
    )
    q = enc(query)
    for i, t in enumerate(targets):
        ns, nqe, nte = naive.score_end(q, enc(t), S, go, ge, algo)
        assert results[i].score == ns, (seed, i, results[i].score, ns)
        if mode == "end" and len(t):
            assert (results[i].query_end, results[i].target_end) == (
                nqe,
                nte,
            ), (seed, i)


def _score_from_ops(q, t, qs, ts, ops, S, go, ge, algo):
    """Independent rescoring of a traceback path: substitution scores
    for M/X, gap costs over maximal D/I runs.  An interior gap run of
    length N costs ``go + (N-1)*min(go, ge)`` (the DP can re-open
    from the gap cell itself when go < ge); a LEADING run lying on a
    penalized init boundary costs the closed-form ``go + (N-1)*ge``
    (there is no cell to re-open from outside the matrix).  Validates
    that the reported score, coordinates and op string are mutually
    consistent (the engine's kernel-vs-traceback cross-check cannot
    catch a path that is internally wrong but ends at the right
    cell)."""
    score = 0
    qi, ti = qs, ts
    prev = -1
    k = 0
    # leading boundary run: D ops in DP column 0 (nw/hw penalize the
    # first column), or I ops in DP row 0 (nw penalizes the first row)
    if len(ops) and ops[0] == 1 and ts == 0 and algo in ("nw", "hw"):
        while k < len(ops) and ops[k] == 1:
            k += 1
        score -= go + (k - 1) * ge
        qi += k
        prev = 1
    elif len(ops) and ops[0] == 2 and qs == 0 and algo == "nw":
        while k < len(ops) and ops[k] == 2:
            k += 1
        score -= go + (k - 1) * ge
        ti += k
        prev = 2
    for op in ops[k:]:
        op = int(op)
        if op in (0, 3):  # match / mismatch
            score += int(S[q[qi], t[ti]])
            qi += 1
            ti += 1
        else:
            score -= go if prev != op else min(go, ge)
            if op == 1:
                qi += 1
            else:
                ti += 1
        prev = op
    return score


@pytest.mark.parametrize("seed", range(100, 112))
def test_batched_full_mode_matches_oracle_random_config(seed):
    """Seeded fuzz for the batched full-mode front-ends: align_batch
    full == per-pair oracle traceback scores/coords, and the columnar
    align_arrays full agrees with the objects."""
    matrix, go, ge, algo, _, targets, query = _case(seed)
    rng = random.Random(seed ^ 0xF00)
    queries = [query] + [
        "".join(
            rng.choices(matrix.alphabet[: max(len(matrix.alphabet) - 1, 1)],
                        k=rng.choice([1, 7, 40])),
        )
        for _ in range(2)
    ]
    db = po.Database(targets, alphabet=matrix.alphabet)
    aligner = po.Aligner(matrix, gap_open=go, gap_extend=ge)
    batch = aligner.align_batch(queries, db, mode="full", algorithm=algo)
    arrays = aligner.align_arrays(queries, db, mode="full", algorithm=algo)

    S = matrix.int_data()
    enc = lambda s: np.frombuffer(db.alphabet.encode(s), dtype=np.uint8)
    for qi, qq in enumerate(queries):
        q = enc(qq)
        for ti, t in enumerate(targets):
            ws, wqs, wts, wqe, wte, wops = naive.traceback(
                q, enc(t), S, go, ge, algo
            )
            hit = batch[qi][ti]
            assert hit.score == ws, (seed, qi, ti)
            assert (hit._query_start, hit._target_start) == (wqs, wts)
            assert (hit.query_end, hit.target_end) == (wqe, wte)
            assert np.array_equal(hit._ops, wops), (seed, qi, ti)
            if len(wops) or algo == "sw":
                assert ws == _score_from_ops(
                    q, enc(t), wqs, wts, wops, S, go, ge, algo
                ), (seed, qi, ti)
            assert arrays["scores"][qi, ti] == ws
            assert arrays["query_starts"][qi, ti] == wqs
            assert arrays["target_starts"][qi, ti] == wts
            assert arrays["cigars"][qi, ti] == hit.cigar()
