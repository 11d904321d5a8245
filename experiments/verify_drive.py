"""Drive the public API on the real TPU after the kernel rewrite."""

import numpy as np

import pyopal_tpu as po
from pyopal_tpu.matrices import ScoringMatrix
from pyopal_tpu.ops import naive
import jax

print("backend:", jax.default_backend())

# 1. golden answers (reference test_aligner.py pins) through pyopal_tpu.align
hits = list(po.align("ACCTCG", ["AACCGCTG"], algorithm="nw", mode="full"))
r = hits[0]
print("NW:", r.score, (r.query_end, r.target_end), (r.query_start, r.target_start),
      r.cigar(), r.coverage("query"), r.coverage("target"))
assert r.score == 44 and (r.query_end, r.target_end) == (5, 7)
assert (r.query_start, r.target_start) == (0, 0)

hits = list(po.align("ACCTCG", ["AACCGCTG"], algorithm="sw", mode="full"))
r = hits[0]
print("SW:", r.score, (r.query_end, r.target_end), r.target_start)
assert r.score == 47 and (r.query_end, r.target_end) == (5, 7) and r.target_start == 1

# 2. score mode (bestvec path) on a mixed DB incl. empty + chunk-boundary seq
rng = np.random.default_rng(5)
letters = "ARNDCQEGHILKMFPSTWYV"
def rand_seq(n):
    return "".join(letters[i] for i in rng.integers(0, 20, n))

db_seqs = [rand_seq(n) for n in (3, 64, 65, 127, 128, 129, 200)] + ["", rand_seq(50)]
query = rand_seq(40)
S = ScoringMatrix.from_name("BLOSUM50")
alpha = S.alphabet
enc_q = np.frombuffer(query.encode(), np.uint8)
al = po.Aligner()
db = po.Database(db_seqs)

res_score = al.align(query, db, mode="score", algorithm="sw")
res_end = al.align(query, db, mode="end", algorithm="sw")
Sint = S.int_data()
qe_ = np.array([alpha.index(c) if hasattr(alpha, "index") else 0 for c in query])
enc = lambda s: np.array([("ARNDCQEGHILKMFPSTWYVBZX*").index(c) for c in s], np.uint8)
ok = True
for i, t in enumerate(db_seqs):
    ns, nqe, nte = naive.score_end(enc(query), enc(t), Sint, 3, 1, "sw")
    assert res_score[i].score == ns, (i, res_score[i].score, ns)
    assert res_end[i].score == ns
    if t:
        assert (res_end[i].query_end, res_end[i].target_end) == (nqe, nte), i
print("mixed DB (incl empty/boundary lengths): scores+ends == oracle for", len(db_seqs), "targets")

# 3. probe: ge > go (gmin = go branch of the folded scan)
al2 = po.Aligner(gap_open=1, gap_extend=3)
res2 = al2.align(query, db, mode="score", algorithm="sw")
for i, t in enumerate(db_seqs):
    ns, _, _ = naive.score_end(enc(query), enc(t), Sint, 1, 3, "sw")
    assert res2[i].score == ns, (i, res2[i].score, ns)
print("ge>go gap params: scores == oracle")

# 4. probe: huge-score pair (H >> |PAD_SCORE| would break a naive pad argument)
big = rand_seq(2500)
db_big = po.Database([big, rand_seq(100)])
res_big = al.align(big, db_big, mode="score", algorithm="sw")
ns, _, _ = naive.score_end(enc(big), enc(big), Sint, 3, 1, "sw")
print("huge self-hit score:", res_big[0].score, "oracle:", ns)
assert res_big[0].score == ns and ns > 12000
ns2, _, _ = naive.score_end(enc(big), enc(db_big[1]), Sint, 3, 1, "sw")
assert res_big[1].score == ns2

# 5. batch >= 8: drives the query-packed q8 kernel (full groups) plus
# the v2 remainder through Aligner.align_batch, all modes x algorithms
queries9 = [rand_seq(n) for n in (40, 33, 45, 29, 51, 38, 36, 47, 31)]
for algo in ("sw", "nw", "hw", "ov"):
    batch = al.align_batch(queries9, db, mode="end", algorithm=algo)
    for qi, q in enumerate(queries9):
        for ti, t in enumerate(db_seqs):
            ns, nqe, nte = naive.score_end(enc(q), enc(t), Sint, 3, 1, algo)
            r = batch[qi][ti]
            assert r.score == ns, (algo, qi, ti, r.score, ns)
            if t:
                assert (r.query_end, r.target_end) == (nqe, nte), (algo, qi, ti)
print("batched q8 path (9 queries, 4 algorithms): scores+ends == oracle")

# 6. seeded random-contents sweep at FIXED shapes: every trial reuses
# the compiled shapes above (same query-length multiset, same DB
# length multiset, gap 3/1) while the matrix entries and every residue
# are re-randomized — hardware-exactness evidence the interpret-mode
# CPU fuzz (tests/test_fuzz.py) cannot give, at zero extra compiles.
alphabet = "ARNDCQEGHILKMFPSTWYVBZX*"
for trial in range(6):
    tr = np.random.default_rng(1000 + trial)
    M = tr.integers(-8, 13, (24, 24))
    M = np.tril(M) + np.tril(M, -1).T  # symmetric, int
    mat = ScoringMatrix(M.astype(np.float32), alphabet)
    alx = po.Aligner(mat)
    t_seqs = [
        "".join(letters[i] for i in tr.integers(0, 20, len(s)))
        for s in db_seqs
    ]
    t_qs = [
        "".join(letters[i] for i in tr.integers(0, 20, len(q)))
        for q in queries9
    ]
    t_db = po.Database(t_seqs)
    Mint = mat.int_data()
    algo = ("sw", "nw", "hw", "ov")[trial % 4]
    batch = alx.align_batch(t_qs, t_db, mode="end", algorithm=algo)
    for qi, q in enumerate(t_qs):
        for ti, t in enumerate(t_seqs):
            ns, nqe, nte = naive.score_end(enc(q), enc(t), Mint, 3, 1, algo)
            r = batch[qi][ti]
            assert r.score == ns, (trial, algo, qi, ti, r.score, ns)
            if t:
                assert (r.query_end, r.target_end) == (nqe, nte), (
                    trial, algo, qi, ti,
                )
print("random-matrix sweep (6 seeded trials, fixed shapes): == oracle")
print("ALL DRIVES PASSED")
