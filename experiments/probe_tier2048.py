"""Compile-probe the 2048 query tier (bestvec + capped unroll) on TPU."""
import numpy as np
import pyopal_tpu as po
from pyopal_tpu.matrices import ScoringMatrix
from pyopal_tpu.ops import naive

rng = np.random.default_rng(11)
letters = "ARNDCQEGHILKMFPSTWYV"
rs = lambda n: "".join(letters[i] for i in rng.integers(0, 20, n))
q = rs(1500)  # tier 2048
db = po.Database([rs(400), rs(1200), ""])
al = po.Aligner()
res = al.align(q, db, mode="score", algorithm="sw")
S = ScoringMatrix.from_name("BLOSUM50").int_data()
enc = lambda s: np.array([("ARNDCQEGHILKMFPSTWYVBZX*").index(c) for c in s], np.uint8)
for i in range(3):
    ns, _, _ = naive.score_end(enc(q), enc(db[i]), S, 3, 1, "sw")
    assert res[i].score == ns, (i, res[i].score, ns)
res_e = al.align(q, db, mode="end", algorithm="sw")
for i in range(3):
    ns, nqe, nte = naive.score_end(enc(q), enc(db[i]), S, 3, 1, "sw")
    assert res_e[i].score == ns
    if len(db[i]):
        assert (res_e[i].query_end, res_e[i].target_end) == (nqe, nte)
print("TIER2048 OK")
