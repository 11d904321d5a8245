"""Validate + time the 4096-tier strip path (sw score-only).

A 3000-aa query used to fall to the segmented long-query kernel; with
the strip-blocked bestvec kernel the ragged path now takes it.  Checks
scores against the oracle via the top-level API and times both kernels.
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pyopal_tpu.utils import cache

cache.enable()

import pyopal_tpu as po  # noqa: E402
from pyopal_tpu.ops import engine, naive, packing  # noqa: E402
from pyopal_tpu.ops import pallas_ragged as pr  # noqa: E402


def main():
    rng = np.random.default_rng(11)
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)

    def mk(L):
        return letters[rng.integers(0, 20, L)].tobytes().decode()

    seqs = [mk(L) for L in (30, 64, 200, 800, 2500, 120, 65, 400)]
    db = po.Database(seqs)
    matrix = po.ScoringMatrix.from_name("BLOSUM50").int_data()
    query = mk(3000)
    q_enc = np.frombuffer(db.alphabet.encode(query), dtype=np.uint8)

    assert pr.supports(3000, "sw", False, True)
    assert not pr.supports(3000, "sw", True, True)
    assert not pr.supports(3000, "nw", False, True)
    assert not pr.supports(5000, "sw", False, True)

    aligner = po.Aligner()
    res = aligner.align(query, db, mode="score", algorithm="sw")
    got = np.array([r.score for r in res], dtype=np.int64)
    ora = np.array(
        [
            naive.score_end(
                q_enc,
                np.frombuffer(db.alphabet.encode(t), dtype=np.uint8),
                matrix, 3, 1, "sw",
            )[0]
            for t in seqs
        ],
        dtype=np.int64,
    )
    m = "ok" if np.array_equal(got, ora) else "MISMATCH"
    print(f"3000-aa query via top API vs oracle: {m}", flush=True)

    # timing: strip (ragged) vs segmented on a bigger DB
    big = [mk(int(L)) for L in np.clip(
        rng.lognormal(np.log(350), 0.45, 3000), 30, 4000)]
    bdb = po.Database(big)
    fp = packing.pack_database_slice_flat(bdb, 0, len(bdb))
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fp)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)
    cells = 3000 * sum(len(s) for s in big)

    def run_strip():
        return pr.search_flat(
            profs, qlens, flat_t, lengths, bos, cos, los,
            3, 1, "sw", False, chunk=fp.chunk, safe_pad=True,
        )

    def run_seg():
        from pyopal_tpu.ops import pallas_ragged_long as prl
        return prl.search_flat_long(
            q_enc, matrix, flat_t, lengths, bos, cos, los,
            3, 1, "sw", False, chunk=fp.chunk,
        )

    # compare real lanes only (padding lanes hold kernel-dependent junk)
    idx = fp.indices.reshape(-1)
    real = idx >= 0
    s_strip = np.asarray(run_strip()[0]).reshape(-1)[real]
    s_seg = np.asarray(run_seg()[0]).reshape(-1)[real]
    m2 = "ok" if np.array_equal(s_strip, s_seg) else "MISMATCH"
    print(f"strip vs segmented on 3000-seq DB: {m2}", flush=True)

    for name, fn in (("strip    ", run_strip), ("segmented", run_seg)):
        K = 6
        t0 = time.perf_counter()
        _ = np.asarray(fn()[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = fn()
        _ = np.asarray(r[0])
        tK = time.perf_counter() - t0
        marg = (tK - t1) / (K - 1)
        print(f"{name} Q=3000: {marg*1e3:8.2f} ms {cells/marg/1e9:6.1f} "
              "GCUPS", flush=True)

    ok = m == "ok" and m2 == "ok"
    print("STRIP-4096 VALIDATION " + ("PASSED" if ok else "FAILED"))


if __name__ == "__main__":
    main()
