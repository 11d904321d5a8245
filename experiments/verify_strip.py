"""Validate the strip-blocked bestvec path in the production kernel.

Runs SW score-only searches with query tiers 512/1024/2048 (strip
kernel) on a mixed-length DB and cross-checks scores against (a) the
numpy oracle and (b) the full-scan kernel (safe_pad=False forces the
non-strip variant at the same tier).  Also times both in-process.
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
    rng = np.random.default_rng(7)
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)

    def mk(L):
        return letters[rng.integers(0, 20, L)].tobytes().decode()

    # mixed DB: boundary lengths around the 64-col quantum + spread
    seqs = [mk(L) for L in (1, 30, 63, 64, 65, 127, 128, 129, 350, 800,
                            2000, 40, 90, 500, 256, 77)]
    db = po.Database(seqs)
    matrix = po.ScoringMatrix.from_name("BLOSUM50").int_data()

    fp = packing.pack_database_slice_flat(db, 0, len(db))
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fp)

    ok = True
    for Q in (300, 600, 1500, 2048):
        q_enc = np.frombuffer(db.alphabet.encode(mk(Q)), dtype=np.uint8)
        profs, qlens = engine._profiles_for_cohort([q_enc], matrix)
        tier = pr.profile_qpad(Q)
        want_strip = tier >= pr.STRIP_MIN_QPAD

        s_strip = np.asarray(
            pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                3, 1, "sw", False, chunk=fp.chunk, safe_pad=True,
            )[0]
        )
        s_full = np.asarray(
            pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                3, 1, "sw", False, chunk=fp.chunk, safe_pad=False,
            )[0]
        )
        # oracle on each target
        got = engine._assemble_flat(
            inv_pos, *[np.asarray(x) for x in (s_strip, s_strip, s_strip)],
            with_ends=False,
        )
        got = np.asarray(got)[0]
        ora = np.array(
            [
                naive.score_end(q_enc, np.frombuffer(
                    db.alphabet.encode(t), dtype=np.uint8
                ), matrix, 3, 1, "sw")[0]
                for t in seqs
            ],
            dtype=np.int32,
        )
        m1 = "ok" if np.array_equal(got, ora) else "ORACLE-MISMATCH"
        m2 = (
            "ok"
            if np.array_equal(s_strip, s_full)
            else "FULL-KERNEL-MISMATCH"
        )
        ok &= m1 == "ok" and m2 == "ok"
        print(f"Q={Q} tier={tier} strip={want_strip}: oracle {m1}, "
              f"full-kernel {m2}", flush=True)

    # in-process timing at a bigger workload, tier 1024
    big = [mk(int(L)) for L in np.clip(
        rng.lognormal(np.log(350), 0.45, 4000), 30, 4000)]
    bdb = po.Database(big)
    bfp = packing.pack_database_slice_flat(bdb, 0, len(bdb))
    bflat, blen, bbos, bcos, blos, binv = engine._flat_device(bfp)
    q_enc = np.frombuffer(db.alphabet.encode(mk(1000)), dtype=np.uint8)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)
    cells = 1000 * sum(len(s) for s in big)

    def run(safe_pad):
        return pr.search_flat(
            profs, qlens, bflat, blen, bbos, bcos, blos,
            3, 1, "sw", False, chunk=bfp.chunk, safe_pad=safe_pad,
        )

    for name, sp in (("strip", True), ("full ", False)):
        out = np.asarray(run(sp)[0])  # warm
        K = 8
        t0 = time.perf_counter()
        _ = np.asarray(run(sp)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(sp)
        _ = np.asarray(r[0])
        tK = time.perf_counter() - t0
        marg = (tK - t1) / (K - 1)
        print(f"{name} Q=1000 tier1024: {marg*1e3:7.2f} ms "
              f"{cells/marg/1e9:6.1f} GCUPS", flush=True)

    print("STRIP VALIDATION " + ("PASSED" if ok else "FAILED"))


if __name__ == "__main__":
    main()
