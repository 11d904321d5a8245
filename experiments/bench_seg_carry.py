"""Measure the segmented long-query kernel (post carry refactor).

5000-aa query (score + end modes take the segmented path beyond the
strip/ragged tiers) vs the bench database; compare GCUPS with the
round-3 figure (~80.7 score) recorded in DEVNOTES.
"""

import time

import numpy as np


def main():
    from pyopal_tpu.utils import cache

    cache.enable()
    import pyopal_tpu as po
    import bench

    rng = np.random.default_rng(12071)
    seqs = bench.build_database(rng, n=4000)
    db = po.Database(seqs)
    al = po.Aligner()
    letters = "ARNDCQEGHILKMFPSTWYV"
    q = "".join(letters[c] for c in rng.integers(0, 20, 5000))
    cells = len(q) * db.total_length

    for mode in ("score", "end"):
        al.align(q, db, mode=mode, algorithm="sw")  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            al.align(q, db, mode=mode, algorithm="sw")
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[1]
        print(
            f"sw {mode} 5000aa: {med*1e3:.0f} ms, "
            f"{cells/med/1e9:.1f} GCUPS  {[f'{t*1e3:.0f}' for t in ts]}"
        )


if __name__ == "__main__":
    main()
