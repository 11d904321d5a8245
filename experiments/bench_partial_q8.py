"""A/B: partial-q8-group leftover routing vs v2 leftover launches.

In-process alternation (the tunnel drifts >10% across processes):
_Q8_PARTIAL_MIN = 6 (new) vs 99 (old: leftovers always v2) on the
bench workload.  Both variants are warmed before timing.
"""

import time

import numpy as np


def main():
    from pyopal_tpu.utils import cache

    cache.enable()
    import pyopal_tpu as po
    from pyopal_tpu.ops import engine

    import bench

    rng = np.random.default_rng(12071)
    seqs = bench.build_database(rng)
    queries = [
        q[:256] for q in bench.build_database(rng, n=64, mean_len=256)
    ]
    db = po.Database(seqs)
    al = po.Aligner()

    # leftover mix per tier
    enc = [
        np.frombuffer(db.alphabet.encode(q), np.uint8) for q in queries
    ]
    for tier, lanes, groups, v2 in engine.plan_tier_launches(enc, True):
        print(
            f"tier {tier}: {len(groups)} q8 groups "
            f"(last {len(groups[-1]) if groups else 0}), {len(v2)} v2"
        )

    def run_arrays():
        al.align_arrays(queries, db, mode="score", algorithm="sw")

    def timed():
        t0 = time.perf_counter()
        run_arrays()
        return time.perf_counter() - t0

    # warm both variants
    for pm in (6, 99):
        engine._Q8_PARTIAL_MIN = pm
        run_arrays()

    res = {6: [], 99: []}
    for _ in range(5):
        for pm in (6, 99):
            engine._Q8_PARTIAL_MIN = pm
            res[pm].append(timed())
    for pm in (6, 99):
        ts = sorted(res[pm])
        med = ts[len(ts) // 2]
        cells = 64 * 256 * db.total_length
        print(
            f"PARTIAL_MIN={pm}: median {med*1e3:.1f} ms "
            f"({cells/med/1e9:.1f} GCUPS)  trials={[f'{t*1e3:.0f}' for t in ts]}"
        )


if __name__ == "__main__":
    main()
