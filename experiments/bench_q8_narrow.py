"""A/B the bf16 narrow q8 pass vs the f32 q8 kernel on the bench mix.

Bench-like workload: lognormal 12k-seq DB, 32 tier-256 queries, sw.
In-process A/B (tunnel drifts across processes — DEVNOTES).  Also
cross-checks narrow results: unflagged == f32, flagged truly >= CAP.

    python experiments/bench_q8_narrow.py [lanes]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyopal_tpu.matrices import ScoringMatrix
    from pyopal_tpu.ops import packing, pallas_q8 as q8

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    S = ScoringMatrix.from_name("BLOSUM50").int_data()
    lens = np.clip(
        rng.lognormal(np.log(350), 0.45, 12071).astype(int), 30, 4000
    )
    # keep within the 256 tier's domain mix like the bench: cap 2000
    lens = np.minimum(lens, 2000)
    seqs = [rng.integers(0, 20, int(L)).astype(np.uint8) for L in lens]
    queries = [rng.integers(0, 20, 256).astype(np.uint8) for _ in range(32)]

    fp = packing.pack_sequences_flat(seqs, lanes=lanes)
    groups = q8.plan_groups([len(q) for q in queries])
    profs, qv, maxq = q8.make_profiles_q8_host(
        queries, S, groups, lanes=lanes
    )
    args = (
        jnp.asarray(profs, jnp.bfloat16),
        jnp.asarray(qv),
        jnp.asarray(maxq),
        jnp.asarray(fp.flat_targets),
        jnp.asarray(fp.lengths),
        jnp.asarray(fp.block_of_step),
        jnp.asarray(fp.chunk_of_step),
        jnp.asarray(fp.last_of_step),
    )
    true_cells = int(sum(lens)) * sum(len(q) for q in queries)

    def run(narrow, with_ends):
        return q8.search_flat_q8(
            *args, 3, 1, "sw", with_ends, chunk=fp.chunk, narrow=narrow
        )

    out = {}
    for narrow in (False, True):
        for with_ends in ((False, True) if not narrow else (False,)):
            s, qe, te = run(narrow, with_ends)
            np.asarray(s)  # warm + sync
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                s, qe, te = run(narrow, with_ends)
            sa = np.asarray(s)
            dt = (time.perf_counter() - t0) / reps
            g = true_cells / dt / 1e9
            mode = "ends " if with_ends else "score"
            name = "bf16" if narrow else "f32 "
            print(f"{name} {mode}: {dt*1e3:7.1f} ms  {g:7.1f} GCUPS")
            out[(narrow, with_ends)] = (sa, np.asarray(qe), np.asarray(te))

    # cross-check: narrow unflagged == f32 bit-exact
    for with_ends in (False,):
        sf, qef, tef = out[(False, with_ends)]
        sn, qen, ten = out[(True, with_ends)]
        flagged = sn >= q8.NARROW_CAP
        assert np.array_equal(sf[~flagged], sn[~flagged]), "score mismatch"
        assert np.all(sf[flagged] >= q8.NARROW_CAP), "unsound flag"
        if with_ends:
            assert np.array_equal(qef[~flagged], qen[~flagged])
            assert np.array_equal(tef[~flagged], ten[~flagged])
        print(
            f"cross-check ends={with_ends}: OK "
            f"({int(flagged.sum())} flagged of {flagged.size})"
        )


if __name__ == "__main__":
    main()
