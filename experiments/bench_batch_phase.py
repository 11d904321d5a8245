"""Phase breakdown of the 64-query batched score search (bench workload).

Where does the gap between kernel pace (~208 GCUPS) and end-to-end
(~183 GCUPS) go?  Reruns the engine's batched flow with explicit
synchronization between phases: planning/profiles (host), kernel
compute, device assembly, i16 packing, readback, host gather.
Synchronizing each phase inflates the total slightly vs the pipelined
production path; the per-phase terms still rank the levers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

import pyopal_tpu as po
from pyopal_tpu.ops import engine, packing
from pyopal_tpu.ops import pallas_q8 as q8
from pyopal_tpu.utils import cache

cache.enable()


def build_database(rng, n=12071, mean_len=350):
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n).astype(int), 30, 4000
    )
    return [
        letters[rng.integers(0, 20, L)].tobytes().decode("ascii")
        for L in lengths
    ]


def main():
    rng = np.random.default_rng(12071)
    seqs = build_database(rng)
    queries = [q[:256] for q in build_database(rng, n=64, mean_len=256)]
    db = po.Database(seqs)
    al = po.Aligner()
    matrix = al.scoring_matrix.int_data()
    qenc = [
        np.frombuffer(al.alphabet.encode(q), dtype=np.uint8)
        for q in queries
    ]
    go, ge, algorithm = 3, 1, "sw"
    n = len(db)
    cells = 256 * db.total_length * len(queries)

    # warm everything
    engine.search_scores_batch(db, 0, n, qenc, matrix, go, ge, algorithm, False)

    def phase_run():
        t = {}
        t0 = time.perf_counter()
        plans = list(engine.plan_tier_launches(qenc, True))
        t['plan'] = time.perf_counter() - t0

        pack16 = engine._pack16_domain(db, 0, n, qenc, matrix, go, ge)
        launches = []
        t['profiles'] = 0.0
        t['kernel'] = 0.0
        t['assemble'] = 0.0
        t['pack16'] = 0.0
        for tier, lanes_q8, groups, v2_idx in plans:
            if v2_idx:
                from pyopal_tpu.ops import pallas_ragged as pr

                cohort = [qenc[i] for i in v2_idx]
                fp = packing.pack_database_slice_flat(db, 0, n)
                flat_t, lengths, bos, cos, los, inv_pos = (
                    engine._flat_device(fp)
                )
                t0 = time.perf_counter()
                profs, qlens = engine._profiles_for_cohort(cohort, matrix)
                t['profiles'] += time.perf_counter() - t0
                t0 = time.perf_counter()
                s, qe, te = pr.search_flat(
                    profs, qlens, flat_t, lengths, bos, cos, los,
                    go, ge, algorithm, False, chunk=fp.chunk,
                    safe_pad=True,
                )
                s.block_until_ready()
                t['kernel'] += time.perf_counter() - t0
                t0 = time.perf_counter()
                out = engine._assemble_flat(inv_pos, s, qe, te,
                                            with_ends=False)
                out.block_until_ready()
                t['assemble'] += time.perf_counter() - t0
                t0 = time.perf_counter()
                if pack16:
                    out = engine._pack_rows_i16(out)
                    out.block_until_ready()
                t['pack16'] += time.perf_counter() - t0
                launches.append((out, list(v2_idx)))
            if not groups:
                continue
            fpw = packing.pack_database_slice_flat(db, 0, n, lanes=lanes_q8)
            flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fpw)
            for k in range(0, len(groups), engine._Q8_LAUNCH_GROUPS):
                gs = groups[k : k + engine._Q8_LAUNCH_GROUPS]
                t0 = time.perf_counter()
                profs, qv, maxq = engine._profiles_q8(qenc, matrix, gs, lanes_q8)
                t['profiles'] += time.perf_counter() - t0

                t0 = time.perf_counter()
                s, qe, te = q8.search_flat_q8(
                    profs, qv, maxq, flat_t, lengths, bos, cos, los,
                    go, ge, algorithm, False, chunk=fpw.chunk,
                )
                s.block_until_ready()
                t['kernel'] += time.perf_counter() - t0

                t0 = time.perf_counter()
                out = engine._assemble_flat_q8(inv_pos, s, qe, te, with_ends=False)
                out.block_until_ready()
                t['assemble'] += time.perf_counter() - t0

                t0 = time.perf_counter()
                if pack16:
                    out = engine._pack_rows_i16(out)
                    out.block_until_ready()
                t['pack16'] += time.perf_counter() - t0
                launches.append((out, [qi for g in gs for qi in g]))

        t0 = time.perf_counter()
        host_blocks = [np.asarray(dev) for dev, _ in launches]
        t['readback'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        scores = np.zeros((len(qenc), n), dtype=np.int32)
        for (dev, order), hb in zip(launches, host_blocks):
            block = engine._unpack_rows_i16(hb, len(order)) if pack16 else hb
            for pos, qi in enumerate(order):
                if qi >= 0:
                    scores[qi] = block[pos]
        t['gather'] = time.perf_counter() - t0
        return t, scores

    # reference: production path timing
    best_prod = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s_prod, _, _ = engine.search_scores_batch(
            db, 0, n, qenc, matrix, go, ge, algorithm, False
        )
        best_prod = min(best_prod, time.perf_counter() - t0)

    ts, scores = phase_run()
    ts2, _ = phase_run()
    for k in ts:
        ts[k] = min(ts[k], ts2[k])
    assert (scores == s_prod).all()

    total = sum(ts.values())
    print(f"production end-to-end: {best_prod*1e3:8.1f} ms  "
          f"({cells/best_prod/1e9:.1f} GCUPS)")
    print(f"sync-phased total:     {total*1e3:8.1f} ms")
    for k, v in sorted(ts.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v*1e3:8.1f} ms  ({100*v/total:4.1f}%)")


if __name__ == "__main__":
    main()
