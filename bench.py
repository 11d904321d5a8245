"""Benchmark: SW score-only database search throughput (GCUPS/chip).

Workload modeled on the reference's canonical database
(``uniprot_sprot12071.fasta``, 12,071 protein sequences,
``/root/reference/README.md:138``): a synthetic Swiss-Prot-scale
database (12,071 sequences, log-normal lengths, mean ~350 aa) searched
with a 256-aa query, BLOSUM50, gap 3/1 — the headline configuration
from BASELINE.md.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.
The reference snapshot publishes no numbers (README benchmarks section
commented out; BASELINE.json ``"published": {}``), so ``vs_baseline``
is computed against a 40 GCUPS proxy — a generous estimate of
multi-core AVX2 Opal/SWIPE throughput from the literature the reference
cites (``README.md:188-189``).
"""

import json
import time

import numpy as np

BASELINE_GCUPS = 40.0  # proxy: multi-core AVX2 Opal-class CPU throughput


def build_database(rng, n=12071, mean_len=350):
    """Synthetic Swiss-Prot-scale protein database."""
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n).astype(int), 30, 4000
    )
    seqs = []
    for L in lengths:
        seqs.append(letters[rng.integers(0, 20, L)].tobytes().decode("ascii"))
    return seqs


def main():
    from pyopal_tpu.utils import cache

    cache.enable()

    import pyopal_tpu as po

    rng = np.random.default_rng(12071)
    seqs = build_database(rng)
    # pipelining depth: the device link costs a fixed ~30-40 ms
    # (dispatch + one readback) per batched call; 64 queries amortize
    # it to <10% of compute (8 full q8 groups, one compiled shape; 128
    # was tried and pushes the whole bench past the driver timeout for
    # a ~1% gain)
    n_queries = 64
    queries = [q[:256] for q in build_database(rng, n=n_queries, mean_len=256)]

    db = po.Database(seqs)
    aligner = po.Aligner()  # BLOSUM50, gap 3/1
    total_residues = db.total_length
    cells_per_query = 256 * total_residues

    # warmup: packs the database, compiles the kernels, uploads to HBM
    # (batch size is a compiled shape — warm with the exact batch)
    res = aligner.align_batch(queries, db, mode="score", algorithm="sw")
    assert len(res) == n_queries and len(res[0]) == len(seqs)
    res1 = aligner.align(queries[0], db, mode="score", algorithm="sw")
    assert len(res1) == len(seqs)

    def timed(fn, trials_n=4):
        trials = []
        for _ in range(trials_n):
            t0 = time.perf_counter()
            fn()
            trials.append(time.perf_counter() - t0)
        # min, not median: the tunneled device link's jitter is strictly
        # additive external noise (relay queueing — DEVNOTES "link
        # drift"), so the fastest complete run is the estimator of the
        # software's pace, exactly as python -m timeit reports.  Every
        # trial is a full end-to-end call.
        return min(trials)

    def timed_one(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # single-query end-to-end latency (includes one host readback RTT)
    dt_single = timed(
        lambda: aligner.align(queries[0], db, mode="score", algorithm="sw")
    )

    # device-side marginal cost of that call (K dispatches, one final
    # readback): the end-to-end figure is floored by the tunneled
    # link's ~28 ms base RTT (experiments/bench_single_phase.py);
    # directly-attached hardware sees roughly this marginal time
    from pyopal_tpu.ops import engine, packing
    from pyopal_tpu.ops import pallas_ragged as pr

    q_enc = np.frombuffer(db.alphabet.encode(queries[0]), dtype=np.uint8)
    matrix = aligner.scoring_matrix.int_data()
    fp = packing.pack_database_slice_flat(db, 0, len(db))
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fp)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)

    def _single_chain(K):
        for _ in range(K):
            s, qe, te = pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                3, 1, "sw", False, chunk=fp.chunk, safe_pad=True,
            )
            out = engine._assemble_flat(inv_pos, s, qe, te, with_ends=False)
        np.asarray(out)

    _single_chain(1)  # warm
    t1 = timed(lambda: _single_chain(1))
    t9 = timed(lambda: _single_chain(9))
    dt_single_dev = (t9 - t1) / 8

    # interactive async stream setup: N sequential align_async
    # submissions resolved together — the surface that amortizes the
    # link RTT an interactive caller would otherwise pay per query
    # (VERDICT round-3 item: N singles at ~amortized batch pace, not
    # N x 38 ms)
    stream_queries = queries[:16]

    def run_stream():
        futs = [
            aligner.align_async(q, db, mode="score", algorithm="sw")
            for q in stream_queries
        ]
        for f in futs:
            f.result()

    run_stream()  # warm the 16-query batch shape

    # batch / stream / arrays phases are INTERLEAVED across rounds, min
    # per phase: the relay's slow patches last longer than back-to-back
    # trials of one phase (a 4-trial min still landed entirely inside a
    # patch — DEVNOTES "link drift"), so each phase must sample the
    # whole bench window
    t_batch, t_stream, t_arrays = [], [], []
    for _ in range(5):
        t_batch.append(
            timed_one(
                lambda: aligner.align_batch(
                    queries, db, mode="score", algorithm="sw"
                )
            )
        )
        t_stream.append(timed_one(run_stream))
        t_arrays.append(
            timed_one(
                lambda: aligner.align_arrays(
                    queries, db, mode="score", algorithm="sw"
                )
            )
        )
    # pipelined throughput: all queries dispatched, one readback
    dt_batch = min(t_batch) / n_queries
    dt_stream = min(t_stream) / len(stream_queries)
    # columnar serving API (no per-hit objects)
    dt_arrays = min(t_arrays) / n_queries

    gcups = cells_per_query / dt_arrays / 1e9
    print(
        json.dumps(
            {
                "metric": "GCUPS/chip (SW score-only, BLOSUM50, 12071-seq DB, 256aa queries, columnar align_arrays API, end-to-end)",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
                "detail": {
                    "arrays_queries_per_s": round(1.0 / dt_arrays, 2),
                    "object_api_gcups": round(
                        cells_per_query / dt_batch / 1e9, 2
                    ),
                    "object_api_queries_per_s": round(1.0 / dt_batch, 2),
                    "single_query_ms": round(dt_single * 1e3, 2),
                    "single_query_gcups": round(
                        cells_per_query / dt_single / 1e9, 2
                    ),
                    "single_query_device_ms": round(
                        dt_single_dev * 1e3, 2
                    ),
                    "single_query_device_gcups": round(
                        cells_per_query / dt_single_dev / 1e9, 2
                    ),
                    "async_stream_query_ms": round(dt_stream * 1e3, 2),
                    "async_stream_gcups": round(
                        cells_per_query / dt_stream / 1e9, 2
                    ),
                    "db_residues": int(total_residues),
                    "query_len": 256,
                    "n_queries_pipelined": n_queries,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
