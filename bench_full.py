"""Extended benchmark: every configuration from BASELINE.md.

Measures (on the current backend):

1. SW/NW/HW/OV score-only vs a 10k-sequence protein database;
2. end mode (score + end locations);
3. full mode: CIGAR traceback for the top-100 hits (the documented
   search -> extract -> realign workflow);
4. single-query latency and pipelined multi-query throughput;
5. the README toy example (correctness smoke).

Writes a markdown report to ``BENCH_DETAIL.md`` and prints it.
Run ``bench.py`` for the headline single-line JSON metric.
"""

import time

import numpy as np

from bench import build_database


def timed(fn, trials=4):
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    # min, not median: the dev device's relay jitter is strictly
    # additive external noise (DEVNOTES "link drift"), so the fastest
    # complete run estimates the software's pace (timeit practice)
    return min(ts)


def main():
    from pyopal_tpu.utils import cache

    cache.enable()
    import jax
    import pyopal_tpu as po

    lines = [
        "# Extended benchmark (BASELINE.md configurations)",
        "",
        f"Backend: `{jax.default_backend()}` — {jax.devices()[0].device_kind}",
        "",
    ]

    # toy example correctness
    targets = ["AACCGCTG", "ATGCGCT", "TTATTACG"]
    scores = [
        r.score
        for r in po.align("ACCTG", targets, gap_open=2, ordered=True)
    ]
    assert scores == [41, 31, 23], scores
    lines.append("README toy example: scores 41/31/23 reproduced.")
    lines.append("")

    rng = np.random.default_rng(1)
    seqs = build_database(rng, n=10000)
    db = po.Database(seqs)
    aligner = po.Aligner()
    query = build_database(rng, n=1, mean_len=256)[0][:256]
    cells = len(query) * db.total_length

    lines.append(f"Database: 10,000 sequences, {db.total_length:,} residues; query 256 aa; BLOSUM50 gap 3/1.")
    lines.append("")
    lines.append("| configuration | time/query | GCUPS |")
    lines.append("|---|---|---|")

    # 1. all four algorithms, score mode
    single_gcups = 1.0
    for algo in ("sw", "nw", "hw", "ov"):
        aligner.align(query, db, mode="score", algorithm=algo)  # warm
        dt = timed(lambda a=algo: aligner.align(query, db, mode="score", algorithm=a))
        lines.append(
            f"| `{algo}` score | {dt * 1e3:.1f} ms | {cells / dt / 1e9:.1f} |"
        )
        if algo == "sw":
            single_gcups = cells / dt / 1e9  # overwritten by the
            # pipelined pace below when available (the synchronous
            # call is link-RTT-floored on remote-attached devices)

    # 2. end mode
    aligner.align(query, db, mode="end", algorithm="sw")
    dt = timed(lambda: aligner.align(query, db, mode="end", algorithm="sw"))
    lines.append(f"| `sw` end | {dt * 1e3:.1f} ms | {cells / dt / 1e9:.1f} |")

    # 3a. full mode on top-100 hits (search -> extract -> realign,
    # the reference's documented workflow)
    hits = aligner.align(query, db, mode="score", algorithm="sw")
    top = sorted(hits, key=lambda h: h.score, reverse=True)[:100]
    subdb = db.extract([h.target_index for h in top])
    aligner.align(query, subdb, mode="full", algorithm="sw")  # warm
    dt = timed(
        lambda: aligner.align(query, subdb, mode="full", algorithm="sw")
    )
    full = aligner.align(query, subdb, mode="full", algorithm="sw")
    assert all(f.cigar() for f in full)
    lines.append(f"| `sw` full, top-100 realign | {dt * 1e3:.1f} ms | — |")

    # 3b. first-class top-k path: one score+ends dispatch + batched
    # traceback of the 100 winners (no sub-database, no second pass)
    aligner.align_top_k(query, db, k=100, algorithm="sw")  # warm
    dt = timed(lambda: aligner.align_top_k(query, db, k=100, algorithm="sw"))
    topk = aligner.align_top_k(query, db, k=100, algorithm="sw")
    assert [h.score for h in topk] == sorted(
        (h.score for h in top), reverse=True
    )
    lines.append(f"| `sw` align_top_k(k=100), end-to-end | {dt * 1e3:.1f} ms | — |")

    # 3c. whole-database full mode: realign EVERY target — a
    # reference-parity call (mode="full" is first-class, not only
    # top-k; /root/reference/src/pyopal/lib.pyx:1278-1282)
    full_all = aligner.align(query, db, mode="full", algorithm="sw")  # warm
    assert len(full_all) == len(db) and all(f.cigar() for f in full_all[:50])
    dt = timed(
        lambda: aligner.align(query, db, mode="full", algorithm="sw")
    )
    lines.append(
        f"| `sw` full, whole DB (10k traceback walks) | {dt * 1e3:.0f} ms | — |"
    )

    # 4. pipelined multi-query throughput (columnar API)
    queries = [q[:256] for q in build_database(rng, n=16, mean_len=256)]
    aligner.align_arrays(queries, db, mode="score", algorithm="sw")
    dt = timed(
        lambda: aligner.align_arrays(queries, db, mode="score", algorithm="sw")
    )
    per = dt / len(queries)
    lines.append(
        f"| `sw` score, 16 queries pipelined (arrays API) | {per * 1e3:.1f} ms | {cells / per / 1e9:.1f} |"
    )
    single_gcups = cells / per / 1e9  # the serving pace the scaling
    # model extrapolates from

    # 5. async interactive stream: submit 16 singles, resolve together
    def run_stream():
        futs = [
            aligner.align_async(q, db, mode="score", algorithm="sw")
            for q in queries
        ]
        for f in futs:
            f.result()

    run_stream()  # warm
    per = timed(run_stream) / len(queries)
    lines.append(
        f"| `sw` score, 16 sequential `align_async` resolved together | {per * 1e3:.1f} ms | {cells / per / 1e9:.1f} |"
    )

    # 6. distributed top-k pipeline on the local mesh (O(k) candidate
    # gather, never the full score matrix); equality vs align_top_k
    from pyopal_tpu.parallel import align_top_k_sharded

    got = align_top_k_sharded([query], db, k=100)[0]  # warm + check
    assert [h.score for h in got] == [h.score for h in topk]
    dt = timed(lambda: align_top_k_sharded([query], db, k=100))
    lines.append(
        f"| `sw` align_top_k_sharded(k=100), {len(jax.devices())}-device mesh | {dt * 1e3:.1f} ms | — |"
    )

    # 7. scaling evidence (SURVEY section 2 parallelism / BASELINE.md
    # >=80%-linear target): per-shard load spread of the LPT packing
    # on the Swiss-Prot-scale distribution at 1/2/4/8 shards, plus a
    # queries/s model = measured single-chip kernel pace scaled by the
    # worst shard's padded-cell share, with the top-k candidate
    # all-gather costed at ICI terms.  The model's only unverified
    # input on one chip is the ICI term, which is <0.1% of a query at
    # k=100 — the imbalance row is the load-bearing measurement.
    lines.append("")
    lines.append("## Modeled multi-host scaling (LPT shard packing)")
    lines.append("")
    single_q_s = cells / (single_gcups * 1e9)  # s/query at 1 chip
    lines.append(
        f"Single-chip sw-score pace (pipelined arrays API, measured "
        f"above): {single_gcups:.1f} GCUPS "
        f"({single_q_s * 1e3:.1f} ms/query marginal). "
        "ICI terms: 1 us/hop latency + candidate all-gather of "
        "`4 * k * n_shards` int32 per query (k=100)."
    )
    lines.append("")
    lines.append(
        "| hosts | padded-row spread | modeled q/s | parallel efficiency |"
    )
    lines.append("|---|---|---|---|")
    from pyopal_tpu.ops import packing as _packing
    from pyopal_tpu.parallel import sharded_flat as sfm

    lengths12k = np.clip(
        np.random.default_rng(8)
        .lognormal(np.log(350), 0.45, 12071)
        .astype(int),
        30,
        4000,
    ).tolist()
    base_rows = None
    for n_shards in (1, 2, 4, 8):
        ids = sfm.shard_assignment(
            len(lengths12k), lengths12k, n_shards, sfm.LANES
        )
        rows = np.array(
            [
                _packing.flat_layout(
                    [lengths12k[i] for i in s], sfm.LANES
                ).total_rows
                for s in ids
            ],
            np.float64,
        )
        spread = float(np.abs(rows - rows.mean()).max() / rows.mean())
        if base_rows is None:
            base_rows = float(rows.sum())
        # kernel time scales with the worst shard's padded rows;
        # collective: log2(n)-hop latency + bytes over ICI (45 GB/s)
        t_kernel = single_q_s * (rows.max() / base_rows)
        coll_bytes = 4 * 100 * n_shards * 4
        t_coll = (
            max(np.log2(max(n_shards, 1)), 0) * 1e-6
            + coll_bytes / 45e9
        )
        t_q = t_kernel + t_coll
        eff = single_q_s / (t_q * n_shards)
        lines.append(
            f"| {n_shards} | {spread * 100:.2f}% | {1.0 / t_q:.1f} | "
            f"{eff * 100:.1f}% |"
        )
    lines.append("")
    lines.append(
        "The packing property behind the model (spread, every target "
        "packed exactly once) is pinned by "
        "`tests/test_batch_parallel.py::test_shard_assignment_balance`; "
        "the collective path itself is proven correct by the "
        "two-process gloo test and the 8-device dryrun."
    )

    report = "\n".join(lines) + "\n"
    with open("BENCH_DETAIL.md", "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
