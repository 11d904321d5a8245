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
    query = build_database(rng, n=1, mean_len=256)[0][:256]

    db = po.Database(seqs)
    aligner = po.Aligner()  # BLOSUM50, gap 3/1
    total_residues = db.total_length
    cells = len(query) * total_residues

    # warmup: packs the database, compiles the kernels, uploads to HBM
    res = aligner.align(query, db, mode="score", algorithm="sw")
    assert len(res) == len(seqs)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        res = aligner.align(query, db, mode="score", algorithm="sw")
    dt = (time.perf_counter() - t0) / iters

    gcups = cells / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "GCUPS/chip (SW score-only, BLOSUM50, 12071-seq DB, 256aa query, end-to-end)",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
                "detail": {
                    "queries_per_s": round(1.0 / dt, 2),
                    "db_residues": int(total_residues),
                    "query_len": len(query),
                    "ms_per_query": round(dt * 1e3, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
