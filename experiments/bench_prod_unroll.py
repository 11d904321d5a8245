"""In-process A/B of the production ragged kernel's (chunk, unroll).

The strip-scan prototype (bench_strip.py) measured full-scan u=8 at
~220 GCUPS vs u=16 at ~136 within one process at Q_pad=256 — but on
synthetic square data.  This reruns the REAL kernel (search_flat, flat
packing, scalar-prefetched block maps, bestvec SW) on the bench
workload (12071-seq lognormal DB, 256-aa query) across (chunk, unroll)
in a single process, since remote-compile variance makes cross-process
numbers untrustworthy (DEVNOTES).
"""

import time

import jax.numpy as jnp
import numpy as np

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import build_database  # noqa: E402
from pyopal_tpu.utils import cache  # noqa: E402

cache.enable()

import pyopal_tpu as po  # noqa: E402
from pyopal_tpu.ops import engine, packing, pallas_ragged as pr  # noqa: E402


def main():
    rng = np.random.default_rng(12071)
    seqs = build_database(rng)
    db = po.Database(seqs)
    matrix = po.ScoringMatrix.from_name("BLOSUM50").int_data()
    query = build_database(rng, n=1, mean_len=256)[0][:256]
    q_enc = np.frombuffer(db.alphabet.encode(query), dtype=np.uint8)

    true_cells = 256 * db.total_length

    fp = packing.pack_database_slice_flat(db, 0, len(db))
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fp)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)
    pad_cells = 256 * int(flat_t.shape[0]) * 128

    def run(chunk, unroll):
        if fp.chunk != chunk:
            return None  # flat layout is packed at a fixed quantum
        return pr.search_flat(
            profs, qlens, flat_t, lengths, bos, cos, los,
            3, 1, "sw", False, chunk=chunk, unroll=unroll, safe_pad=True,
        )

    ref = None
    for unroll in (4, 8, 8, 16, 32):
        try:
            out = run(fp.chunk, unroll)
            s = np.asarray(out[0])
        except Exception as e:
            print(f"u={unroll}: FAILED {type(e).__name__}: {str(e)[:150]}")
            continue
        if ref is None:
            ref = s
        match = "match" if np.array_equal(s, ref) else "MISMATCH"
        K = 12
        t0 = time.perf_counter()
        _ = np.asarray(run(fp.chunk, unroll)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(fp.chunk, unroll)
        _ = np.asarray(r[0])
        tK = time.perf_counter() - t0
        marginal = (tK - t1) / (K - 1)
        print(
            f"chunk={fp.chunk} u={unroll:2d}: {marginal*1e3:7.2f} ms  "
            f"true {true_cells/marginal/1e9:6.1f} GCUPS  "
            f"padded {pad_cells/marginal/1e9:6.1f}  {match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
