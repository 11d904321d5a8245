"""In-process A/B of the flat-packing chunk quantum (padding vs step
overhead) on the bench workload, production kernel, Q=256 bestvec."""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bench import build_database
from pyopal_tpu.utils import cache

cache.enable()

import pyopal_tpu as po  # noqa: E402
from pyopal_tpu.ops import engine, packing  # noqa: E402
from pyopal_tpu.ops import pallas_ragged as pr  # noqa: E402


def main():
    rng = np.random.default_rng(12071)
    seqs = build_database(rng)
    db = po.Database(seqs)
    enc = [
        np.frombuffer(db.get_encoded(i), dtype=np.uint8)
        for i in range(len(db))
    ]
    matrix = po.ScoringMatrix.from_name("BLOSUM50").int_data()
    query = build_database(rng, n=1, mean_len=256)[0][:256]
    q_enc = np.frombuffer(db.alphabet.encode(query), dtype=np.uint8)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)
    true_cells = 256 * db.total_length

    ref = None
    for chunk in (16, 32, 32, 64):
        fp = packing.pack_sequences_flat(enc, chunk=chunk)
        flat_t = jnp.asarray(fp.flat_targets)
        lengths = jnp.asarray(fp.lengths)
        bos = jnp.asarray(fp.block_of_step)
        cos = jnp.asarray(fp.chunk_of_step)
        los = jnp.asarray(fp.last_of_step)
        pad = fp.flat_targets.shape[0] * 128 / db.total_length

        def run():
            return pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                3, 1, "sw", False, chunk=chunk, safe_pad=True,
            )

        try:
            s = np.asarray(run()[0]).reshape(-1)[fp.indices.reshape(-1) >= 0]
        except Exception as e:
            print(f"chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        if ref is None:
            ref = s
        match = "match" if np.array_equal(np.sort(s), np.sort(ref)) else "MISMATCH"
        K = 10
        t0 = time.perf_counter()
        _ = np.asarray(run()[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = run()
        _ = np.asarray(r[0])
        tK = time.perf_counter() - t0
        marg = (tK - t1) / (K - 1)
        print(
            f"chunk={chunk:4d} pad={pad:5.3f}x steps={fp.block_of_step.shape[0]:5d}: "
            f"{marg*1e3:7.2f} ms  true {true_cells/marg/1e9:6.1f} GCUPS  {match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
