"""A/B: fine-tier v2 launch vs the segmented kernel on long queries.

Bench-like DB (12k lognormal seqs), one 5000-aa query, sw.  Runs both
paths in-process and cross-checks them bit-equal.

    python experiments/bench_long_fine.py [Q] [mode]
"""

import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from pyopal_tpu.matrices import ScoringMatrix
    from pyopal_tpu.ops import packing, pallas_kernel as pk
    from pyopal_tpu.ops import pallas_ragged as pr
    from pyopal_tpu.ops import pallas_ragged_long as prl

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    with_ends = "end" in sys.argv[2:]
    rng = np.random.default_rng(0)
    S = ScoringMatrix.from_name("BLOSUM50").int_data()
    lens = np.clip(
        rng.lognormal(np.log(350), 0.45, 12071).astype(int), 30, 4000
    )
    seqs = [rng.integers(0, 20, int(L)).astype(np.uint8) for L in lens]
    q = rng.integers(0, 20, Q).astype(np.uint8)
    fp = packing.pack_sequences_flat(seqs)
    args = (
        jnp.asarray(fp.flat_targets),
        jnp.asarray(fp.lengths),
        jnp.asarray(fp.block_of_step),
        jnp.asarray(fp.chunk_of_step),
        jnp.asarray(fp.last_of_step),
    )
    true_cells = int(sum(lens)) * Q

    q_pad = pr.fine_qpad(Q)
    Sf = np.asarray(S, np.float32)
    prof = np.full((1, q_pad, pk.ALPHA), pk.PAD_SCORE, np.float32)
    prof[0, :Q, : Sf.shape[1]] = Sf[q.astype(np.int64), :]
    prof = jnp.asarray(prof, jnp.bfloat16)
    qlens = jnp.asarray(np.array([Q], np.int32))

    def run_fine():
        return pr.search_flat(
            prof, qlens, *args, 3, 1, "sw", with_ends,
            chunk=fp.chunk, safe_pad=True,
        )

    def run_seg():
        return prl.search_flat_long(
            q, S, *args, 3, 1, "sw", with_ends, chunk=fp.chunk
        )

    out = {}
    for name, fn in (("seg ", run_seg), ("fine", run_fine)):
        s = fn()[0]
        np.asarray(s)  # warm + sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs = fn()
        sa = np.asarray(outs[0])
        dt = (time.perf_counter() - t0) / reps
        print(
            f"{name} Q={Q} ends={with_ends}: {dt*1e3:7.1f} ms "
            f"{true_cells/dt/1e9:7.1f} GCUPS"
        )
        out[name] = tuple(np.asarray(o).reshape(-1) for o in outs)

    pos = fp.inv_pos
    sA = out["seg "][0][pos]
    sB = out["fine"][0].reshape(-1)[pos]
    assert np.array_equal(sA, sB), "score mismatch"
    if with_ends:
        assert np.array_equal(out["seg "][1][pos], out["fine"][1].reshape(-1)[pos])
        assert np.array_equal(out["seg "][2][pos], out["fine"][2].reshape(-1)[pos])
    print("cross-check OK")


if __name__ == "__main__":
    main()
