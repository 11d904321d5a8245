"""Phase breakdown of the batched align_arrays path on the TPU.

Times, for the bench workload (12071-seq DB, 64x256-aa queries):
  kernel        — q8 launches only (device-timed via marginal cost)
  +assemble     — kernel + on-device gather into global target order
  +readback     — one np.asarray of the assembled scores
  end-to-end    — Aligner.align_arrays
"""

import time

import numpy as np


def build(rng, n, mean_len):
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n).astype(int), 30, 4000
    )
    return [
        letters[rng.integers(0, 20, L)].tobytes().decode("ascii")
        for L in lengths
    ]


def main():
    import jax.numpy as jnp

    import pyopal_tpu as po
    from pyopal_tpu.ops import engine, packing
    from pyopal_tpu.ops import pallas_q8 as q8
    from pyopal_tpu.utils import cache

    cache.enable()
    rng = np.random.default_rng(12071)
    seqs = build(rng, 12071, 350)
    queries = [q[:256] for q in build(rng, 64, 256)]
    db = po.Database(seqs)
    aligner = po.Aligner()
    matrix = aligner.scoring_matrix.int_data()
    alphabet = aligner.alphabet
    enc = [
        np.frombuffer(alphabet.encode(q), dtype=np.uint8) for q in queries
    ]
    total = db.total_length
    cells = 256 * total * len(queries)

    lanes = engine._Q8_LANES_BY_TIER[256]
    fpw = packing.pack_database_slice_flat(db, 0, len(db), lanes=lanes)
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fpw)
    groups = q8.plan_groups([len(q) for q in enc])
    profs, qv, maxq = engine._profiles_q8(enc, matrix, groups, lanes)

    def kernel_only():
        return q8.search_flat_q8(
            profs, qv, maxq, flat_t, lengths, bos, cos, los,
            3, 1, "sw", False, chunk=fpw.chunk,
        )

    def kernel_assemble():
        s, qe, te = kernel_only()
        return engine._assemble_flat_q8(inv_pos, s, qe, te, with_ends=False)

    def timed(fn, sync=lambda o: np.asarray(o), K=5):
        sync(fn())  # warm
        t0 = time.perf_counter()
        sync(fn())
        t1 = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        sync(out)
        tK = (time.perf_counter() - t0) * 1e3
        return t1, (tK - t1) / (K - 1)

    one, marg = timed(kernel_only, sync=lambda o: np.asarray(o[0][0, 0, 0, :1]))
    print(f"kernel    : one-call {one:7.1f} ms  marginal {marg:7.1f} ms "
          f"({cells / marg / 1e6:6.1f} GCUPS)")

    one, marg = timed(kernel_assemble, sync=lambda o: np.asarray(o[0, :1]))
    print(f"+assemble : one-call {one:7.1f} ms  marginal {marg:7.1f} ms "
          f"({cells / marg / 1e6:6.1f} GCUPS)")

    one, marg = timed(kernel_assemble, sync=lambda o: np.asarray(o))
    print(f"+readback : one-call {one:7.1f} ms  marginal {marg:7.1f} ms "
          f"({cells / marg / 1e6:6.1f} GCUPS)")

    # pure readback cost of the assembled array
    out = kernel_assemble()
    t0 = time.perf_counter()
    np.asarray(out)
    print(f"readback alone: {(time.perf_counter() - t0) * 1e3:7.1f} ms "
          f"({out.size * 4 / 1e6:.1f} MB)")

    def e2e():
        return aligner.align_arrays(queries, db, mode="score", algorithm="sw")

    one, marg = timed(e2e, sync=lambda o: None)
    print(f"end-to-end: one-call {one:7.1f} ms  marginal {marg:7.1f} ms "
          f"({cells / marg / 1e6:6.1f} GCUPS)")


if __name__ == "__main__":
    main()
