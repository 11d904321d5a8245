"""Phase breakdown of the single-query `Aligner.align` call.

VERDICT r2 weak #2: 38 ms end-to-end vs ~9 ms of kernel time.  This
measures where the rest goes: host prep (validate/encode/lengths),
pack-cache lookups, profile memoization, kernel dispatch+execution,
device assembly, the readback, and result-object construction.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import pyopal_tpu as po
from pyopal_tpu.ops import engine, packing
from pyopal_tpu.ops import pallas_ragged as pr
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


def timed(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(12071)
    db = po.Database(build_database(rng))
    aligner = po.Aligner()
    query = build_database(rng, n=1, mean_len=256)[0][:256]
    matrix = aligner.scoring_matrix.int_data()
    q_enc = np.frombuffer(db.alphabet.encode(query), dtype=np.uint8)
    n = len(db)

    # warm everything
    res = aligner.align(query, db, mode="score", algorithm="sw")
    assert len(res) == n

    print("end-to-end align():      %7.2f ms" % (timed(
        lambda: aligner.align(query, db, mode="score", algorithm="sw")
    ) * 1e3))
    print("end-to-end (mode=end):   %7.2f ms" % (timed(
        lambda: aligner.align(query, db, mode="end", algorithm="sw")
    ) * 1e3))

    # --- host prep pieces ---
    print("encode query:            %7.2f ms" % (timed(
        lambda: np.frombuffer(db.alphabet.encode(query), np.uint8)
    ) * 1e3))
    print("fp32 domain guard:       %7.2f ms" % (timed(
        lambda: engine._fp32_exact_domain(db, 0, n, [q_enc], matrix, 3, 1)
    ) * 1e3))
    print("pack cache lookup:       %7.2f ms" % (timed(
        lambda: packing.pack_database_slice_flat(db, 0, n)
    ) * 1e3))
    print("profile memo lookup:     %7.2f ms" % (timed(
        lambda: engine._profiles_for_cohort([q_enc], matrix)
    ) * 1e3))

    # --- device pipeline: dispatch -> kernel -> assemble -> readback ---
    fp = packing.pack_database_slice_flat(db, 0, n)
    flat_t, lengths, bos, cos, los, inv_pos = engine._flat_device(fp)
    profs, qlens = engine._profiles_for_cohort([q_enc], matrix)

    def kernel_call(with_ends):
        s, qe, te = pr.search_flat(
            profs, qlens, flat_t, lengths, bos, cos, los,
            3, 1, "sw", with_ends, chunk=fp.chunk, safe_pad=True,
        )
        return engine._assemble_flat(inv_pos, s, qe, te, with_ends=with_ends)

    np.asarray(kernel_call(False))  # warm
    np.asarray(kernel_call(True))

    # dispatch+kernel+assemble+readback, one call
    print("kernel+assemble+readback:%7.2f ms" % (timed(
        lambda: np.asarray(kernel_call(False))
    ) * 1e3))

    # marginal kernel time: K calls, one readback, vs 1 call
    def chain(K):
        outs = [kernel_call(False) for _ in range(K)]
        np.asarray(outs[-1])

    t1 = timed(lambda: chain(1))
    tK = timed(lambda: chain(9))
    print("marginal kernel (K=9):   %7.2f ms" % ((tK - t1) / 8 * 1e3))

    # readback alone: device-computed fresh array each trial
    out = kernel_call(False)
    addk = jax.jit(lambda x, k: x + k)
    np.asarray(addk(out, 0))
    print("readback alone (%s int32): %7.2f ms" % (
        out.shape,
        timed(lambda: np.asarray(addk(out, 1))) * 1e3,
    ))

    # result construction from a finished score array
    scores = np.asarray(kernel_call(False))[0]
    from pyopal_tpu.results import build_score_results

    print("build 12k ScoreResults:  %7.2f ms" % (timed(
        lambda: build_score_results(0, scores[None])
    ) * 1e3))


if __name__ == "__main__":
    main()
