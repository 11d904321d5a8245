"""Validate + benchmark the query-packed q8 kernel (`ops/pallas_q8`).

Usage:
    python experiments/bench_q8.py check   # CPU interpret vs naive oracle
    python experiments/bench_q8.py bench   # TPU A/B vs the v2 ragged kernel
"""

import sys
import time

import numpy as np

CHECK = "check" in sys.argv[1:] or len(sys.argv) == 1


def _setup_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _pack(seqs, chunk=64):
    from pyopal_tpu.ops import packing

    return packing.pack_sequences_flat(
        [np.asarray(s, np.uint8) for s in seqs], chunk=chunk
    )


def _run_q8(queries, seqs, S, go, ge, algo, with_ends, interpret, chunk=64):
    import jax.numpy as jnp

    from pyopal_tpu.ops import pallas_q8 as q8

    fp = _pack(seqs, chunk=chunk)
    groups = q8.plan_groups([len(q) for q in queries])
    profs, qv, maxq = q8.make_profiles_q8_host(queries, S, groups)
    s, qe, te = q8.search_flat_q8(
        jnp.asarray(profs, jnp.bfloat16),
        jnp.asarray(qv),
        jnp.asarray(maxq),
        jnp.asarray(fp.flat_targets),
        jnp.asarray(fp.lengths),
        jnp.asarray(fp.block_of_step),
        jnp.asarray(fp.chunk_of_step),
        jnp.asarray(fp.last_of_step),
        go,
        ge,
        algo,
        with_ends,
        interpret=interpret,
        chunk=fp.chunk,
    )
    s, qe, te = np.asarray(s), np.asarray(qe), np.asarray(te)
    # map (group, block, qb, lane) back to (query, target)
    nq, nt = len(queries), len(seqs)
    S_out = np.zeros((nq, nt), np.int64)
    QE = np.zeros((nq, nt), np.int64)
    TE = np.zeros((nq, nt), np.int64)
    pos = fp.inv_pos  # target -> block*LANES + lane
    from pyopal_tpu.ops.packing import LANES

    for g, idxs in enumerate(groups):
        for qb, qi in enumerate(idxs):
            flat_s = s[g, :, qb, :].reshape(-1)
            flat_qe = qe[g, :, qb, :].reshape(-1)
            flat_te = te[g, :, qb, :].reshape(-1)
            S_out[qi] = flat_s[pos]
            QE[qi] = flat_qe[pos]
            TE[qi] = flat_te[pos]
    return S_out, QE, TE


def check():
    _setup_cpu()
    from pyopal_tpu.matrices import ScoringMatrix
    from pyopal_tpu.ops import naive

    S = ScoringMatrix.from_name("BLOSUM50").int_data()
    rng = np.random.default_rng(7)
    failures = 0
    for algo in ["nw", "hw", "ov", "sw"]:
        for go, ge in [(3, 1), (1, 3), (0, 0), (4, 4), (0, 2)]:
            # 11 queries (2 groups, second partial), mixed lengths;
            # targets include empty, tiny, chunk-crossing lengths
            queries = [
                rng.integers(0, 24, L).astype(np.uint8)
                for L in [13, 1, 40, 64, 7, 130, 29, 55, 3, 90, 17]
            ]
            lens = [0, 1, 5, 63, 64, 65, 127, 128, 129, 190, 40, 2]
            lens += list(rng.integers(0, 200, 20))
            seqs = [
                rng.integers(0, 24, L).astype(np.uint8) for L in lens
            ]
            s, qe, te = _run_q8(
                queries, seqs, S, go, ge, algo, True, interpret=True
            )
            for qi, q in enumerate(queries):
                for ti, t in enumerate(seqs):
                    ns, nqe, nte = naive.score_end(q, t, S, go, ge, algo)
                    ok = ns == s[qi, ti]
                    if len(t) > 0:
                        ok = ok and (nqe, nte) == (qe[qi, ti], te[qi, ti])
                    if not ok:
                        failures += 1
                        print(
                            f"MISMATCH {algo} go={go} ge={ge} q{qi}(L={len(q)}) "
                            f"t{ti}(L={len(t)}): naive=({ns},{nqe},{nte}) "
                            f"q8=({s[qi, ti]},{qe[qi, ti]},{te[qi, ti]})"
                        )
                        if failures > 10:
                            return 1
            print(f"ok {algo} go={go} ge={ge}" if not failures else f"done {algo} go={go} ge={ge} (failures={failures})")
    print("FAILURES:", failures)
    return 1 if failures else 0


def bench():
    import jax
    import jax.numpy as jnp

    from pyopal_tpu.matrices import ScoringMatrix
    from pyopal_tpu.ops import pallas_q8 as q8
    from pyopal_tpu.ops import pallas_ragged as pr
    from pyopal_tpu.utils import cache

    cache.enable()
    S = ScoringMatrix.from_name("BLOSUM50").int_data()
    rng = np.random.default_rng(12071)
    lengths = np.clip(
        rng.lognormal(np.log(350), 0.45, 12071).astype(int), 30, 4000
    )
    seqs = [rng.integers(0, 20, L).astype(np.uint8) for L in lengths]
    import os as _os
    qlen = int(_os.environ.get("Q8_QLEN", "256"))
    queries = [rng.integers(0, 20, qlen).astype(np.uint8) for _ in range(32)]
    total = int(sum(lengths))
    cells = qlen * total * 32

    fp = _pack(seqs, chunk=64)
    dev = [
        jnp.asarray(x)
        for x in (
            fp.flat_targets,
            fp.lengths,
            fp.block_of_step,
            fp.chunk_of_step,
            fp.last_of_step,
        )
    ]

    def timed(fn, K=5):
        outs = fn()
        np.asarray(outs[0])  # sync
        t0 = time.perf_counter()
        outs = fn()
        np.asarray(outs[0])
        t1 = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        for _ in range(K):
            outs = fn()
        np.asarray(outs[0])
        tK = (time.perf_counter() - t0) * 1e3
        return (tK - t1) / (K - 1)

    import os
    lane_widths = [int(x) for x in os.environ.get("Q8_LANES", "256,512").split(",")]
    algos = os.environ.get("Q8_ALGOS", "sw").split(",")
    for mode_ends in (False, True):
        for algo in algos:
            # v2 path
            profs_host = pr.make_profiles_host(queries, S)
            profs = jnp.asarray(profs_host, jnp.bfloat16)
            qlens = jnp.asarray(np.array([len(q) for q in queries], np.int32))

            def run_v2():
                return pr.search_flat(
                    profs, qlens, *dev, 3, 1, algo, mode_ends,
                    chunk=fp.chunk, safe_pad=True,
                )

            ms_v2 = timed(run_v2)
            g_v2 = cells / ms_v2 / 1e6
            sv, qev, tev = [np.asarray(x) for x in run_v2()]
            tag = "end" if mode_ends else "score"
            line = f"{algo:2s} {tag:5s}: v2 {ms_v2:7.2f} ms ({g_v2:6.1f} GCUPS)"
            for lanes in lane_widths:
                from pyopal_tpu.ops import packing as pk_
                q8chunk = int(_os.environ.get("Q8_CHUNK", "64"))
                fpw = pk_.pack_sequences_flat(seqs, lanes=lanes, chunk=q8chunk)
                devw = [
                    jnp.asarray(x)
                    for x in (
                        fpw.flat_targets, fpw.lengths, fpw.block_of_step,
                        fpw.chunk_of_step, fpw.last_of_step,
                    )
                ]
                groups = q8.plan_groups([len(q) for q in queries])
                p8, qv, maxq = q8.make_profiles_q8_host(
                    queries, S, groups, lanes=lanes
                )
                p8 = jnp.asarray(p8, jnp.bfloat16)
                qv = jnp.asarray(qv)
                maxq = jnp.asarray(maxq)

                import os as _os2
                unroll = int(_os2.environ.get("Q8_UNROLL", "8"))
                ncols = int(_os2.environ.get("Q8_NCOLS", str(q8.NCOLS)))

                def run_q8():
                    return q8.search_flat_q8(
                        p8, qv, maxq, *devw, 3, 1, algo, mode_ends,
                        chunk=fpw.chunk, unroll=unroll, ncols=ncols,
                    )

                ms_q8 = timed(run_q8)
                g_q8 = cells / ms_q8 / 1e6
                s8_, qe8_, te8_ = [np.asarray(x) for x in run_q8()]
                pos = fpw.inv_pos
                ok = True
                for g, idxs in enumerate(groups):
                    for qb, qi in enumerate(idxs):
                        a = s8_[g, :, qb, :].reshape(-1)[pos]
                        b = sv[qi].reshape(-1)[fp.inv_pos]
                        if not np.array_equal(a, b):
                            ok = False
                        if mode_ends:
                            if not np.array_equal(
                                qe8_[g, :, qb, :].reshape(-1)[pos],
                                qev[qi].reshape(-1)[fp.inv_pos],
                            ) or not np.array_equal(
                                te8_[g, :, qb, :].reshape(-1)[pos],
                                tev[qi].reshape(-1)[fp.inv_pos],
                            ):
                                ok = False
                line += (
                    f" | q8/L{lanes} {ms_q8:7.2f} ms ({g_q8:6.1f} GCUPS)"
                    f" {'EQ' if ok else '*** MISMATCH ***'}"
                )
            print(line)


if __name__ == "__main__":
    sys.exit(check() if CHECK else (bench() or 0))
