"""Engine cross-validation: naive oracle vs XLA engine vs Pallas kernel.

The TPU analog of the reference's golden-answer strategy: every engine
must produce identical scores and end locations on randomized inputs
covering all four algorithms, adversarial gap parameters (including
ge > go and zero penalties), empty targets, and lengths crossing the
kernel's column-chunk boundary.
"""

import numpy as np
import pytest

from pyopal_tpu.matrices import ScoringMatrix
from pyopal_tpu.ops import naive, packing, xla

S = ScoringMatrix.from_name("BLOSUM50").int_data()
ALGOS = ["nw", "hw", "ov", "sw"]
GAPS = [(3, 1), (2, 1), (5, 2), (1, 3), (0, 0), (4, 4), (0, 2)]


def _random_case(rng, Q_max=40, T_max=60, B=8):
    Q = int(rng.integers(1, Q_max))
    q = rng.integers(0, 24, Q).astype(np.uint8)
    lens = rng.integers(0, T_max, B).astype(np.int32)
    T_pad = int(max(16, lens.max() if B else 16))
    tgt = np.zeros((T_pad, B), dtype=np.int32)
    seqs = []
    for b in range(B):
        s = rng.integers(0, 24, lens[b]).astype(np.uint8)
        seqs.append(s)
        tgt[: lens[b], b] = s
    return q, seqs, tgt, lens


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("gaps", GAPS)
def test_xla_matches_naive(algo, gaps):
    go, ge = gaps
    rng = np.random.default_rng(hash((algo, gaps)) % 2**32)
    q, seqs, tgt, lens = _random_case(rng)
    prof = xla.make_profile_t(q, S)
    sc, qe, te = [
        np.asarray(x) for x in xla.search_block(prof, tgt, lens, go, ge, algo)
    ]
    for b, seq in enumerate(seqs):
        ns, nqe, nte = naive.score_end(q, seq, S, go, ge, algo)
        assert ns == sc[b], (algo, gaps, b)
        if lens[b] > 0:
            assert (nqe, nte) == (qe[b], te[b]), (algo, gaps, b)


@pytest.mark.parametrize("algo", ALGOS)
def test_pallas_interpret_matches_naive(algo):
    from pyopal_tpu.ops import pallas_kernel as pk

    go, ge = 3, 1
    rng = np.random.default_rng(99)
    Q = 13
    q = rng.integers(0, 24, Q).astype(np.uint8)
    lanes = 128
    # lengths straddling the 256-column chunk boundary
    lens = rng.integers(0, 300, lanes).astype(np.int32)
    lens[:6] = [0, 255, 256, 257, 300, 1]
    T_pad = 512
    tgt = np.zeros((1, T_pad, lanes), dtype=np.int32)
    seqs = []
    for b in range(lanes):
        s = rng.integers(0, 24, lens[b]).astype(np.uint8)
        seqs.append(s)
        tgt[0, : lens[b], b] = s
    prof = pk.make_profile(q, S)
    sc, qe, te = [
        np.asarray(x)
        for x in pk.search_group(
            prof, tgt, lens.reshape(1, lanes), go, ge, algo, interpret=True
        )
    ]
    for b in range(0, lanes, 11):
        ns, nqe, nte = naive.score_end(q, seqs[b], S, go, ge, algo)
        assert ns == sc[0, b], (algo, b, lens[b])
        if lens[b] > 0:
            assert (nqe, nte) == (qe[0, b], te[0, b]), (algo, b, lens[b])


def test_traceback_score_consistency():
    """Traceback score must equal the score-only DP on random pairs."""
    rng = np.random.default_rng(3)
    for algo in ALGOS:
        for _ in range(5):
            q = rng.integers(0, 24, int(rng.integers(1, 30))).astype(np.uint8)
            t = rng.integers(0, 24, int(rng.integers(1, 40))).astype(np.uint8)
            score, qs, ts, qe, te, ops = naive.traceback(q, t, S, 3, 1, algo)
            s2, qe2, te2 = naive.score_end(q, t, S, 3, 1, algo)
            assert score == s2
            assert (qe, te) == (qe2, te2)
            # replay the ops to re-derive the score
            i, j, total, in_gap = qs, ts, 0, 0
            for op in ops:
                if op in (0, 3):  # M/X
                    total += int(S[q[i], t[j]])
                    i += 1
                    j += 1
                    in_gap = 0
                elif op == 1:  # D: query residue vs gap
                    total -= 3 if in_gap != 1 else 1
                    in_gap = 1
                    i += 1
                else:  # I: target residue vs gap
                    total -= 3 if in_gap != 2 else 1
                    in_gap = 2
                    j += 1
            if algo == "nw":
                # add boundary gaps outside [qs, qe] / [ts, te]
                pass  # nw traceback covers the whole matrix path
            if algo == "sw":
                assert total == score
            assert (i, j) == (qe + 1, te + 1)


def test_packing_roundtrip():
    rng = np.random.default_rng(5)
    seqs = [
        rng.integers(0, 24, int(rng.integers(1, 200))).astype(np.uint8)
        for _ in range(300)
    ]
    packed = packing.pack_sequences(seqs)
    assert packed.n_targets == 300
    seen = {}
    for g in packed.groups:
        nblk, t_pad, lanes = g.targets.shape
        assert g.t_pad == t_pad
        for blk in range(nblk):
            for lane in range(lanes):
                i = g.indices[blk, lane]
                if i < 0:
                    assert g.lengths[blk, lane] == 0
                    continue
                n = g.lengths[blk, lane]
                assert n == len(seqs[i])
                assert np.array_equal(
                    g.targets[blk, :n, lane], seqs[i]
                )
                seen[i] = seen.get(i, 0) + 1
    assert sorted(seen) == list(range(300))
    assert all(v == 1 for v in seen.values())


def test_batched_traceback_matches_naive():
    """Device direction-matrix traceback == scalar oracle, all algos."""
    from pyopal_tpu.ops import traceback as tb

    rng = np.random.default_rng(17)
    for go, ge in [(3, 1), (1, 3), (10, 1)]:
        for algo in ALGOS:
            Q = int(rng.integers(1, 40))
            q = rng.integers(0, 24, Q).astype(np.uint8)
            targets = [
                rng.integers(0, 24, int(L)).astype(np.uint8)
                for L in rng.integers(0, 60, 8)
            ]
            ends = ([], [], [])
            for t in targets:
                s_, qe_, te_ = naive.score_end(q, t, S, go, ge, algo)
                ends[0].append(s_)
                ends[1].append(qe_)
                ends[2].append(te_)
            outs = tb.full_alignments_batch(q, targets, S, go, ge, algo, ends)
            for i, t in enumerate(targets):
                want = naive.traceback(q, t, S, go, ge, algo)
                got = outs[i]
                assert got[:5] == want[:5], (go, ge, algo, i)
                assert np.array_equal(got[5], want[5]), (go, ge, algo, i)


def test_segmented_long_query_matches_naive():
    """Query-segmented ragged kernel (interpret) == oracle, all algos."""
    import jax.numpy as jnp
    from pyopal_tpu.ops import packing, pallas_ragged_long as prl

    old_qseg = prl.QSEG
    prl.QSEG = 32  # force multi-segment paths at test sizes
    try:
        rng = np.random.default_rng(23)
        seqs = [
            rng.integers(0, 24, int(L)).astype(np.uint8)
            for L in rng.integers(0, 90, 30)
        ]
        fp = packing.pack_sequences_flat(seqs)
        flat_t = jnp.asarray(fp.flat_targets)
        lengths = jnp.asarray(fp.lengths)
        bos = jnp.asarray(fp.block_of_step)
        cos = jnp.asarray(fp.chunk_of_step)
        los = jnp.asarray(fp.last_of_step)
        idx = fp.indices.reshape(-1)
        for Q in (33, 70):  # 2 and 3 segments
            q = rng.integers(0, 24, Q).astype(np.uint8)
            for algo in ALGOS:
                s, qe, te = prl.search_flat_long(
                    q, S, flat_t, lengths, bos, cos, los,
                    3, 1, algo, True, interpret=True, chunk=fp.chunk,
                )
                s = np.asarray(s).reshape(-1)
                qe = np.asarray(qe).reshape(-1)
                te = np.asarray(te).reshape(-1)
                for pos in range(0, idx.shape[0], 7):
                    i = idx[pos]
                    if i < 0:
                        continue
                    ns, nqe, nte = naive.score_end(q, seqs[i], S, 3, 1, algo)
                    assert ns == s[pos], (Q, algo, i)
                    if len(seqs[i]):
                        assert (nqe, nte) == (qe[pos], te[pos]), (Q, algo, i)
    finally:
        prl.QSEG = old_qseg


def test_ragged_flat_matches_naive():
    """Ragged single-launch kernel (interpret) == oracle.

    Covers the bestvec fast path (sw score-only with safe_pad: running
    elementwise max, PAD_SYMBOL-padded columns) and the unrolled column
    loop, against the tracked per-column path and the scalar oracle.
    """
    import jax.numpy as jnp
    from pyopal_tpu.ops import pallas_ragged as pr

    rng = np.random.default_rng(31)
    seqs = [
        rng.integers(0, 24, int(L)).astype(np.uint8)
        for L in rng.integers(0, 150, 40)
    ]
    fp = packing.pack_sequences_flat(seqs)
    assert fp.flat_targets[0, -1] == 31  # PAD_SYMBOL padding in effect
    flat_t = jnp.asarray(fp.flat_targets)
    lengths = jnp.asarray(fp.lengths)
    bos = jnp.asarray(fp.block_of_step)
    cos = jnp.asarray(fp.chunk_of_step)
    los = jnp.asarray(fp.last_of_step)
    idx = fp.indices.reshape(-1)

    queries = [
        rng.integers(0, 24, 17).astype(np.uint8),
        rng.integers(0, 24, 40).astype(np.uint8),
    ]
    profs = jnp.asarray(pr.make_profiles_host(queries, S), jnp.bfloat16)
    qlens = jnp.asarray([len(q) for q in queries], jnp.int32)

    for go, ge in [(3, 1), (1, 3)]:
        for algo in ALGOS:
            for with_ends in (False, True):
                for unroll, safe_pad in ((4, True), (1, False)):
                    s, qe, te = pr.search_flat(
                        profs, qlens, flat_t, lengths, bos, cos, los,
                        go, ge, algo, with_ends, interpret=True,
                        chunk=fp.chunk, unroll=unroll, safe_pad=safe_pad,
                    )
                    s = np.asarray(s).reshape(len(queries), -1)
                    qe = np.asarray(qe).reshape(len(queries), -1)
                    te = np.asarray(te).reshape(len(queries), -1)
                    for qi, q in enumerate(queries):
                        for pos in range(0, idx.shape[0], 5):
                            i = idx[pos]
                            if i < 0:
                                continue
                            ns, nqe, nte = naive.score_end(
                                q, seqs[i], S, go, ge, algo
                            )
                            assert ns == s[qi, pos], (
                                algo, with_ends, unroll, safe_pad, go, ge, i
                            )
                            if with_ends and len(seqs[i]):
                                assert (nqe, nte) == (
                                    qe[qi, pos], te[qi, pos]
                                ), (algo, unroll, safe_pad, go, ge, i)


def test_ragged_flat_strip_matches_naive():
    """Strip-blocked score-only kernel (interpret) == oracle, all algos.

    Score-only at a >=512 query tier routes to `_ragged_kernel_strip`
    (strip height 256, boundary carries across strips and chunks, the
    nw row-0 boundary chain entering through the strip-0 Cin);
    cross-checked against the scalar oracle on targets spanning
    multiple 64-column chunks, including an empty lane.  sw runs both
    routes: safe_pad=True (the unified v2 kernel) and safe_pad=False
    (the v1 strip kernel with per-column reductions).
    """
    import jax.numpy as jnp
    from pyopal_tpu.ops import pallas_ragged as pr

    rng = np.random.default_rng(57)
    seqs = [
        rng.integers(0, 24, int(L)).astype(np.uint8)
        for L in (0, 5, 63, 64, 65, 130, 200, 40)
    ]
    fp = packing.pack_sequences_flat(seqs)
    flat_t = jnp.asarray(fp.flat_targets)
    lengths = jnp.asarray(fp.lengths)
    bos = jnp.asarray(fp.block_of_step)
    cos = jnp.asarray(fp.chunk_of_step)
    los = jnp.asarray(fp.last_of_step)
    idx = fp.indices.reshape(-1)

    # 300 > 256 -> tier 512 >= STRIP_MIN_QPAD: strip kernel engaged
    queries = [rng.integers(0, 24, 300).astype(np.uint8)]
    profs = jnp.asarray(pr.make_profiles_host(queries, S), jnp.bfloat16)
    qlens = jnp.asarray([len(q) for q in queries], jnp.int32)
    assert profs.shape[1] >= pr.STRIP_MIN_QPAD

    cases = [(a, True) for a in ALGOS] + [("sw", False)]
    for algo, safe_pad in cases:
        for go, ge in [(3, 1), (1, 3)]:
            s, _, _ = pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                go, ge, algo, False, interpret=True,
                chunk=fp.chunk, safe_pad=safe_pad,
            )
            s = np.asarray(s).reshape(-1)
            for pos in range(idx.shape[0]):
                i = idx[pos]
                if i < 0:
                    continue
                ns, _, _ = naive.score_end(
                    queries[0], seqs[i], S, go, ge, algo
                )
                assert ns == s[pos], (algo, safe_pad, go, ge, i, ns, s[pos])


def test_ragged_v2_multistrip_ends_match_naive():
    """Unified v2 kernel at a multi-strip tier == oracle, WITH ends.

    A 300-aa query at the 512 tier with strip height 256 runs two
    strips; targets spanning multiple 64-column chunks exercise the
    double-buffered cross-chunk carry.  This pins the elementwise
    end-tracking (best/bestj/cap) and its finalize tie-breaking (max
    score, then min target column, then min query row) against the
    scalar oracle for every algorithm — coverage the v1 kernels never
    had at strip tiers (their end modes used per-column reductions).
    """
    import jax.numpy as jnp
    from pyopal_tpu.ops import pallas_ragged as pr

    rng = np.random.default_rng(91)
    seqs = [
        rng.integers(0, 24, int(L)).astype(np.uint8)
        for L in (0, 5, 63, 64, 65, 130, 200, 40, 1, 97)
    ]
    # a couple of low-complexity targets to force score ties
    seqs.append(np.full(80, 2, np.uint8))
    seqs.append(np.tile(np.arange(4, dtype=np.uint8), 30))
    fp = packing.pack_sequences_flat(seqs)
    flat_t = jnp.asarray(fp.flat_targets)
    lengths = jnp.asarray(fp.lengths)
    bos = jnp.asarray(fp.block_of_step)
    cos = jnp.asarray(fp.chunk_of_step)
    los = jnp.asarray(fp.last_of_step)
    idx = fp.indices.reshape(-1)

    queries = [rng.integers(0, 24, 300).astype(np.uint8)]
    # a low-complexity query stretch amplifies tie-break coverage
    queries[0][100:140] = 2
    profs = jnp.asarray(pr.make_profiles_host(queries, S), jnp.bfloat16)
    qlens = jnp.asarray([len(q) for q in queries], jnp.int32)
    assert profs.shape[1] > pr.STRIP  # multi-strip

    # (3, 1) is the production shape; (0, 0) maximizes score ties and
    # so stresses the finalize tie-breaking the hardest.  (1, 3) adds
    # nothing the score-only multistrip test doesn't already cover.
    for algo in ALGOS:
        for go, ge in [(3, 1), (0, 0)]:
            s, qe, te = pr.search_flat(
                profs, qlens, flat_t, lengths, bos, cos, los,
                go, ge, algo, True, interpret=True,
                chunk=fp.chunk, safe_pad=True,
            )
            s = np.asarray(s).reshape(-1)
            qe = np.asarray(qe).reshape(-1)
            te = np.asarray(te).reshape(-1)
            for pos in range(idx.shape[0]):
                i = idx[pos]
                if i < 0:
                    continue
                ns, nqe, nte = naive.score_end(
                    queries[0], seqs[i], S, go, ge, algo
                )
                assert ns == s[pos], (algo, go, ge, i, ns, s[pos])
                if len(seqs[i]):
                    assert (nqe, nte) == (qe[pos], te[pos]), (
                        algo, go, ge, i, (nqe, nte), (qe[pos], te[pos])
                    )


def test_ragged_flat_pad_score_dominates_huge_scores():
    """Padded rows must not leak into `best` even when scores > 30000.

    A high-magnitude (but bf16-exact, <=256) custom matrix drives the
    SW score of an identical pair to 60000; with the old
    PAD_SCORE=-30000 the first padded profile row (diag = H +
    PAD_SCORE) could go positive and corrupt the bestvec running max.
    """
    import jax.numpy as jnp
    from pyopal_tpu.ops import pallas_ragged as pr

    rng = np.random.default_rng(3)
    A = 24
    S_big = np.full((A, A), -17, dtype=np.int32)
    np.fill_diagonal(S_big, 200)
    q = rng.integers(0, A, 300).astype(np.uint8)
    seqs = [q.copy(), rng.integers(0, A, 100).astype(np.uint8)]

    fp = packing.pack_sequences_flat(seqs)
    s, _, _ = pr.search_flat(
        jnp.asarray(pr.make_profiles_host([q], S_big), jnp.bfloat16),
        jnp.asarray([300], jnp.int32),
        jnp.asarray(fp.flat_targets),
        jnp.asarray(fp.lengths),
        jnp.asarray(fp.block_of_step),
        jnp.asarray(fp.chunk_of_step),
        jnp.asarray(fp.last_of_step),
        3, 1, "sw", False, interpret=True,
        chunk=fp.chunk, safe_pad=True,
    )
    s = np.asarray(s).reshape(-1)
    idx = fp.indices.reshape(-1)
    for pos in np.nonzero(idx >= 0)[0]:
        ns, _, _ = naive.score_end(q, seqs[idx[pos]], S_big, 3, 1, "sw")
        assert ns == s[pos], (idx[pos], ns, s[pos])
    assert max(s[pos] for pos in np.nonzero(idx >= 0)[0]) == 60000


def test_ragged_supports_mode_aware():
    """safe_pad (v2 kernel) reaches 4096 in every mode; without it,
    tiers above 2048 are score-only (v1 strip kernel)."""
    from pyopal_tpu.ops import pallas_ragged as pr

    assert pr.supports(2048, "nw", True, False)
    assert pr.supports(3000, "sw", False, True)
    assert pr.supports(3000, "sw", True, True)   # v2: ends at 4096 tier
    assert pr.supports(4096, "ov", True, True)
    assert pr.supports(3000, "nw", False, False)
    assert pr.supports(4096, "ov", False, False)
    assert not pr.supports(3000, "sw", True, False)  # v1: ends cap 2048
    assert not pr.supports(4097, "sw", False, True)  # beyond ceiling
    assert not pr.supports(0)
    # default (mode-less, non-safe) callers keep the conservative ceiling
    assert pr.supports(2048) and not pr.supports(2049)


def test_traceback_oversized_pair_scalar_fallback(monkeypatch):
    """A pair whose padded direction matrix exceeds the device budget
    must take the scalar fallback and still match the oracle."""
    from pyopal_tpu.ops import traceback as tb

    monkeypatch.setattr(tb, "MAX_DEVICE_CELLS", 2048)
    rng = np.random.default_rng(23)
    q = rng.integers(0, 24, 30).astype(np.uint8)
    # lengths straddle the shrunken budget: 30 * round128(200) > 2048
    targets = [
        rng.integers(0, 24, int(L)).astype(np.uint8)
        for L in (5, 40, 200, 300)
    ]
    for algo in ALGOS:
        ends = ([], [], [])
        for t in targets:
            s_, qe_, te_ = naive.score_end(q, t, S, 3, 1, algo)
            ends[0].append(s_)
            ends[1].append(qe_)
            ends[2].append(te_)
        outs = tb.full_alignments_batch(q, targets, S, 3, 1, algo, ends)
        for i, t in enumerate(targets):
            want = naive.traceback(q, t, S, 3, 1, algo)
            assert outs[i][:5] == want[:5], (algo, i)
            assert np.array_equal(outs[i][5], want[5]), (algo, i)


def test_host_walk_mirrors_device_walk():
    """`traceback._walk` is the readable host mirror of the on-device
    walk; pin their equivalence so neither drifts."""
    import jax.numpy as jnp

    from pyopal_tpu.models import ALGORITHMS
    from pyopal_tpu.ops import traceback as tb
    from pyopal_tpu.results import OP_MATCH, OP_MISMATCH, OP_INS, OP_DEL

    rng = np.random.default_rng(29)
    for go, ge in [(3, 1), (1, 3)]:
        for algo in ALGOS:
            spec = ALGORITHMS[algo]
            Q = int(rng.integers(2, 24))
            q = rng.integers(0, 24, Q).astype(np.uint8)
            targets = [
                rng.integers(0, 24, int(L)).astype(np.uint8)
                for L in rng.integers(1, 50, 6)
            ]
            prof = np.asarray(S, np.int32)[q.astype(np.int64), :]
            t_pad = max(len(t) for t in targets)
            tgt = np.zeros((len(targets), t_pad), np.int32)
            for k, t in enumerate(targets):
                tgt[k, : len(t)] = t
            dirs = np.asarray(
                tb._dir_matrix_batch(
                    jnp.asarray(prof), jnp.asarray(tgt), go, ge, algo
                )
            )
            for k, t in enumerate(targets):
                s_, qe, te = naive.score_end(q, t, S, go, ge, algo)
                if algo == "sw" and (qe < 0 or te < 0):
                    continue
                qs, ts, ops = tb._walk(
                    dirs[k], spec, 0, int(qe), int(te), go, ge
                )
                ops = np.asarray(ops, np.uint8)
                # refine M -> X like full_alignments_batch does
                consumes_q = ops != OP_INS
                consumes_t = ops != OP_DEL
                qpos = qs + np.cumsum(consumes_q) - consumes_q
                tpos = ts + np.cumsum(consumes_t) - consumes_t
                m = np.nonzero(ops == OP_MATCH)[0]
                mism = q[qpos[m]] != t[tpos[m]]
                ops[m[mism]] = OP_MISMATCH
                want = naive.traceback(q, t, S, go, ge, algo)
                assert (qs, ts) == (want[1], want[2]), (go, ge, algo, k)
                assert np.array_equal(ops, want[5]), (go, ge, algo, k)


def test_xla_engine_exact_beyond_fp32_window():
    """The XLA engine is the exactness fallback: matrix entries past
    2**24 (where an f32 one-hot dot rounds) must score exactly."""
    import jax.numpy as jnp

    big = 2**24 + 3
    mat = np.full((4, 4), -1, np.int32)
    np.fill_diagonal(mat, big)
    q = np.array([0, 1, 2], np.uint8)
    t = np.array([0, 1, 2], np.uint8)
    s, qe, te = naive.score_end(q, t, mat, 3, 1, "sw")
    assert s == 3 * big
    prof = xla.make_profile_t(q, mat)
    got_s, got_qe, got_te = (
        np.asarray(x)
        for x in xla.search_block(
            jnp.asarray(prof),
            jnp.asarray(t[:, None].astype(np.int32)),
            jnp.asarray(np.array([3], np.int32)),
            3,
            1,
            "sw",
        )
    )
    assert int(got_s[0]) == 3 * big
    assert (int(got_qe[0]), int(got_te[0])) == (qe, te)
