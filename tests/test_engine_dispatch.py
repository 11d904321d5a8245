"""Engine Pallas-dispatch bookkeeping on CPU (interpreted kernels).

`engine._search_batch_pallas` — cohort planning by query tier, q8
group formation and splitting across launch quanta
(`_Q8_LAUNCH_GROUPS`), v2 remainders, on-device assembly, and the
single readback — normally only runs on TPU.  The `engine._INTERPRET`
hook runs the same code with interpreted kernels, so its index
bookkeeping is pinned against the (oracle-validated) XLA path without
hardware.  Reference analog: the generated platform shims' result
wiring, `/root/reference/src/pyopal/platform/pyx.in:43-99`.
"""

import numpy as np
import pytest

import pyopal_tpu as po
from pyopal_tpu.ops import engine

LETTERS = "ARNDCQEGHILKMFPSTWYV"


def _random_seq(rng, n):
    return "".join(LETTERS[i] for i in rng.integers(0, 20, n))


@pytest.fixture()
def db():
    rng = np.random.default_rng(11)
    lens = [0, 1, 5, 63, 64, 65, 127, 128, 129, 40, 33, 7, 200, 90, 11, 2]
    return po.Database([_random_seq(rng, n) for n in lens])


def _encode(alphabet, queries):
    return [
        np.frombuffer(alphabet.encode(q), dtype=np.uint8) for q in queries
    ]


@pytest.mark.parametrize("algorithm", ["sw", "nw"])
def test_pallas_dispatch_matches_xla(db, algorithm, monkeypatch):
    """17 short + 2 mid queries: two full q8 groups split across two
    single-group launches (quantum=1), a one-query v2 remainder, and a
    second-tier cohort — all assembled back into query order."""
    rng = np.random.default_rng(5)
    matrix = po.Aligner().scoring_matrix.int_data()
    qlens = [64, 60, 55, 50, 45, 40, 35, 30, 25, 20, 15, 10, 8, 6, 5, 4, 3]
    qlens += [100, 90]  # tier-128 cohort (v2: fewer than a q8 group)
    queries = _encode(db.alphabet, [_random_seq(rng, n) for n in qlens])

    ref = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, algorithm, with_ends=True
    )

    monkeypatch.setattr(engine, "_INTERPRET", True)
    monkeypatch.setattr(engine, "_Q8_LAUNCH_GROUPS", 1)
    got = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, algorithm, with_ends=True
    )

    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_dispatch_tier512_q8_lanes(db, monkeypatch):
    """Tier-512 queries ride q8 at its narrower 256-lane width
    (`_Q8_LANES_BY_TIER`); the wide-tier packing must assemble back to
    the XLA path's results bit-exactly."""
    rng = np.random.default_rng(13)
    matrix = po.Aligner().scoring_matrix.int_data()
    # all > 256 (tier 512); kept near the tier floor because the
    # interpreted q8 row loop runs to the group max length
    qlens = [300, 285, 278, 270, 265, 262, 258, 257]
    queries = _encode(db.alphabet, [_random_seq(rng, n) for n in qlens])

    ref = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, "sw", with_ends=True
    )
    assert engine._Q8_LANES_BY_TIER.get(512) is not None
    monkeypatch.setattr(engine, "_INTERPRET", True)
    got = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, "sw", with_ends=True
    )
    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_fp32_domain_guard_routes_to_xla(db, monkeypatch):
    """Calls whose DP values could leave fp32's exact-integer window
    (+-2**24) must take the int32 XLA engine, not the fp32 Pallas
    kernels — the narrow path is never silently wrong (reference
    escalation semantics, lib.pyx:1283-1289)."""
    rng = np.random.default_rng(21)
    matrix = po.Aligner().scoring_matrix.int_data()
    queries = _encode(db.alphabet, [_random_seq(rng, 30)])

    calls = []
    real_pallas = engine._search_batch_pallas
    real_xla = engine._search_batch_xla
    monkeypatch.setattr(
        engine,
        "_search_batch_pallas",
        lambda *a, **k: calls.append("pallas") or real_pallas(*a, **k),
    )
    monkeypatch.setattr(
        engine,
        "_search_batch_xla",
        lambda *a, **k: calls.append("xla") or real_xla(*a, **k),
    )
    monkeypatch.setattr(engine, "_INTERPRET", True)

    # in-domain: rides Pallas
    engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, "nw", with_ends=True
    )
    assert calls == ["pallas"]

    # a gap chain alone exceeds 2**24: must fall back to int32 XLA
    calls.clear()
    got = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 2**25, 1, "nw", with_ends=True
    )
    assert calls == ["xla"]
    ref = real_xla(
        db, 0, len(db), queries, matrix, 2**25, 1, "nw", True
    )
    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_fp32_domain_bound_is_conservative(db):
    """The static bound covers the stress envelope (35k residues at
    |matrix|<=13) but trips on adversarial magnitude combinations."""
    q = [np.zeros(35000, np.uint8)]
    m13 = np.full((25, 25), 13, np.int32)
    assert engine._fp32_exact_domain(db, 0, len(db), q, m13, 3, 1)
    m256 = np.full((25, 25), 256, np.int32)
    q2 = [np.zeros(70000, np.uint8)]
    assert not engine._fp32_exact_domain(db, 0, len(db), q2, m256, 3, 1)


def test_dispatch_long_query_fallback(db, monkeypatch):
    """Queries beyond the ragged tier route through the segmented
    kernel (`engine._search_long_pallas`), whose single stacked
    readback must land in the same global order."""
    from pyopal_tpu.ops import pallas_ragged as pr
    from pyopal_tpu.ops import pallas_ragged_long as prl

    rng = np.random.default_rng(17)
    matrix = po.Aligner().scoring_matrix.int_data()
    queries = _encode(db.alphabet, [_random_seq(rng, 70)])

    ref = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, "sw", with_ends=True
    )
    monkeypatch.setattr(engine, "_INTERPRET", True)
    monkeypatch.setattr(prl, "QSEG", 32)  # force 3 segments
    monkeypatch.setattr(pr, "supports", lambda *a, **k: False)
    got = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, 3, 1, "sw", with_ends=True
    )
    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_dispatch_with_slice_and_empty_query(db, monkeypatch):
    """Slices and empty queries route through the same bookkeeping."""
    rng = np.random.default_rng(9)
    matrix = po.Aligner().scoring_matrix.int_data()
    queries = _encode(
        db.alphabet, ["", _random_seq(rng, 30), _random_seq(rng, 64)]
    )
    # plus enough same-tier queries to form one full q8 group
    queries += _encode(
        db.alphabet, [_random_seq(rng, 40) for _ in range(7)]
    )

    ref = engine.search_scores_batch(
        db, 3, 12, queries, matrix, 2, 2, "ov", with_ends=True
    )
    monkeypatch.setattr(engine, "_INTERPRET", True)
    got = engine.search_scores_batch(
        db, 3, 12, queries, matrix, 2, 2, "ov", with_ends=True
    )
    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pack_rows_i16_round_trip():
    """Device row-pair packing and host unpack are exact inverses for
    the full int16 range, odd row counts, and 3-plane (ends) layouts."""
    rng = np.random.default_rng(4)
    for shape in ((1, 7), (2, 5), (5, 9), (4, 3, 6)):
        x = rng.integers(-(2**15), 2**15, shape).astype(np.int32)
        x.reshape(-1)[:4] = (-(2**15), 2**15 - 1, -1, 0)
        packed = np.asarray(engine._pack_rows_i16(x))
        assert packed.shape[0] == (shape[0] + 1) // 2
        out = engine._unpack_rows_i16(packed, shape[0])
        np.testing.assert_array_equal(out, x)


def test_negative_gap_parameters_route_to_xla(db, monkeypatch):
    """Gap *bonuses* (negative go/ge) void the static magnitude bounds
    behind the fp32 Pallas path and the int16 readback packing; such
    calls must ride the int32 XLA engine and match it exactly."""
    rng = np.random.default_rng(33)
    matrix = po.Aligner().scoring_matrix.int_data()
    queries = _encode(db.alphabet, [_random_seq(rng, 24)])

    assert not engine._fp32_exact_domain(
        db, 0, len(db), queries, matrix, -300, -300
    )
    assert not engine._pack16_domain(
        db, 0, len(db), queries, matrix, -300, -300
    )

    calls = []
    real_xla = engine._search_batch_xla
    monkeypatch.setattr(
        engine,
        "_search_batch_xla",
        lambda *a, **k: calls.append("xla") or real_xla(*a, **k),
    )
    monkeypatch.setattr(engine, "_INTERPRET", True)
    got = engine.search_scores_batch(
        db, 0, len(db), queries, matrix, -300, -300, "sw", with_ends=True
    )
    assert calls == ["xla"]
    ref = real_xla(
        db, 0, len(db), queries, matrix, -300, -300, "sw", True
    )
    for name, a, b in zip(("scores", "q_ends", "t_ends"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


class TestFineTierLongQueries:
    """Long queries route to ONE fine-tier v2 launch when the scratch
    fits the VMEM budget, else to the segmented kernel (measured
    +19-21% at 5000 aa, experiments/bench_long_fine.py)."""

    def test_fine_qpad_quantum(self):
        from pyopal_tpu.ops import pallas_ragged as pr

        assert pr.fine_qpad(5000) == 5120
        assert pr.fine_qpad(4097) == 4608
        assert pr.fine_qpad(1) == pr.FINE_QUANTUM
        assert pr.fine_qpad(5120) == 5120
        # fine tiers always divide by the strip height
        for q in (4100, 5000, 7300, 9000):
            assert pr.fine_qpad(q) % pr.STRIP == 0

    def test_supports_fine_budget(self):
        from pyopal_tpu.ops import pallas_ragged as pr

        assert pr.supports_fine(5000, "sw", False)
        assert pr.supports_fine(5000, "sw", True)
        assert pr.supports_fine(5000, "ov", True)
        # far beyond the VMEM budget: segmented kernel territory
        assert not pr.supports_fine(35000, "sw", False)
        assert not pr.supports_fine(0, "sw", False)
        # budget respects the per-algorithm scratch count
        assert pr.v2_scratch_bytes(5120, "ov", True) > pr.v2_scratch_bytes(
            5120, "sw", False
        )

    def test_fine_tier_path_matches_oracle(self):
        """A > 4096-aa query through the public API (interpret hook)
        equals the scalar oracle — pins the fine-tier launch end to
        end, including profile construction at a non-power-of-two
        tier."""
        import pyopal_tpu as po
        from pyopal_tpu.ops import engine, naive

        rng = np.random.default_rng(9)
        AL = "ARNDCQEGHILKMFPSTWYV"
        db = po.Database(
            "".join(AL[c] for c in rng.integers(0, 20, int(L)))
            for L in (0, 25, 64, 90)
        )
        q = "".join(AL[c] for c in rng.integers(0, 20, 4200))
        al = po.Aligner()
        S = al.scoring_matrix.int_data()
        qe = np.frombuffer(db.alphabet.encode(q), np.uint8)
        engine._INTERPRET = True
        try:
            hits = al.align(q, db, mode="end", algorithm="sw")
        finally:
            engine._INTERPRET = False
        for i in range(len(db)):
            te = np.frombuffer(db.alphabet.encode(db[i]), np.uint8)
            ws, wqe, wte = naive.score_end(qe, te, S, 3, 1, "sw")
            assert (hits[i].score, hits[i].query_end, hits[i].target_end) == (
                ws, wqe, wte,
            ), i
