"""`pyopal_tpu.parallel.align_arrays_sharded` on the 8-device CPU mesh.

Sharding must never change scores (the reference pins the analogous
invariant for thread-chunking: global target indexing at
``/root/reference/src/pyopal/platform/pyx.in:67-69`` and thread-count
invariance in ``/root/reference/src/pyopal/tests/test_align.py:9-41``).
Every test compares the mesh path against the single-device
`Aligner.align_arrays` reference on the same inputs.
"""

import random

import numpy as np
import pytest

import pyopal_tpu as po
from pyopal_tpu.parallel import align_arrays_sharded

AMINO = "ARNDCQEGHILKMFPSTWYV"


def _random_db(n, lo, hi, seed):
    rng = random.Random(seed)
    return po.Database(
        "".join(rng.choice(AMINO) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    )


def _random_queries(n, lo, hi, seed):
    rng = random.Random(seed)
    return [
        "".join(rng.choice(AMINO) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


def _reference(queries, db, **kw):
    aligner = po.Aligner(
        kw.get("scoring_matrix"),
        gap_open=kw.get("gap_open", 3),
        gap_extend=kw.get("gap_extend", 1),
    )
    return aligner.align_arrays(
        queries,
        db,
        mode=kw.get("mode", "score"),
        algorithm=kw.get("algorithm", "sw"),
        start=kw.get("start", 0),
        end=kw.get("end", 0xFFFFFFFF),
    )


def _check(queries, db, **kw):
    got = align_arrays_sharded(queries, db, **kw)
    want = _reference(queries, db, **kw)
    np.testing.assert_array_equal(got["scores"], want["scores"])
    if kw.get("mode") in ("end", "full"):
        np.testing.assert_array_equal(
            got["query_ends"], want["query_ends"]
        )
        np.testing.assert_array_equal(
            got["target_ends"], want["target_ends"]
        )
    if kw.get("mode") == "full":
        np.testing.assert_array_equal(
            got["query_starts"], want["query_starts"]
        )
        np.testing.assert_array_equal(
            got["target_starts"], want["target_starts"]
        )
        assert got["cigars"].tolist() == want["cigars"].tolist()


def test_import_line_from_docstring():
    # the documented import path must work (module docstring example)
    from pyopal_tpu.parallel import align_arrays_sharded as f

    assert f is align_arrays_sharded


def test_toy_db_scores():
    db = po.Database(["AACCGCTG", "ATGCGCT", "TTATTACG"])
    out = align_arrays_sharded(["ACCTG"], db, gap_open=2)
    assert out["scores"][0].tolist() == [41, 31, 23]


def test_v2_remainder_cohort():
    # 3 queries of one tier: below QB=8, all take the v2 remainder path
    db = _random_db(40, 10, 60, seed=1)
    queries = _random_queries(3, 12, 40, seed=2)
    _check(queries, db)


def test_q8_full_groups():
    # 16 same-tier queries: two full q8 groups, no remainder
    db = _random_db(50, 10, 80, seed=3)
    queries = _random_queries(16, 30, 60, seed=4)
    _check(queries, db)


def test_q8_groups_plus_remainder_end_mode():
    # 11 same-tier queries: one q8 group + 3 v2 remainders, end mode
    db = _random_db(45, 8, 70, seed=5)
    queries = _random_queries(11, 30, 60, seed=6)
    _check(queries, db, mode="end")


def test_mixed_tiers():
    # queries spanning two profile tiers dispatch as separate cohorts
    db = _random_db(30, 10, 50, seed=7)
    queries = _random_queries(5, 10, 50, seed=8) + _random_queries(
        9, 70, 120, seed=9
    )
    _check(queries, db, mode="end")


@pytest.mark.parametrize("algorithm", ["nw", "hw", "ov", "sw"])
def test_algorithms(algorithm):
    db = _random_db(25, 10, 40, seed=10)
    queries = _random_queries(4, 15, 30, seed=11)
    _check(queries, db, algorithm=algorithm, mode="end")


def test_database_slice():
    # a sliced sub-database shards and scores like any database
    db = _random_db(40, 10, 60, seed=12)
    sub = db[5:29]
    queries = _random_queries(9, 20, 50, seed=13)
    _check(queries, sub, mode="end")


def test_small_db_fewer_targets_than_shards():
    # 3 targets over an 8-device mesh: most shards run empty layouts
    db = po.Database(["AACCGCTG", "ATGCGCT", "TTATTACG"])
    queries = _random_queries(9, 10, 30, seed=14)
    _check(queries, db, mode="end")


def test_empty_inputs():
    db = _random_db(10, 10, 20, seed=15)
    out = align_arrays_sharded([], db)
    assert out["scores"].shape == (0, 10)
    empty = po.Database([])
    out = align_arrays_sharded(["ACDEF"], empty, mode="end")
    assert out["scores"].shape == (1, 0)
    assert out["query_ends"].shape == (1, 0)


def test_repacking_cached_across_calls():
    # repeat calls must reuse the sharded pack (version-keyed cache);
    # the sharded flat pack is only built by the Pallas mesh route, so
    # force it via the interpret hook on this CPU backend
    from pyopal_tpu.ops import engine

    db = _random_db(20, 10, 30, seed=16)
    queries = _random_queries(2, 10, 20, seed=17)
    engine._INTERPRET = True
    try:
        align_arrays_sharded(queries, db)
        cached = [k for k in db._pack_cache if k[0] == "sharded"]
        assert cached
        before = {k: id(v) for k, v in db._pack_cache.items()}
        align_arrays_sharded(queries, db)
        after = {k: id(v) for k, v in db._pack_cache.items()}
        assert before == after
        # mutation invalidates: version key changes
        db.append("ACDEF")
        align_arrays_sharded(queries, db)
        assert all(
            k not in db._pack_cache for k in before if k[0] == "sharded"
        )
    finally:
        engine._INTERPRET = False


def test_validation_errors():
    db = _random_db(5, 10, 20, seed=18)
    with pytest.raises(ValueError):
        align_arrays_sharded(["ACDEF"], db, mode="banana")
    with pytest.raises(ValueError):
        align_arrays_sharded(["ACDEF"], db, algorithm="bogus")
    with pytest.raises(IndexError):
        align_arrays_sharded(["ACDEF"], db, start=-1)
    with pytest.raises(IndexError):
        align_arrays_sharded(["ACDEF"], db, start=4, end=2)


def test_full_mode_matches_single_device():
    # mode="full" on the mesh front-end: scores/ends/starts/cigars all
    # equal the single-device align_arrays reference
    db = _random_db(30, 5, 50, seed=41)
    queries = _random_queries(3, 15, 40, seed=42)
    for algorithm in ("sw", "nw"):
        _check(queries, db, mode="full", algorithm=algorithm)


def test_full_mode_cigars_match_objects():
    # the columnar cigars equal FullResult.cigar() from align()
    db = _random_db(12, 5, 30, seed=43)
    queries = _random_queries(2, 10, 25, seed=44)
    out = align_arrays_sharded(queries, db, mode="full")
    aligner = po.Aligner()
    for qi, q in enumerate(queries):
        want = aligner.align(q, db, mode="full")
        for ti, hit in enumerate(want):
            assert out["cigars"][qi][ti] == hit.cigar()
            assert out["query_starts"][qi][ti] == hit._query_start
            assert out["target_starts"][qi][ti] == hit._target_start


def test_slice_start_end():
    # start/end restrict the searched slice; scores stay slice-local
    # like the single-device columnar front-end
    db = _random_db(40, 10, 60, seed=45)
    queries = _random_queries(4, 15, 40, seed=46)
    for mode in ("score", "end", "full"):
        _check(queries, db, mode=mode, start=7, end=31)
    # end beyond the database clamps
    _check(queries, db, mode="end", start=35, end=10_000)


def test_non_tpu_mesh_takes_xla_engine_not_interpret():
    """On a non-TPU backend the mesh front-ends must run the int32 XLA
    engine per shard — never interpret-mode Pallas (a perf trap: orders
    of magnitude slower than the XLA engine on CPU meshes)."""
    from pyopal_tpu.ops import pallas_q8, pallas_ragged
    from pyopal_tpu.parallel import align_top_k_sharded

    db = _random_db(30, 5, 50, seed=51)
    queries = _random_queries(9, 15, 40, seed=52)

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("Pallas kernel dispatched on a CPU mesh")

    orig_flat = pallas_ragged.search_flat
    orig_q8 = pallas_q8.search_flat_q8
    pallas_ragged.search_flat = boom
    pallas_q8.search_flat_q8 = boom
    try:
        _check(queries, db, mode="end")
        got = align_top_k_sharded(queries[:2], db, k=5)
    finally:
        pallas_ragged.search_flat = orig_flat
        pallas_q8.search_flat_q8 = orig_q8
    aligner = po.Aligner()
    for qi, q in enumerate(queries[:2]):
        assert got[qi] == aligner.align_top_k(q, db, k=5), qi


def test_interpret_hook_keeps_pallas_mesh_path_testable():
    """engine._INTERPRET forces the Pallas mesh route (interpreted) on
    any backend, so its dispatch bookkeeping stays testable."""
    from pyopal_tpu.ops import engine

    db = _random_db(20, 5, 40, seed=53)
    queries = _random_queries(9, 15, 40, seed=54)
    engine._INTERPRET = True
    try:
        _check(queries, db, mode="end")
    finally:
        engine._INTERPRET = False


def test_top_k_sharded_slice():
    from pyopal_tpu.parallel import align_top_k_sharded

    db = _random_db(80, 5, 70, seed=47)
    queries = _random_queries(2, 20, 40, seed=48)
    got = align_top_k_sharded(queries, db, k=5, start=10, end=60)
    aligner = po.Aligner()
    for qi, q in enumerate(queries):
        want = aligner.align_top_k(q, db, k=5, start=10, end=60)
        assert got[qi] == want, qi


def test_empty_query_matches_single_device():
    # zero-length queries must take the engine's empty-query path, not
    # the Pallas kernels' NEG sentinel
    db = _random_db(5, 4, 12, seed=71)
    for algorithm in ("nw", "sw", "hw", "ov"):
        _check(["", "ACGTR"], db, algorithm=algorithm, mode="end")


def test_large_matrix_falls_back_to_int32_engine():
    # |entries| > 256 leave the bf16-exact profile window: the mesh
    # path must route to the single-device int32 engine, same scores
    big = po.ScoringMatrix.from_match_mismatch(500, -400, AMINO)
    rng = random.Random(72)
    db = po.Database(
        (
            "".join(rng.choice(AMINO) for _ in range(rng.randint(5, 20)))
            for _ in range(6)
        ),
        alphabet=big.alphabet,
    )
    queries = _random_queries(3, 4, 10, seed=73)
    _check(queries, db, scoring_matrix=big, algorithm="sw")


def test_out_of_fp32_domain_falls_back():
    # gap_open beyond the fp32 exact-integer window (test pinned on the
    # single-device path in test_engine_dispatch) must not run the
    # fp32 kernels
    db = _random_db(4, 5, 15, seed=74)
    queries = _random_queries(2, 4, 8, seed=75)
    _check(queries, db, gap_open=2**25, algorithm="nw")


def test_negative_gap_parameters_fall_back():
    # gap bonuses void every static magnitude bound; results must
    # still match the int32 reference engine
    db = _random_db(4, 5, 15, seed=76)
    queries = _random_queries(2, 4, 8, seed=77)
    _check(queries, db, gap_open=-2, gap_extend=-1, algorithm="sw")


def test_sharded_search_flat_nondefault_lanes():
    # direct use of the v2 mesh launch with a wide pack: the gather
    # permutation must derive the lane width from the pack, not the
    # 128-lane module constant
    import jax
    import jax.numpy as jnp

    from pyopal_tpu.ops import naive, pallas_ragged as pr
    from pyopal_tpu.parallel import sharded_flat as sfm
    from pyopal_tpu.parallel.mesh import device_mesh

    rng = np.random.default_rng(81)
    al = po.Aligner()
    S = al.scoring_matrix.int_data()
    seqs = [
        rng.integers(0, 20, int(L)).astype(np.uint8)
        for L in rng.integers(3, 40, 10)
    ]
    q = rng.integers(0, 20, 12).astype(np.uint8)
    sf = sfm.pack_flat_sharded(seqs, n_shards=8, lanes=256)
    profs = jnp.asarray(
        pr.make_profiles_host([q], S), jnp.bfloat16
    )
    qlens = jnp.asarray(np.array([len(q)], np.int32))
    s, qe, te = sfm.sharded_search_flat(
        device_mesh(), profs, qlens, sf, 3, 1, "sw",
        with_ends=True, interpret=True, safe_pad=True,
    )
    for i, t in enumerate(seqs):
        ws, wqe, wte = naive.score_end(q, t, S, 3, 1, "sw")
        assert (int(s[0, i]), int(qe[0, i]), int(te[0, i])) == (
            ws, wqe, wte,
        ), i


# --- align_top_k_sharded ----------------------------------------------------


class TestAlignTopKSharded:
    """The O(k)-communication top-k pipeline == `Aligner.align_top_k`."""

    def _check(self, queries, db, k, **kw):
        from pyopal_tpu.parallel import align_top_k_sharded

        got = align_top_k_sharded(queries, db, k=k, **kw)
        aligner = po.Aligner(
            kw.get("scoring_matrix"),
            gap_open=kw.get("gap_open", 3),
            gap_extend=kw.get("gap_extend", 1),
        )
        for qi, q in enumerate(queries):
            want = aligner.align_top_k(
                q, db, k=k, algorithm=kw.get("algorithm", "sw")
            )
            assert len(got[qi]) == len(want), qi
            for x, y in zip(got[qi], want):
                assert x == y, (qi, x, y)

    def test_matches_single_device_sw(self):
        db = _random_db(300, 5, 120, seed=11)
        self._check(_random_queries(3, 40, 60, seed=12), db, k=13)

    def test_matches_single_device_nw_ov(self):
        db = _random_db(220, 5, 90, seed=13)
        qs = _random_queries(2, 30, 50, seed=14)
        self._check(qs, db, k=7, algorithm="nw")
        self._check(qs, db, k=7, algorithm="ov")

    def test_k_exceeds_database(self):
        db = _random_db(25, 5, 60, seed=15)
        self._check(_random_queries(2, 20, 40, seed=16), db, k=100)

    def test_tie_escalation(self):
        # many identical targets force equal scores straddling every
        # shard's candidate floor: the merge must escalate and still
        # pick the k smallest global indices among the ties
        rng = random.Random(17)
        base = "".join(rng.choice(AMINO) for _ in range(40))
        targets = [base] * 120 + [
            "".join(rng.choice(AMINO) for _ in range(rng.randint(10, 80)))
            for _ in range(80)
        ]
        rng.shuffle(targets)
        db = po.Database(targets)
        self._check([base], db, k=15)

    def test_fallback_paths(self):
        # empty query and a long query beyond the mesh tier fall back
        # to the single-device engine with identical results
        rng = random.Random(18)
        db = _random_db(60, 5, 80, seed=19)
        long_q = "".join(rng.choice(AMINO) for _ in range(5000))
        self._check(["", long_q], db, k=5)

    def test_mixed_tiers(self):
        db = _random_db(150, 5, 100, seed=20)
        qs = ["".join(random.Random(21 + i).choice(AMINO)
                      for _ in range((i + 1) * 70)) for i in range(3)]
        self._check(qs, db, k=9)

    def test_validation(self):
        from pyopal_tpu.parallel import align_top_k_sharded

        db = _random_db(10, 5, 20, seed=22)
        with pytest.raises(ValueError):
            align_top_k_sharded(["AA"], db, k=-1)
        with pytest.raises(ValueError):
            align_top_k_sharded(["AA"], db, algorithm="zz")
        assert align_top_k_sharded([], db, k=3) == []
        assert align_top_k_sharded(["AA"], po.Database(), k=3) == [[]]


def test_route_follows_mesh_devices_not_default_backend():
    # the engine-route decision must read the MESH's platform: a CPU
    # mesh on any host takes the XLA route
    from pyopal_tpu.parallel import api as papi
    from pyopal_tpu.parallel.mesh import device_mesh

    assert papi._mesh_platform(device_mesh()) == "cpu"


def test_seeded_random_config_sweep():
    # seeded property sweep over the mesh front-end: random symmetric
    # matrices, gap params (incl. ge > go), modes, algorithms and slice
    # args must all equal the single-device columnar API bit-for-bit
    from pyopal_tpu import ScoringMatrix

    alphabet = "ARNDCQEGHILKMFPSTWYVBZX*"
    for trial in range(6):
        rng = np.random.default_rng(3000 + trial)
        pyr = random.Random(3000 + trial)
        M = rng.integers(-9, 13, (24, 24))
        M = np.tril(M) + np.tril(M, -1).T
        mat = ScoringMatrix(M.astype(np.float32), alphabet)
        db = _random_db(
            int(rng.integers(20, 90)), 1, int(rng.integers(20, 120)),
            seed=pyr.randint(0, 10**6),
        )
        queries = _random_queries(
            int(rng.integers(1, 10)), 5, 70, seed=pyr.randint(0, 10**6)
        )
        go, ge = int(rng.integers(0, 6)), int(rng.integers(0, 6))
        mode = ("score", "end", "full")[trial % 3]
        algorithm = ("sw", "nw", "hw", "ov")[trial % 4]
        start = int(rng.integers(0, 3))
        end = int(rng.integers(len(db) - 2, len(db) + 2))
        _check(
            queries,
            db,
            scoring_matrix=mat,
            gap_open=go,
            gap_extend=ge,
            mode=mode,
            algorithm=algorithm,
            start=start,
            end=end,
        )
