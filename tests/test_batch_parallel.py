"""align_batch + sharded multi-device search tests (8-device CPU mesh)."""

import random

import numpy as np
import pytest

import pyopal_tpu
import pyopal_tpu as po
from pyopal_tpu import Aligner, Database


def _random_db(rng, n=40):
    letters = "ARNDCQEGHILKMFPSTWYV"
    return [
        "".join(rng.choice(list(letters), size=rng.integers(3, 60)))
        for _ in range(n)
    ]


class TestAlignBatch:
    def test_matches_single(self):
        rng = np.random.default_rng(0)
        seqs = _random_db(rng)
        db = Database(seqs)
        queries = ["MKTAYIAK", "ACDEFGHIKLMNP", "WWWW"]
        al = Aligner()
        for mode in ("score", "end"):
            batch = al.align_batch(queries, db, mode=mode)
            for qi, q in enumerate(queries):
                single = al.align(q, db, mode=mode)
                assert len(batch[qi]) == len(single)
                for a, b in zip(batch[qi], single):
                    assert a.target_index == b.target_index
                    assert a.score == b.score
                    if mode == "end":
                        assert a.query_end == b.query_end
                        assert a.target_end == b.target_end

    def test_mixed_query_lengths(self):
        rng = np.random.default_rng(1)
        db = Database(_random_db(rng, 20))
        queries = ["M", "MK" * 40, "MKT" * 60]
        al = Aligner()
        batch = al.align_batch(queries, db, algorithm="nw")
        for qi, q in enumerate(queries):
            single = al.align(q, db, algorithm="nw")
            assert [r.score for r in batch[qi]] == [r.score for r in single]

    def test_align_top_k_matches_full(self):
        rng = np.random.default_rng(5)
        seqs = _random_db(rng, 30)
        db = Database(seqs)
        al = Aligner()
        query = "MKTAYIAKQR"
        top = al.align_top_k(query, db, k=7)
        assert len(top) == 7
        # sorted by descending score, ties by database order
        scores = [h.score for h in top]
        assert scores == sorted(scores, reverse=True)
        full = al.align(query, db, mode="full")
        want = sorted(
            range(len(full)), key=lambda i: (-full[i].score, i)
        )[:7]
        assert [h.target_index for h in top] == want
        for h in top:
            ref = full[h.target_index]
            assert h == ref, (h, ref)

    def test_align_top_k_edges(self):
        db = Database(["MKT", "AAA"])
        al = Aligner()
        assert al.align_top_k("MKT", db, k=0) == []
        assert al.align_top_k("MKT", Database([]), k=5) == []
        assert len(al.align_top_k("MKT", db, k=100)) == 2
        with pytest.raises(ValueError):
            al.align_top_k("MKT", db, k=-1)
        with pytest.raises(ValueError):
            al.align_top_k("MKT", db, algorithm="nonsense")
        # slice narrows the candidate pool but keeps global indices
        hits = al.align_top_k("MKT", db, k=5, start=1)
        assert [h.target_index for h in hits] == [1]

    def test_full_mode_matches_single(self):
        rng = np.random.default_rng(9)
        db = Database(_random_db(rng, 15))
        queries = ["MKTAYIAK", "ACDEFGHIKLMNP"]
        al = Aligner()
        for algorithm in ("sw", "nw", "ov"):
            batch = al.align_batch(queries, db, mode="full",
                                   algorithm=algorithm)
            for qi, q in enumerate(queries):
                single = al.align(q, db, mode="full", algorithm=algorithm)
                assert batch[qi] == single, (algorithm, qi)

    def test_full_mode_arrays_columnar(self):
        rng = np.random.default_rng(10)
        db = Database(_random_db(rng, 12))
        queries = ["MKTAYIAK", "WWWW"]
        al = Aligner()
        out = al.align_arrays(queries, db, mode="full")
        assert set(out) == {
            "scores", "query_ends", "target_ends",
            "query_starts", "target_starts", "cigars",
        }
        for qi, q in enumerate(queries):
            want = al.align(q, db, mode="full")
            for ti, hit in enumerate(want):
                assert out["scores"][qi, ti] == hit.score
                assert out["query_ends"][qi, ti] == hit.query_end
                assert out["target_ends"][qi, ti] == hit.target_end
                assert out["query_starts"][qi, ti] == hit._query_start
                assert out["target_starts"][qi, ti] == hit._target_start
                assert out["cigars"][qi, ti] == hit.cigar()

    def test_full_mode_empty_slice_shapes(self):
        db = Database(["MKT", "AAA"])
        out = Aligner().align_arrays(["M"], db, mode="full",
                                     start=2, end=2)
        assert out["scores"].shape == (1, 0)
        assert out["cigars"].shape == (1, 0)

    def test_invalid_mode_rejected(self):
        db = Database(["MKT"])
        with pytest.raises(ValueError):
            Aligner().align_batch(["M"], db, mode="banana")
        with pytest.raises(ValueError):
            Aligner().align_arrays(["M"], db, mode="banana")

    def test_full_mode_via_align_many_and_async(self):
        rng = np.random.default_rng(11)
        db = Database(_random_db(rng, 8))
        al = Aligner()
        want = al.align("MKTAYIAK", db, mode="full")
        got = list(al.align_many(["MKTAYIAK"], db, mode="full"))
        assert got[0] == want
        fut = al.align_async("MKTAYIAK", db, mode="full")
        assert fut.result() == want

    def test_empty(self):
        assert Aligner().align_batch([], Database(["MKT"])) == []
        assert Aligner().align_batch(["M"], Database([])) == [[]]

    def test_slice(self):
        db = Database(["AAAA", "CCCC", "AAAA"])
        out = Aligner().align_batch(["AAAA"], db, start=1)
        assert [r.target_index for r in out[0]] == [1, 2]


class TestShardedSearch:
    def test_sharded_matches_single_device(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        from pyopal_tpu.matrices import ScoringMatrix
        from pyopal_tpu.ops import xla
        from pyopal_tpu.parallel import mesh as mesh_lib, sharded

        rng = np.random.default_rng(3)
        S = ScoringMatrix.from_name("BLOSUM50").int_data()
        Q = 20
        q = rng.integers(0, 24, Q).astype(np.uint8)
        prof = xla.make_profile_t(q, S)
        nblk, t_pad, lanes = 8, 32, 16
        targets = rng.integers(0, 24, (nblk, t_pad, lanes)).astype(np.int32)
        lengths = rng.integers(1, t_pad + 1, (nblk, lanes)).astype(np.int32)

        m = mesh_lib.device_mesh(8)
        for algo in ("nw", "sw"):
            s_sh, qe_sh, te_sh = sharded.sharded_search_group(
                m, prof, targets, lengths, 3, 1, algo, use_pallas=False
            )
            s1, qe1, te1 = jax.vmap(
                lambda t, l: xla.search_block(prof, t, l, 3, 1, algo)
            )(targets, lengths)
            assert np.array_equal(np.asarray(s_sh), np.asarray(s1)), algo
            assert np.array_equal(np.asarray(qe_sh), np.asarray(qe1)), algo
            assert np.array_equal(np.asarray(te_sh), np.asarray(te1)), algo

    def test_top_k_merge(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        from pyopal_tpu.parallel import mesh as mesh_lib, sharded

        rng = np.random.default_rng(4)
        m = mesh_lib.device_mesh(8)
        scores = rng.integers(0, 1000, 64).astype(np.int32)
        idx = np.arange(64, dtype=np.int32)
        v, i = sharded.top_k_merge(m, scores, idx, k=5)
        v = np.asarray(v)
        want = np.sort(scores)[::-1][:5]
        assert np.array_equal(np.sort(v)[::-1], want)


class TestDryrun:
    def test_graft_entry(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import jax
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert all(o.shape == (2, 128) for o in out)

    def test_dryrun_multichip(self):
        import sys, os
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestUtils:
    def test_device_info(self):
        info = pyopal_tpu._device_info()
        assert info["backend"] in ("cpu", "tpu", "gpu")
        assert info["n_devices"] >= 1

    def test_search_stats(self):
        from pyopal_tpu.utils import profiling

        db = Database(["MKTA" * 10, "MK" * 30])
        stats = profiling.search_stats(db)
        assert stats["n_targets"] == 2
        assert stats["residues"] == 100
        assert stats["padding_overhead"] >= 1.0


class TestShardedFlat:
    def test_matches_oracle(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs a multi-device mesh")
        import jax.numpy as jnp
        from pyopal_tpu.matrices import ScoringMatrix
        from pyopal_tpu.ops import naive, pallas_ragged as pr
        from pyopal_tpu.parallel import mesh as mesh_lib, sharded_flat as sfm

        rng = np.random.default_rng(9)
        S = ScoringMatrix.from_name("BLOSUM50").int_data()
        seqs = [
            rng.integers(0, 24, int(L)).astype(np.uint8)
            for L in rng.integers(1, 150, 700)
        ]
        # > 128 sequences per shard: multi-block shards exercise the
        # step->row-offset arithmetic (chunk quantum must reach the
        # kernel; a mismatch is invisible with one block per shard)
        sf = sfm.pack_flat_sharded(seqs, 4)
        assert max(np.bincount(sf.inv_shard)) > 128
        queries = [rng.integers(0, 24, 30).astype(np.uint8)]
        profs = jnp.asarray(
            pr.make_profiles_host(queries, S), dtype=jnp.bfloat16
        )
        qlens = jnp.asarray(np.array([30], np.int32))
        mesh = mesh_lib.device_mesh(4)
        s, qe, te = sfm.sharded_search_flat(
            mesh, profs, qlens, sf, 3, 1, "sw", interpret=True
        )
        for i in range(0, 700, 61):
            ns, nqe, nte = naive.score_end(queries[0], seqs[i], S, 3, 1, "sw")
            assert ns == s[0, i], i
            if len(seqs[i]):
                assert (nqe, nte) == (qe[0, i], te[0, i]), i


class TestShardedFlatQ8:
    def test_matches_oracle(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs a multi-device mesh")
        import jax.numpy as jnp
        from pyopal_tpu.matrices import ScoringMatrix
        from pyopal_tpu.ops import naive, pallas_q8 as q8
        from pyopal_tpu.parallel import mesh as mesh_lib, sharded_flat as sfm

        rng = np.random.default_rng(11)
        S = ScoringMatrix.from_name("BLOSUM50").int_data()
        seqs = [
            rng.integers(0, 24, int(L)).astype(np.uint8)
            for L in rng.integers(0, 150, 300)
        ]
        sf = sfm.pack_flat_sharded(seqs, 4, lanes=128)
        queries = [
            rng.integers(0, 24, int(L)).astype(np.uint8)
            for L in (30, 17, 44, 9, 25, 61, 38, 5)
        ]
        groups = q8.plan_groups([len(q) for q in queries])
        profs, qv, maxq = q8.make_profiles_q8_host(
            queries, S, groups, lanes=128
        )
        mesh = mesh_lib.device_mesh(4)
        s, qe, te = sfm.sharded_search_flat_q8(
            mesh,
            jnp.asarray(profs, jnp.bfloat16),
            jnp.asarray(qv),
            jnp.asarray(maxq),
            sf,
            3,
            1,
            "sw",
            interpret=True,
        )
        for g, idxs in enumerate(groups):
            for qb, qi in enumerate(idxs):
                row = g * q8.QB + qb
                for i in range(0, 300, 37):
                    ns, nqe, nte = naive.score_end(
                        queries[qi], seqs[i], S, 3, 1, "sw"
                    )
                    assert ns == s[row, i], (qi, i)
                    if len(seqs[i]):
                        assert (nqe, nte) == (qe[row, i], te[row, i]), (qi, i)


class TestAsyncSurface:
    """`align_many` / `align_async` == the synchronous `align`."""

    def _setup(self):
        rng = random.Random(31)
        AL = "ARNDCQEGHILKMFPSTWYV"
        targets = [
            "".join(rng.choices(AL, k=rng.randint(5, 90)))
            for _ in range(40)
        ]
        queries = [
            "".join(rng.choices(AL, k=rng.randint(10, 50)))
            for _ in range(9)
        ]
        return po.Aligner(), po.Database(targets), queries

    def test_align_many_matches_align(self):
        aligner, db, queries = self._setup()
        for mode in ("score", "end"):
            got = list(
                aligner.align_many(
                    iter(queries), db, mode=mode, batch_size=4
                )
            )
            assert len(got) == len(queries)
            for qi, q in enumerate(queries):
                want = aligner.align(q, db, mode=mode)
                assert got[qi] == want, (mode, qi)

    def test_align_async_batches_and_matches(self):
        aligner, db, queries = self._setup()
        futs = [
            aligner.align_async(q, db, mode="end") for q in queries
        ]
        assert not any(f.done() for f in futs)
        # resolving ANY future flushes the whole pending stream
        futs[3].result()
        assert all(f.done() for f in futs)
        for f, q in zip(futs, queries):
            assert f.result() == aligner.align(q, db, mode="end")

    def test_align_async_validates_at_submit(self):
        aligner, db, _ = self._setup()
        with pytest.raises(ValueError):
            aligner.align_async("A-A", db)  # bad symbol
        with pytest.raises(ValueError):
            aligner.align_async("AA", db, mode="banana")

    def test_align_async_separate_streams(self):
        aligner, db, queries = self._setup()
        f_sw = aligner.align_async(queries[0], db, algorithm="sw")
        f_nw = aligner.align_async(queries[0], db, algorithm="nw")
        assert f_sw.result() == aligner.align(queries[0], db, algorithm="sw")
        assert f_nw.result() == aligner.align(queries[0], db, algorithm="nw")

    def test_align_async_submit_during_flush_does_not_block(self):
        """A `submit` that lands while another thread's flush holds the
        device must return immediately (the batch search runs outside
        the stream lock) and be picked up by the next flush."""
        import threading

        aligner, db, queries = self._setup()
        in_search = threading.Event()
        release = threading.Event()
        real_align_batch = aligner.align_batch

        def slow_align_batch(*a, **kw):
            in_search.set()
            assert release.wait(timeout=30)
            return real_align_batch(*a, **kw)

        aligner.align_batch = slow_align_batch
        try:
            first = aligner.align_async(queries[0], db)
            t = threading.Thread(target=first.result)
            t.start()
            assert in_search.wait(timeout=30)
            # flush is now inside the (stalled) batch search; submit
            # must not block behind it
            done = threading.Event()
            late = []

            def submitter():
                late.append(aligner.align_async(queries[1], db))
                done.set()

            s = threading.Thread(target=submitter)
            s.start()
            assert done.wait(timeout=5), "submit blocked behind in-flight flush"
            release.set()
            t.join(timeout=30)
            s.join(timeout=5)
        finally:
            release.set()
            aligner.align_batch = real_align_batch
        assert first.result() == aligner.align(queries[0], db)
        assert late[0].result() == aligner.align(queries[1], db)

    def test_align_async_flush_failure_resolves_futures(self):
        """If the batch search raises, popped futures re-raise the
        exception instead of hanging/spinning forever."""
        aligner, db, queries = self._setup()

        def boom(*a, **kw):
            raise RuntimeError("device fell over")

        fut = aligner.align_async(queries[0], db)
        aligner.align_batch = boom
        with pytest.raises(RuntimeError, match="device fell over"):
            fut.result()
        # repeated resolution keeps raising, never blocks
        with pytest.raises(RuntimeError, match="device fell over"):
            fut.result()

    def test_align_async_forwards_overflow(self):
        """`overflow` is part of the stream key and forwarded to the
        batch search (API-parity plumbing; semantics are a no-op)."""
        aligner, db, queries = self._setup()
        seen = []
        real_align_batch = aligner.align_batch

        def spy(*a, **kw):
            seen.append(kw.get("overflow"))
            return real_align_batch(*a, **kw)

        aligner.align_batch = spy
        try:
            f_s = aligner.align_async(queries[0], db, overflow="simple")
            f_b = aligner.align_async(queries[0], db, overflow="buckets")
            assert f_s.result() == f_b.result()
        finally:
            aligner.align_batch = real_align_batch
        assert sorted(seen) == ["buckets", "simple"]


def test_shard_assignment_balance():
    """Greedy-LPT dealing of length-sorted blocks balances per-shard
    KERNEL cost — the packing property behind the >=80% linear-scaling
    target (BASELINE.md).  The sweep cost of a shard is its padded row
    total (every lane of a block runs to the block's padded length),
    so that is the balanced metric; it must stay within a few percent
    of the mean for a Swiss-Prot-like length distribution."""
    from pyopal_tpu.ops import packing
    from pyopal_tpu.parallel import sharded_flat as sfm

    rng = np.random.default_rng(8)
    lengths = np.clip(
        rng.lognormal(np.log(350), 0.45, 12071).astype(int), 30, 4000
    )
    seqs = [np.zeros(n, np.uint8) for n in lengths]
    for n_shards in (4, 8):
        shard_ids = sfm.shard_assignment(
            len(seqs), [len(x) for x in seqs], n_shards, sfm.LANES
        )
        rows = np.asarray(
            [
                packing.flat_layout(
                    [lengths[i] for i in ids], sfm.LANES
                ).total_rows
                for ids in shard_ids
            ],
            np.float64,
        )
        spread = float(np.abs(rows - rows.mean()).max() / rows.mean())
        assert spread < 0.05, (n_shards, spread, rows)
        # every target appears exactly once across shards
        got = sorted(i for ids in shard_ids for i in ids)
        assert got == list(range(len(seqs)))


def test_align_async_thread_race_and_eviction():
    """A sibling future resolved from another thread while a flush is
    in flight must block until its result exists (never None / never
    AssertionError), and a fully drained stream must evict itself so
    the aligner does not pin the database forever."""
    import threading

    rng = random.Random(5)
    AL = "ARNDCQEGHILKMFPSTWYV"
    db = Database(
        ["".join(rng.choices(AL, k=rng.randint(20, 60))) for _ in range(25)]
    )
    aligner = Aligner()
    futs = [
        aligner.align_async("".join(rng.choices(AL, k=30)), db)
        for _ in range(6)
    ]
    errs = []

    def worker(f):
        try:
            r = f.result()
            assert r is not None and len(r) == 25
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(f,)) for f in futs
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert not aligner.__dict__.get("_async_streams")
    assert isinstance(futs[0], pyopal_tpu.AlignFuture)


def test_align_async_validates_slice_at_submit():
    db = Database(["MKT", "AAA"])
    al = Aligner()
    import pytest as _pytest

    with _pytest.raises(IndexError):
        al.align_async("M", db, start=-1)
    with _pytest.raises(IndexError):
        al.align_async("M", db, start=3, end=1)
    # a beyond-size end is legal (clamped at flush)
    assert al.align_async("M", db, end=10**9).result() is not None
