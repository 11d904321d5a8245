"""Database tests — mirrors reference ``tests/test_database.py``."""

import pickle

import pytest

from pyopal_tpu import Database


def test_contains():
    db = Database(["ATGC", "ATTTAC", "TTACCG"])
    assert "ATGC" in db
    assert "ATTTAC" in db
    assert "TTACCG" in db
    assert "TAACCG" not in db
    assert "AAAA" not in db
    with pytest.raises(TypeError):
        1 in db


def test_lengths():
    assert Database(["ATGC", "ATTC", "TTCG"]).lengths == [4, 4, 4]
    assert Database(["ATGCATTATTGCAGA", "AGGATACATTAC"]).lengths == [15, 12]


def test_total_length():
    assert Database(["ATGC", "ATTC", "TTCG"]).total_length == 12
    assert Database(["ATGCATTATTGCAGA", "AGGATACATTAC"]).total_length == 27


def test_getitem():
    sequences = ["ATGC", "ATTC", "TTCG"]
    for convert in (str, lambda s: s.encode("ascii")):
        db = Database([convert(s) for s in sequences])
        for i in range(3):
            assert db[i] == sequences[i]
            assert db[-(i + 1)] == sequences[-(i + 1)]


def test_getitem_slice():
    sequences = ["ATGC", "ATTC", "TTCG", "TTAT", "AAAC"]
    db = Database(sequences)
    assert list(db[:2]) == sequences[:2]
    assert list(db[1:4:2]) == sequences[1:4:2]
    assert list(db[1::-1]) == sequences[1::-1]


def test_getitem_index_error():
    db = Database(["ATGC", "ATTC", "TTCG"])
    for bad in (3, -4, -8):
        with pytest.raises(IndexError):
            db[bad]


def test_reverse():
    sequences = ["ATGC", "ATTC", "TTCG"]
    db = Database(sequences)
    assert list(db) == sequences
    db.reverse()
    assert list(db) == list(reversed(sequences))


def test_reverse_empty():
    db = Database()
    assert len(db) == 0
    db.reverse()
    assert len(db) == 0


def test_pickle():
    sequences = ["ATGC", "ATTC", "TTCG"]
    db = Database(sequences)
    unpickled = pickle.loads(pickle.dumps(db))
    assert list(unpickled) == sequences


def test_insert():
    db = Database(["ATGC", "ATTC"])
    db.insert(1, "TTCC")
    assert list(db) == ["ATGC", "TTCC", "ATTC"]
    db.insert(-10, "TTTT")
    assert list(db) == ["TTTT", "ATGC", "TTCC", "ATTC"]
    db.insert(10, "AAAA")
    assert list(db) == ["TTTT", "ATGC", "TTCC", "ATTC", "AAAA"]


def test_delitem():
    db = Database(["ATGC", "ATTC", "TTCG"])
    del db[1]
    assert list(db) == ["ATGC", "TTCG"]
    del db[-2]
    assert list(db) == ["TTCG"]
    del db[0]
    assert list(db) == []
    with pytest.raises(IndexError):
        del db[0]
    with pytest.raises(IndexError):
        del db[-1]


def test_setitem():
    db = Database(["ATGC", "ATTC", "TTCG"])
    db[2] = "AAAT"
    assert list(db) == ["ATGC", "ATTC", "AAAT"]
    with pytest.raises(IndexError):
        db[-8] = "TCGA"
    with pytest.raises(IndexError):
        db[5] = "TCGA"


def test_mask():
    db = Database(["AAAA", "CCCC", "KKKK", "FFFF"])
    assert list(db.mask([True, False, False, True])) == ["AAAA", "FFFF"]
    with pytest.raises(IndexError):
        db.mask([True])
    with pytest.raises(IndexError):
        db.mask([True] * 5)


def test_extract():
    db = Database(["AAAA", "CCCC", "KKKK", "FFFF"])
    assert list(db.extract([2, 0])) == ["KKKK", "AAAA"]
    with pytest.raises(IndexError):
        db.extract([4])
    with pytest.raises(IndexError):
        db.extract([-1])


def test_clear():
    db = Database(["ATGC", "ATTC"])
    db.clear()
    assert len(db) == 0
    assert list(db) == []


def test_writer_not_starved_by_reader_stream():
    """A writer must acquire the lock under a continuous stream of
    overlapping readers (writer preference: new readers yield to
    queued writers)."""
    import threading
    import time

    db = Database(["AAAA", "CCCC"])
    stop = threading.Event()
    running = threading.Event()

    def reader():
        while not stop.is_set():
            with db.lock.read:
                running.set()
                time.sleep(0.003)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        assert running.wait(2.0)
        t0 = time.monotonic()
        db.append("GGGG")  # takes the write lock
        elapsed = time.monotonic() - t0
        assert elapsed < 1.0, f"writer starved for {elapsed:.2f}s"
        assert len(db) == 3
    finally:
        stop.set()
        for t in threads:
            t.join()


def test_slice_does_not_deadlock_against_queued_writer():
    """db[a:b] must not nest read-lock acquisition: with the
    writer-preferring SharedMutex, a queued writer between the outer
    and nested acquisition deadlocks both threads (regression)."""
    import threading

    db = Database(["AAAA", "CCCC", "KKKK", "FFFF"])
    start = threading.Barrier(3, timeout=10)
    done = []

    def slicer():
        start.wait()
        for _ in range(200):
            sub = db[0:2]
            assert len(sub) >= 1
        done.append("slice")

    def writer():
        start.wait()
        for _ in range(200):
            db.append("GGGG")
        done.append("write")

    threads = [
        threading.Thread(target=slicer, daemon=True),
        threading.Thread(target=writer, daemon=True),
    ]
    for t in threads:
        t.start()
    start.wait()
    for t in threads:
        t.join(timeout=30)
    assert done.count("slice") == 1 and done.count("write") == 1, (
        "slice/append deadlocked"
    )


def test_extend_is_atomic_single_version_bump():
    db = Database(["AAAA"])
    v0 = db.get_version()
    db.extend(["CCCC", "GGGG", "TTTT"])
    assert db.get_version() == v0 + 1
    assert list(db) == ["AAAA", "CCCC", "GGGG", "TTTT"]
    db.extend([])
    assert db.get_version() == v0 + 1
