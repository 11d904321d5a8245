"""FASTA / on-disk database format tests."""

import os
import tempfile

import numpy as np
import pytest

import pyopal_tpu
from pyopal_tpu import Database, read_fasta, save_database, load_database

FASTA = b"""\
>seq1 first sequence
GATTACA
>seq2
TTTT
TTAA
>seq3 another one
ACGTACGTACGT
"""


def test_read_fasta_bytes():
    names, db = read_fasta(FASTA, alphabet="ACGT")
    assert names == ["seq1", "seq2", "seq3"]
    assert list(db) == ["GATTACA", "TTTTTTAA", "ACGTACGTACGT"]


def test_read_fasta_file(tmp_path):
    p = tmp_path / "db.fasta"
    p.write_bytes(FASTA)
    names, db = read_fasta(str(p), alphabet="ACGT")
    assert names == ["seq1", "seq2", "seq3"]
    assert db.lengths == [7, 8, 12]


def test_read_fasta_default_alphabet():
    names, db = read_fasta(b">a\nMKV\n")
    assert list(db) == ["MKV"]
    assert db.alphabet.letters == "ARNDCQEGHILKMFPSTWYVBZX*"


def test_read_fasta_invalid_symbol():
    with pytest.raises(ValueError):
        read_fasta(b">a\nAC-GT\n", alphabet="ACGT")


def test_fasta_database_searchable():
    names, db = read_fasta(FASTA, alphabet="ACGT")
    from pyopal_tpu import Aligner, ScoringMatrix

    m = ScoringMatrix.from_match_mismatch(2, -1, "ACGT")
    results = Aligner(m, gap_open=2, gap_extend=1).align("GATTACA", db)
    assert results[0].score == 14  # perfect self hit


def test_save_load_roundtrip(tmp_path):
    seqs = ["GATTACA", "TTTT", "ACGTACGT"]
    db = Database(seqs, alphabet="ACGT")
    p = str(tmp_path / "db.npz")
    save_database(p, db, names=["a", "b", "c"])
    names, db2 = load_database(p)
    assert names == ["a", "b", "c"]
    assert list(db2) == seqs
    assert db2.alphabet == db.alphabet


def test_save_load_empty(tmp_path):
    p = str(tmp_path / "empty.npz")
    save_database(p, Database(alphabet="ACGT"))
    names, db = load_database(p)
    assert names is None
    assert len(db) == 0


def test_native_encoder_available():
    # the extension is built in-tree for this repo; make sure the fast
    # path is actually exercised in CI
    from pyopal_tpu.native import _encoder

    a = pyopal_tpu.Alphabet("ACGT")
    assert _encoder.encode(b"GATACA", a._ahash) == bytes([2, 0, 3, 0, 1, 0])
