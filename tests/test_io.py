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


class TestFastaEdgeCases:
    """Adversarial FASTA inputs: the native C scanner and the Python
    fallback must agree on all of them."""

    CASES = {
        "crlf": b">a r\r\nGAT\r\nTACA\r\n>b\r\nTTTT\r\n",
        "no_trailing_newline": b">a\nGATT\n>b\nACGT",
        "empty_record": b">a\nGATT\n>empty\n>b\nACGT\n",
        "blank_lines": b">a\n\nGAT\n\nTACA\n\n>b\nTT\n",
        "bare_gt_header": b">\nGATT\n>b x\nACGT\n",
        "tab_header": b">a\tdescription here\nGATT\n",
        "leading_junk_ignored": b"; comment\n>a\nGATT\n",
        "spaces_in_seq": b">a\nGAT TACA\n",
        "empty_input": b"",
        "header_only": b">lonely header\n",
    }

    @pytest.mark.parametrize("case", sorted(CASES))
    def test_native_matches_python_fallback(self, case):
        from pyopal_tpu import io as io_mod
        from pyopal_tpu.alphabet import Alphabet

        data = self.CASES[case]
        alpha = Alphabet("ACGT")
        py_names, py_seqs = io_mod._parse_fasta_py(data, alpha)
        names, db = read_fasta(data, alphabet=alpha)
        assert names == py_names, case
        assert len(db) == len(py_seqs), case
        for got, want in zip(db, py_seqs):
            assert got == alpha.decode(want.tobytes()), case

    def test_invalid_symbol_raises_both_paths(self):
        from pyopal_tpu import io as io_mod
        from pyopal_tpu.alphabet import Alphabet

        alpha = Alphabet("ACGT")
        bad = b">a\nGATX\n"
        with pytest.raises(ValueError):
            read_fasta(bad, alphabet=alpha)
        with pytest.raises(ValueError):
            io_mod._parse_fasta_py(bad, alpha)


def test_fasta_stop_codon_parity():
    # '*' is FASTA-legal (stop codon) and maps in the default protein
    # alphabet; native scanner and fallback must both accept it
    from pyopal_tpu import io as io_mod

    data = b">a\nMKV*\n>b desc\nAC*GT\n"
    names, db = read_fasta(data)
    py_names, py_seqs = io_mod._parse_fasta_py(
        data, Database._DEFAULT_ALPHABET
    )
    assert names == py_names == ["a", "b"]
    assert list(db) == ["MKV*", "AC*GT"]
    assert [
        Database._DEFAULT_ALPHABET.decode(s.tobytes()) for s in py_seqs
    ] == ["MKV*", "AC*GT"]


def test_load_database_refuses_pickled_archives(tmp_path):
    # the on-disk format must never execute pickle payloads
    path = tmp_path / "evil.npz"
    np.savez(
        path,
        payload=np.zeros(0, np.uint8),
        lengths=np.zeros(0, np.int64),
        alphabet=np.frombuffer(b"ACGT", dtype=np.uint8),
        names=np.asarray(["x", None], dtype=object),
    )
    with pytest.raises(ValueError):
        load_database(path)


def test_save_load_suffixless_roundtrip(tmp_path):
    """np.savez appends '.npz'; load_database must mirror that so the
    natural save('db') -> load('db') round-trip works."""
    db = Database(["ACCTG", "TTGA"])
    base = str(tmp_path / "mydb")  # no suffix
    save_database(base, db)
    names, loaded = load_database(base)
    assert names is None
    assert list(loaded) == list(db)


def test_load_database_rejects_corrupt_archive(tmp_path):
    """Truncated payloads must fail loudly, not yield short sequences."""
    path = str(tmp_path / "bad.npz")
    np.savez_compressed(
        path,
        payload=np.zeros(3, np.uint8),
        lengths=np.array([2, 4], np.int64),  # sums to 6 != 3
        alphabet=np.frombuffer(b"ACGT", dtype=np.uint8),
    )
    with pytest.raises(ValueError, match="corrupt"):
        load_database(path)


def test_load_database_rejects_out_of_alphabet_codes(tmp_path):
    """Codes beyond the alphabet must fail loudly: the kernels' one-hot
    profile lookup would silently score them as all-zero columns."""
    path = str(tmp_path / "oob.npz")
    np.savez_compressed(
        path,
        payload=np.array([0, 1, 7], np.uint8),  # 7 >= len("ACGT")
        lengths=np.array([3], np.int64),
        alphabet=np.frombuffer(b"ACGT", dtype=np.uint8),
    )
    with pytest.raises(ValueError, match="alphabet"):
        load_database(path)
