"""Alphabet tests — mirrors reference ``tests/test_alphabet.py``."""

import pickle

import pytest

from pyopal_tpu import Alphabet


def test_len():
    assert len(Alphabet()) == 24
    assert len(Alphabet()) == len(Alphabet().letters)
    a = Alphabet("ATGC")
    assert len(a) == 4
    assert len(a) == len(a.letters)


def test_contains():
    a = Alphabet("ATGC")
    assert "A" in a
    assert "T" in a
    assert "X" not in a


def test_getitem():
    a = Alphabet("ATGC")
    assert a[0] == "A"
    assert a[2] == "G"
    assert a[-1] == "C"
    assert a[-2] == "G"
    for bad in (-5, 4, 5):
        with pytest.raises(IndexError):
            a[bad]


def test_str():
    a = Alphabet("ATGC")
    assert a.letters == "ATGC"
    assert str(a) == "ATGC"


def test_eq():
    a1, a2, a3 = Alphabet("ATGC"), Alphabet("ATGC"), Alphabet("TCGA")
    assert a1 == a1
    assert a1 == a1.letters
    assert a1 == a2
    assert a1 != a3
    assert a1 != 10


def test_pickle():
    a1 = Alphabet("ATGC")
    a2 = pickle.loads(pickle.dumps(a1))
    assert a1.letters == a2.letters
    assert a1 == a2


def test_init_error_duplicate_letters():
    with pytest.raises(ValueError):
        Alphabet("AAAA")


def test_init_error_lowercase_letters():
    with pytest.raises(ValueError):
        Alphabet("AtgC")


def test_init_error_invalid_symbols():
    with pytest.raises(ValueError):
        Alphabet("A[]C")


def test_init_error_too_long():
    letters = "".join(chr(ord("A") + i) for i in range(26)) + "*"
    with pytest.raises(ValueError):
        Alphabet(letters + "??")  # >32 symbols & invalid anyway
    with pytest.raises(ValueError):
        Alphabet("ABCDEFGHIJKLMNOPQRSTUVWXYZ" * 2)


def test_repr():
    assert repr(Alphabet()) == "Alphabet()"
    assert repr(Alphabet("ATGC")) == "Alphabet('ATGC')"


def test_encode_str():
    a = Alphabet("ATGC")
    assert a.encode("ATGC") == bytes([0, 1, 2, 3])
    assert a.encode("AAAAA") == bytes([0, 0, 0, 0, 0])


def test_encode_bytes():
    a = Alphabet("ATGC")
    assert a.encode(b"ATGC") == bytes([0, 1, 2, 3])
    assert a.encode(b"AAAAA") == bytes([0, 0, 0, 0, 0])


def test_encode_wildcard():
    # unknown alpha characters map to the wildcard when present...
    a = Alphabet("ATGC*")
    assert a.encode("AWC") == bytes([0, 4, 3])
    # ...and raise when absent
    with pytest.raises(ValueError):
        Alphabet("ATGC").encode("AWC")
    # non-alpha input always raises
    with pytest.raises(ValueError):
        Alphabet("ATGC*").encode("A-C")


def test_decode_bytes():
    a = Alphabet("ATGC")
    assert a.decode(bytes([0, 1, 2, 3])) == "ATGC"
    assert a.decode(bytes([0, 0, 0, 0, 0])) == "AAAAA"


def test_decode_bytearray():
    a = Alphabet("ATGC")
    assert a.decode(bytearray([0, 1, 2, 3])) == "ATGC"
    assert a.decode(bytearray([0, 0, 0, 0, 0])) == "AAAAA"


def test_decode_memoryview():
    a = Alphabet("ATGC")
    assert a.decode(memoryview(bytearray([0, 1, 2, 3]))) == "ATGC"
    assert a.decode(memoryview(bytearray([0, 0, 0, 0, 0]))) == "AAAAA"


def test_decode_invalid_index():
    with pytest.raises(ValueError):
        Alphabet("ATGC").decode(bytes([0, 7]))


def test_hash_consistent_with_string_equality():
    # __eq__ compares equal to plain strings (reference parity), so
    # the eq/hash contract requires equal hashes
    from pyopal_tpu import Alphabet

    a = Alphabet("ACGT")
    assert a == "ACGT" and hash(a) == hash("ACGT")
    assert {"ACGT": 1}[a] == 1
    assert len({a, "ACGT"}) == 1


def test_encode_into_native_parity():
    from pyopal_tpu import Alphabet

    a = Alphabet("ACGT")
    buf = bytearray(4)
    a.encode_into(b"ACGT", buf)
    assert bytes(buf) == bytes([0, 1, 2, 3])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        a.encode_into(b"ACGZ", bytearray(4))
    with _pytest.raises(ValueError):
        a.encode_into(b"ACG", bytearray(4))
