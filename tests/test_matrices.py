"""Scoring matrix provider tests."""

import pickle

import numpy as np
import pytest

from pyopal_tpu import ScoringMatrix


def test_from_name():
    m = ScoringMatrix.from_name("BLOSUM50")
    assert m.name == "BLOSUM50"
    assert m.alphabet == "ARNDCQEGHILKMFPSTWYVBZX*"
    assert m.size() == 24
    assert m.is_integer()


def test_from_name_unknown():
    with pytest.raises(ValueError):
        ScoringMatrix.from_name("NOPE99")


def test_from_name_external_family_guidance():
    # known published-but-not-derivable families get a targeted error
    # naming the from_file/register migration path
    for name in ("PFASUM60", "GONNET", "MIQS", "BENNER74"):
        with pytest.raises(ValueError, match="from_file"):
            ScoringMatrix.from_name(name)
        with pytest.raises(ValueError, match="not bundled"):
            ScoringMatrix.from_name(name)
    # ... and register() makes the name resolvable afterwards
    m = ScoringMatrix(
        np.zeros((24, 24), np.float32), name="PFASUM60"
    )
    try:
        ScoringMatrix.register(m)
        assert ScoringMatrix.from_name("PFASUM60") == m
    finally:
        from pyopal_tpu.matrices import _REGISTERED

        _REGISTERED.pop("PFASUM60", None)


def test_all_bundled_are_valid():
    for name in ScoringMatrix.available_matrices():
        m = ScoringMatrix.from_name(name)
        assert m.size() == len(m.alphabet)
        assert m.is_integer(), name
        assert m.is_symmetric(), name


def test_blosum50_golden_entries():
    # entries that pin the reference golden scores (NW=44 / SW=47)
    m = ScoringMatrix.from_name("BLOSUM50")
    a = m.alphabet
    get = lambda x, y: m.data[a.index(x), a.index(y)]
    assert get("A", "A") == 5
    assert get("C", "C") == 13
    assert get("G", "G") == 8
    assert get("G", "T") == -2
    assert get("T", "T") == 5
    assert get("W", "W") == 15


def test_vtml80():
    # the matrix the reference's own test suite builds its Aligner from
    # (/root/reference/src/pyopal/tests/test_aligner.py:10-18)
    m = ScoringMatrix.from_name("VTML80")
    assert m.name == "VTML80"
    assert m.alphabet == "ARNDCQEGHILKMFPSTWYVBZX*"
    assert m.size() == 24
    assert m.is_integer()
    assert m.is_symmetric()
    a = m.alphabet
    get = lambda x, y: m.data[a.index(x), a.index(y)]
    # VTML80 is a shorter evolutionary distance than BLOSUM50: the
    # rarest residues keep the sharpest self-scores
    assert get("W", "W") == 16
    assert get("C", "C") == 13
    assert get("W", "W") >= get("A", "A")
    # searches with it run end-to-end
    from pyopal_tpu import Aligner, Database

    hits = Aligner("VTML80").align("ACCTCG", Database(["AACCGCTG"]))
    assert hits[0].score > 0


def test_from_match_mismatch():
    m = ScoringMatrix.from_match_mismatch(2, -3, "ACGT")
    assert m.alphabet == "ACGT"
    assert m.data[0, 0] == 2
    assert m.data[0, 1] == -3
    assert m.is_integer()


def test_from_diagonal():
    m = ScoringMatrix.from_diagonal([1, 2, 3, 4], -1, "ACGT")
    assert m.data[2, 2] == 3
    assert m.data[0, 1] == -1


def test_custom_matrix_validation():
    with pytest.raises(ValueError):
        ScoringMatrix(np.zeros((3, 4)), "ACG")
    with pytest.raises(ValueError):
        ScoringMatrix(np.zeros((3, 3)), "ACGT")


def test_eq_pickle_repr():
    m1 = ScoringMatrix.from_name("BLOSUM62")
    m2 = pickle.loads(pickle.dumps(m1))
    assert m1 == m2
    assert m1 != ScoringMatrix.from_name("BLOSUM50")
    assert "BLOSUM62" in repr(m1)


def test_non_integer():
    m = ScoringMatrix([[1.5, -1.0], [-1.0, 1.5]], "AC")
    assert not m.is_integer()
    with pytest.raises(ValueError):
        m.int_data()


class TestMatrixText:
    """NCBI/EMBOSS text-format parsing, rendering and registration."""

    def test_from_text_ncbi_format(self):
        text = """# comment line
   A  R  N
A  4 -1 -2
R -1  5  0
N -2  0  6
"""
        m = ScoringMatrix.from_text(text)
        assert m.alphabet == "ARN"
        assert m.data[1, 1] == 5
        assert m.is_integer() and m.is_symmetric()

    def test_from_text_no_row_letters(self):
        m = ScoringMatrix.from_text("A C\n1 -2\n-2 1\n")
        assert m.alphabet == "AC"
        assert m.data[0, 1] == -2

    def test_from_text_row_order_mismatch(self):
        with pytest.raises(ValueError):
            ScoringMatrix.from_text(" A C\nC 1 2\nA 2 1\n")

    def test_from_text_bad_shapes(self):
        with pytest.raises(ValueError):
            ScoringMatrix.from_text("")
        with pytest.raises(ValueError):
            ScoringMatrix.from_text(" A C\nA 1 2 3\nC 1 2\n")
        with pytest.raises(ValueError):
            ScoringMatrix.from_text(" A C\nA 1 2\n")

    def test_to_text_round_trip(self):
        for name in ("BLOSUM50", "VTML80", "PAM250"):
            m = ScoringMatrix.from_name(name)
            again = ScoringMatrix.from_text(m.to_text(), name=name)
            assert again == m

    def test_from_file_and_register(self, tmp_path):
        m = ScoringMatrix.from_name("BLOSUM62")
        path = tmp_path / "vtml160.out"
        path.write_text(m.to_text())
        loaded = ScoringMatrix.from_file(path)
        assert loaded.name == "VTML160"
        assert loaded == m
        ScoringMatrix.register(loaded)
        try:
            assert ScoringMatrix.from_name("vtml160") == m
            # registered matrices drive the aligner end to end
            import pyopal_tpu as po

            hits = po.Aligner("VTML160").align(
                "ACCTCG", po.Database(["AACCGCTG"]), algorithm="nw"
            )
            assert len(hits) == 1
        finally:
            from pyopal_tpu import matrices

            matrices._REGISTERED.pop("VTML160", None)

    def test_register_cannot_shadow_bundled(self):
        m = ScoringMatrix.from_name("BLOSUM62")
        with pytest.raises(ValueError):
            ScoringMatrix.register(m, name="BLOSUM50")
        with pytest.raises(ValueError):
            ScoringMatrix.register(ScoringMatrix(m.data, m.alphabet))

    def test_from_name_error_mentions_from_file(self):
        with pytest.raises(ValueError, match="from_file"):
            ScoringMatrix.from_name("PFASUM60")
        # generator-family names out of range get the range error
        with pytest.raises(ValueError, match="out of range"):
            ScoringMatrix.from_name("VTML999")


class TestPamGenerator:
    """The Dayhoff-chain PAM generator (`ScoringMatrix.pam`)."""

    def test_regenerates_published_anchors_bit_exactly(self):
        # the generated-table test against published values: the chain
        # must reproduce every entry of the four transcribed NCBI
        # tables (which from_name serves verbatim)
        import math

        from pyopal_tpu._pam_chain import pam_scores

        for name, k in (("PAM30", 2), ("PAM70", 2), ("PAM120", 2),
                        ("PAM250", 3)):
            ref = ScoringMatrix.from_name(name).data
            gen = pam_scores(int(name[3:]), math.log(2) / k)
            assert (gen == ref).all(), name

    def test_from_name_generates_any_pam(self):
        for n in (10, 40, 160, 200, 300, 500):
            m = ScoringMatrix.from_name(f"PAM{n}")
            assert m.name == f"PAM{n}"
            assert m.alphabet == "ARNDCQEGHILKMFPSTWYVBZX*"
            assert m.is_integer() and m.is_symmetric()
            d = m.data
            # star row/col is the matrix minimum, star-star is 1
            star = d[23, 0]
            assert star == d[:23, :23].min()
            assert (d[23, :23] == star).all() and (d[:23, 23] == star).all()
            assert d[23, 23] == 1

    def test_pam_self_scores_decay_with_distance(self):
        # shorter evolutionary distance -> sharper self-scores
        w40 = ScoringMatrix.pam(40).data[17, 17]
        w160 = ScoringMatrix.pam(160).data[17, 17]
        w250 = ScoringMatrix.pam(250, scale_denominator=2).data[17, 17]
        assert w40 >= w160 >= w250

    def test_pam_expected_score_negative(self):
        from pyopal_tpu._pam_chain import PAM_FREQS

        for n in (40, 160, 200):
            d = ScoringMatrix.pam(n).data[:20, :20]
            exp = PAM_FREQS @ d @ PAM_FREQS
            assert exp < 0, n

    def test_pam_scale_and_range(self):
        m2 = ScoringMatrix.pam(250, scale_denominator=2)
        m3 = ScoringMatrix.pam(250, scale_denominator=3)
        # third-bit units are finer than half-bits, so magnitudes grow
        assert m2.data[17, 17] < m3.data[17, 17]
        with pytest.raises(ValueError):
            ScoringMatrix.pam(0)
        with pytest.raises(ValueError):
            ScoringMatrix.pam(501)

    def test_pam_aligner_end_to_end(self):
        from pyopal_tpu import Aligner, Database

        hits = Aligner("PAM200").align("ACCTCG", Database(["AACCGCTG"]))
        assert hits[0].score > 0


def test_to_text_round_trips_every_bundled_matrix():
    # PAM30's widest value ("-17") once abutted the row letter and the
    # render was unparseable; pin the round trip for the whole catalog
    for name in ScoringMatrix.available_matrices():
        m = ScoringMatrix.from_name(name)
        back = ScoringMatrix.from_text(m.to_text())
        assert back.alphabet == m.alphabet, name
        np.testing.assert_array_equal(back.data, m.data, err_msg=name)


def test_pam_scale_denominator_must_be_integral():
    with pytest.raises(ValueError):
        ScoringMatrix.pam(100, scale_denominator=8.9)
    with pytest.raises(ValueError):
        ScoringMatrix.pam(100, scale_denominator=2.5)
    # integral floats are accepted and match the int path
    assert ScoringMatrix.pam(100, scale_denominator=2.0) == (
        ScoringMatrix.pam(100, scale_denominator=2)
    )


def test_blosum_granular_series():
    """The extended Henikoff clustering series is bundled and sound.

    Full-catalog parity item (the reference rides the external
    ``scoring-matrices`` package, ``/root/reference/pyproject.toml:44-46``).
    Diagonals pin each table's published identity scores; the
    entrywise +-1 closeness to the same-scale core anchors pins the
    family's smoothness in the clustering threshold.
    """
    AL = "ARNDCQEGHILKMFPSTWYVBZX*"
    diag_pins = {
        # name: (A, C, H, P, W, star)
        "BLOSUM30": (4, 17, 14, 11, 20, 1),
        "BLOSUM35": (5, 15, 12, 10, 16, 1),
        "BLOSUM40": (5, 16, 13, 11, 19, 1),
        "BLOSUM60": (4, 9, 7, 7, 10, 1),
        "BLOSUM65": (4, 9, 8, 8, 10, 1),
        "BLOSUM70": (4, 9, 8, 8, 11, 1),
        "BLOSUM75": (4, 9, 8, 8, 11, 1),
        "BLOSUM85": (5, 9, 8, 8, 11, 1),
        "BLOSUM100": (8, 14, 13, 12, 17, 1),
    }
    for name, (a, c, h, p, w, star) in diag_pins.items():
        m = ScoringMatrix.from_name(name)
        assert m.alphabet == AL
        assert m.is_integer() and m.is_symmetric(), name
        d = m.data
        g = lambda x: int(d[AL.index(x), AL.index(x)])
        assert (g("A"), g("C"), g("H"), g("P"), g("W"), g("*")) == (
            a, c, h, p, w, star
        ), name

    # same-scale neighbors move entrywise by at most 1 on the 20x20 core
    for a, b in [
        ("BLOSUM60", "BLOSUM62"),
        ("BLOSUM65", "BLOSUM62"),
        ("BLOSUM70", "BLOSUM62"),
        ("BLOSUM70", "BLOSUM80"),
        ("BLOSUM75", "BLOSUM80"),
        ("BLOSUM85", "BLOSUM80"),
        ("BLOSUM85", "BLOSUM90"),
    ]:
        da = ScoringMatrix.from_name(a).data[:20, :20]
        db = ScoringMatrix.from_name(b).data[:20, :20]
        assert np.abs(da - db).max() <= 1, (a, b)


def test_pam_nondefault_scale_name():
    # a non-default scale denominator is encoded in the name so the
    # result is never mistaken for the canonical published table
    m = ScoringMatrix.pam(250, scale_denominator=2)
    assert m.name == "PAM250/2"
    assert ScoringMatrix.pam(250).name == "PAM250"
    assert not np.array_equal(m.data, ScoringMatrix.pam(250).data)


class TestVtmlGenerator:
    """The fitted VT chain (`pyopal_tpu._vtml_chain`) behind
    `ScoringMatrix.vtml` / ``from_name("VTML<n>")``."""

    def test_regenerates_anchor_bit_exactly(self):
        # the chain's distance-80 20x20 block IS the bundled VTML80
        from pyopal_tpu._vtml_chain import vtml_scores

        published = ScoringMatrix.from_name("VTML80").data.astype(int)
        got = vtml_scores(80).astype(int)
        assert (got[:20, :20] == published[:20, :20]).all()

    def test_vtml80_served_from_transcription(self):
        # from_name / vtml(80) return the published table verbatim,
        # including its (non-derivable) B/Z/X rows and -9 star row
        m = ScoringMatrix.vtml(80)
        assert m == ScoringMatrix.from_name("VTML80")
        assert m.data[23][0] == -9

    def test_from_name_generates_any_vtml(self):
        for n in (10, 20, 40, 120, 160, 200, 350):
            m = ScoringMatrix.from_name(f"VTML{n}")
            assert m.name == f"VTML{n}"
            assert m.is_integer()
            d = np.asarray(m.data)
            assert d.shape == (24, 24)
            assert (d[:23, :23] == d[:23, :23].T).all()
            # star convention anchored on VTML80 (min - 2)
            assert d[23][0] == d[:20, :20].min() - 2
        with pytest.raises(ValueError):
            ScoringMatrix.vtml(0)
        with pytest.raises(ValueError):
            ScoringMatrix.vtml(501)

    def test_vtml_self_scores_decay_with_distance(self):
        diag = [
            np.diag(np.asarray(ScoringMatrix.vtml(n).data)[:20, :20])
            for n in (10, 40, 80, 160, 320)
        ]
        for a, b in zip(diag, diag[1:]):
            assert (a >= b).all()
            assert a.sum() > b.sum()

    def test_vtml_expected_score_negative(self):
        # any valid log-odds matrix has negative expected score under
        # its stationary frequencies
        from pyopal_tpu._vtml_chain import VTML_FREQS, vtml_exact_scores

        for n in (20, 80, 200):
            t = vtml_exact_scores(n)
            assert float(VTML_FREQS @ t @ VTML_FREQS) < 0

    def test_vtml_frequencies_plausible(self):
        # the fit recovered a realistic amino-acid frequency vector
        from pyopal_tpu._vtml_chain import VTML_FREQS

        assert abs(VTML_FREQS.sum() - 1.0) < 1e-9
        assert (VTML_FREQS > 0.005).all() and (VTML_FREQS < 0.15).all()
        aa = "ARNDCQEGHILKMFPSTWYV"
        # tryptophan and cysteine are the rarest residues in nature
        assert VTML_FREQS[aa.index("W")] < 0.03
        assert VTML_FREQS[aa.index("C")] < 0.04

    def test_vtml_aligner_end_to_end(self):
        import pyopal_tpu as po

        db = po.Database(["MKTAYIAKQR"], alphabet=ScoringMatrix.vtml(120).alphabet)
        hits = po.Aligner("VTML120").align("MKTAYIAKQR", db, algorithm="nw")
        assert hits[0].score > 0


def test_family_distances_must_be_integral():
    # 80.0 would silently bypass the VTML80 anchor table; 250.0 would
    # crash matrix_power with an opaque error
    with pytest.raises(TypeError):
        ScoringMatrix.vtml(80.0)
    with pytest.raises(TypeError):
        ScoringMatrix.pam(250.0)


def test_pam_nondefault_scale_repr_roundtrip():
    m = ScoringMatrix.pam(250, 2)
    assert m.name == "PAM250/2"
    assert ScoringMatrix.from_name("PAM250/2") == m
    with pytest.raises(ValueError):
        ScoringMatrix.from_name("PAM250/x")
