"""Validate a Dayhoff-chain PAM generator against the bundled NCBI tables.

Computes PAM-N log-odds matrices from the Dayhoff et al. (1978) PAM1
mutation-probability matrix (the same chain the NCBI ``pam`` program
runs: M^N, odds vs. the stationary frequencies, log at a fixed scale,
round to int) and diffs them against the four bundled published tables
(PAM30/70/120/250).  A bit-exact match across all four is strong
evidence both the PAM1 transcription and the bundled tables are
correct, since matrix powering mixes every entry into every score.
"""

import numpy as np

from pyopal_tpu import ScoringMatrix

AA = "ARNDCQEGHILKMFPSTWYV"

# Dayhoff, Schwartz & Orcutt (1978), Atlas of Protein Sequence and
# Structure vol. 5 suppl. 3, Figure 1: mutation probability matrix for
# 1 PAM, x1e4.  PAM1[i][j] = Pr(column residue j -> row residue i).
PAM1_E4 = """
A    9867    2    9   10    3    8   17   21    2    6    4    2    6    2   22   35   32    0    2   18
R       1 9913    1    0    1   10    0    0   10    3    1   19    4    1    4    6    1    8    0    1
N       4    1 9822   36    0    4    6    6   21    3    1   13    0    1    2   20    9    1    4    1
D       6    0   42 9859    0    6   53    6    4    1    0    3    0    0    1    5    3    0    0    1
C       1    1    0    0 9973    0    0    0    1    1    0    0    0    0    1    5    1    0    3    2
Q       3    9    4    5    0 9876   27    1   23    1    3    6    4    0    6    2    2    0    0    1
E      10    0    7   56    0   35 9865    4    2    3    1    4    1    0    3    4    2    0    1    2
G      21    1   12   11    1    3    7 9935    1    0    1    2    1    1    3   21    3    0    0    5
H       1    8   18    3    1   20    1    0 9912    0    1    1    0    2    3    1    1    1    4    1
I       2    2    3    1    2    1    2    0    0 9872    9    2   12    7    0    1    7    0    1   33
L       3    1    3    0    0    6    1    1    4   22 9947    2   45   13    3    1    3    4    2   15
K       2   37   25    6    0   12    7    2    2    4    1 9926   20    0    3    8   11    0    1    1
M       1    1    0    0    0    2    0    0    0    5    8    4 9874    1    0    1    2    0    0    4
F       1    1    1    0    0    0    0    1    2    8    6    0    4 9946    0    2    1    3   28    0
P      13    5    2    1    1    8    3    2    5    1    2    2    1    1 9926   12    4    0    0    2
S      28   11   34    7   11    4    6   16    2    2    1    7    4    3   17 9840   38    5    2    2
T      22    2   13    4    1    3    2    2    1   11    2    8    6    1    5   32 9871    0    2    9
W       0    2    0    0    0    0    0    0    0    0    0    0    0    1    0    1    0 9976    1    0
Y       1    0    3    0    3    0    1    0    4    1    1    0    0   21    0    1    1    2 9945    1
V      13    2    1    1    3    2    2    3    3   57   11    1   17    1    3    2   10    0    2 9901
"""

# Dayhoff (1978) normalized amino-acid frequencies, as used by the
# NCBI pam program.
FREQ = {
    "A": 0.087, "R": 0.041, "N": 0.040, "D": 0.047, "C": 0.033,
    "Q": 0.038, "E": 0.050, "G": 0.089, "H": 0.034, "I": 0.037,
    "L": 0.085, "K": 0.081, "M": 0.015, "F": 0.040, "P": 0.051,
    "S": 0.070, "T": 0.058, "W": 0.010, "Y": 0.030, "V": 0.065,
}


def parse_pam1():
    rows = {}
    for line in PAM1_E4.strip().splitlines():
        parts = line.split()
        rows[parts[0]] = [int(x) for x in parts[1:]]
        assert len(parts) == 21, parts[0]
    m = np.array([rows[a] for a in AA], dtype=np.float64) / 1e4
    return m


def make_pam(n, scale, m1, freqs, alphabet="ARNDCQEGHILKMFPSTWYVBZX*"):
    """PAM-n scores at `scale` (nats per unit), NCBI conventions."""
    mn = np.linalg.matrix_power(m1, n)
    # odds ratio R[i][j] = Pr(j -> i over n PAMs) / f_i; symmetric by
    # detailed balance of the Dayhoff chain (up to transcription noise)
    r = mn / freqs[:, None]
    # symmetrize: published tables are exactly symmetric
    r = np.sqrt(r * r.T)
    full = np.zeros((24, 24))
    full[:20, :20] = np.log(r) / scale
    # ambiguity rows: frequency-weighted average of the odds ratios,
    # then log (the pam program averages odds, not scores)
    groups = {"B": ("N", "D"), "Z": ("Q", "E"), "X": tuple(AA)}
    ext = {}
    for sym, members in groups.items():
        w = np.array([freqs[AA.index(a)] for a in members])
        w = w / w.sum()
        rows_r = np.stack([r[AA.index(a)] for a in members])
        ext[sym] = (w[:, None] * rows_r).sum(axis=0)
    # pairwise among B/Z/X
    for si, sym_i in enumerate(("B", "Z", "X")):
        gi = groups[sym_i]
        wi = np.array([freqs[AA.index(a)] for a in gi]); wi /= wi.sum()
        full[20 + si, :20] = np.log(ext[sym_i]) / scale
        full[:20, 20 + si] = full[20 + si, :20]
        for sj, sym_j in enumerate(("B", "Z", "X")):
            gj = groups[sym_j]
            wj = np.array([freqs[AA.index(a)] for a in gj]); wj /= wj.sum()
            block = np.array(
                [[r[AA.index(a), AA.index(b)] for b in gj] for a in gi]
            )
            v = wi @ block @ wj
            full[20 + si, 20 + sj] = np.log(v) / scale
    s = np.floor(full + 0.5).astype(np.int64)  # round half up, as nint
    star = s[:23, :23].min()
    s[23, :] = star
    s[:, 23] = star
    s[23, 23] = 1
    return s


def diff(name, n, scale_desc, scale):
    ref = ScoringMatrix.from_name(name).data.astype(np.int64)
    got = make_pam(n, scale, M1, FREQS)
    nbad = int((got != ref).sum())
    print(f"{name}: scale={scale_desc}  mismatches={nbad}/576")
    if 0 < nbad <= 40:
        idx = np.argwhere(got != ref)
        ab = "ARNDCQEGHILKMFPSTWYVBZX*"
        for i, j in idx:
            print(f"   {ab[i]}{ab[j]}: got {got[i, j]} ref {ref[i, j]}")
    return nbad


if __name__ == "__main__":
    M1 = parse_pam1()
    FREQS = np.array([FREQ[a] for a in AA])
    print("column sums (x1e4):", (M1.sum(axis=0) * 1e4).round(1))
    print("freq sum:", FREQS.sum())
    # detailed-balance check: f_j M[i][j] vs f_i M[j][i]
    fb = FREQS[None, :] * M1 - (FREQS[None, :] * M1).T
    print("max detailed-balance violation (x1e4):",
          np.abs(fb).max() * 1e4)
    ln2 = np.log(2.0)
    for name, n in (("PAM30", 30), ("PAM70", 70), ("PAM120", 120),
                    ("PAM250", 250)):
        best = None
        for k in (1, 2, 3, 4, 5, 6):
            nbad = diff(name, n, f"ln2/{k}", ln2 / k)
            if best is None or nbad < best[1]:
                best = (k, nbad)
        print(f"  -> best: ln2/{best[0]} with {best[1]} mismatches\n")
