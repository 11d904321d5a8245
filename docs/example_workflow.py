"""End-to-end workflow example: search -> top hits -> full realignment.

Script version of the reference's documented workflow
(``/root/reference/docs/examples/abc.ipynb``: build a database, score
pass, extract the best hits, realign in full mode, inspect alignments).
Runs self-contained on synthetic data; substitute `read_fasta` on a real
FASTA file for actual use.
"""

import numpy as np

import pyopal_tpu


def main():
    rng = np.random.default_rng(0)
    letters = "ARNDCQEGHILKMFPSTWYV"

    # --- build a database (or: names, db = pyopal_tpu.read_fasta(path))
    targets = [
        "".join(rng.choice(list(letters), size=rng.integers(50, 400)))
        for _ in range(2000)
    ]
    query = targets[123][40:200]  # a real homolog is hiding in there
    db = pyopal_tpu.Database(targets)

    # --- score pass over everything (Pallas kernel on TPU)
    aligner = pyopal_tpu.Aligner("BLOSUM62", gap_open=10, gap_extend=1)
    hits = aligner.align(query, db, algorithm="sw", mode="score")
    best = sorted(hits, key=lambda h: h.score, reverse=True)[:10]
    print("top hits:", [(h.target_index, h.score) for h in best[:5]])

    # --- realign the best hits with full traceback
    subdb = db.extract([h.target_index for h in best])
    for full in aligner.align(query, subdb, mode="full", algorithm="sw"):
        print(
            f"target {best[full.target_index].target_index}: "
            f"score={full.score} identity={full.identity():.2f} "
            f"coverage(q)={full.coverage('query'):.2f} "
            f"cigar={full.cigar()[:40]}..."
        )

    # --- or both phases in one call: fused score+ends dispatch, then
    # batched traceback of only the winners (no sub-database)
    top = aligner.align_top_k(query, db, k=10, algorithm="sw")
    assert [h.score for h in top] == [h.score for h in best]
    print("align_top_k best:", top[0].target_index, top[0].score)
    return top


if __name__ == "__main__":
    main()
