"""A/B the q8 launch quantum now that per-launch results stream back
asynchronously (engine._emit / copy_to_host_async).

At quantum 8 the 64-query bench batch is a single launch — its whole
readback is exposed after compute.  Smaller quanta split the batch so
earlier launches' transfers overlap later launches' compute; the
counterweight is per-launch dispatch overhead and a larger
compiled-shape set.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench as B
from pyopal_tpu import Aligner, Database
from pyopal_tpu.ops import engine


def main():
    rng = np.random.default_rng(0)
    seqs = B.build_database(rng)
    queries = [q[:256] for q in B.build_database(rng, n=64, mean_len=256)]
    aligner = Aligner("BLOSUM50", gap_open=3, gap_extend=1)
    db = Database(seqs, alphabet=aligner.alphabet)
    cells = sum(len(s) for s in seqs) * 256 * 64

    for quantum in (8, 4, 2, 1):
        engine._Q8_LAUNCH_GROUPS = quantum
        aligner.align_arrays(queries, db, mode="score")  # warm compile
        best = min(
            (
                lambda: (
                    lambda t0: (
                        aligner.align_arrays(queries, db, mode="score"),
                        time.perf_counter() - t0,
                    )[1]
                )(time.perf_counter())
            )()
            for _ in range(3)
        )
        print(
            f"quantum {quantum}: {best*1e3:7.1f} ms  "
            f"{cells/best/1e9:6.1f} GCUPS"
        )


if __name__ == "__main__":
    main()
