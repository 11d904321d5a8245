"""Full-alignment reconstruction (``mode="full"``).

The reference computes full alignments in a second pass after the SIMD
score sweep, reconstructing each pair with a scalar recompute
[upstream] (cf. the SW#db method cited at ``README.md:188``).  Here the
per-pair reconstruction is delegated to the exact numpy oracle; a
batched banded Pallas traceback is the planned optimization for large
``full``-mode searches (the documented reference workflow realigns only
top hits — ``docs/examples/abc.ipynb``).
"""

from __future__ import annotations

import numpy as np

from . import naive


def full_alignment(query_enc, target_enc, matrix, go, ge, algorithm):
    """(score, q_start, t_start, q_end, t_end, ops uint8 array)."""
    return naive.traceback(
        np.asarray(query_enc, dtype=np.uint8),
        np.asarray(target_enc, dtype=np.uint8),
        matrix,
        go,
        ge,
        algorithm,
    )
