"""Search dispatcher: packs the database slice and runs a compute engine.

This is the TPU analog of the reference's generated platform shims
(``/root/reference/src/pyopal/platform/pyx.in:16-108``): it receives the
validated search parameters from `Aligner.align`, selects the best
engine for the current backend (Pallas TPU kernel, or the vectorized
XLA engine elsewhere / for outsized queries), runs every packed block,
and assembles result objects keyed by *global* target index — chunking
never changes scores (invariant pinned by ``pyx.in:67-69``).
"""

from __future__ import annotations

import numpy as np
import jax

from ..results import EndResult, FullResult, ScoreResult
from . import naive, packing, xla


def _backend_kind() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def _device_arrays(group: packing.PackedGroup):
    """Device-resident copies of a packed group, cached on the group."""
    dev = getattr(group, "_dev", None)
    if dev is None:
        dev = (
            jax.device_put(group.targets.astype(np.int32)),
            jax.device_put(group.lengths),
        )
        group._dev = dev
    return dev


def search_scores(
    packed: packing.PackedDatabase,
    query_enc: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    algorithm: str,
    with_ends: bool = True,
):
    """Score + ends for every target of a packed database slice.

    Returns three ``(n_targets,)`` numpy int32 arrays
    ``(scores, query_ends, target_ends)`` in slice-local index order.
    """
    n = packed.n_targets
    scores = np.zeros(n, dtype=np.int32)
    q_ends = np.full(n, -1, dtype=np.int32)
    t_ends = np.full(n, -1, dtype=np.int32)
    if n == 0:
        return scores, q_ends, t_ends

    Q = int(query_enc.shape[0])
    if Q == 0:
        return _empty_query_results(packed, gap_open, gap_extend, algorithm)

    use_pallas = _backend_kind() == "tpu"
    if use_pallas:
        from . import pallas_kernel
        from ..utils import cache

        cache.enable()
        if not pallas_kernel.supports(Q):
            use_pallas = False

    if use_pallas:
        from . import pallas_kernel
        from functools import partial

        run = partial(pallas_kernel.search_group, with_ends=with_ends)
        prof = pallas_kernel.make_profile(query_enc, matrix)
    else:
        run = _run_group_xla
        prof = xla.make_profile_t(query_enc, matrix)

    outs = []
    for group in packed.groups:
        targets, lengths = _device_arrays(group)
        outs.append(
            (group, run(prof, targets, lengths, gap_open, gap_extend, algorithm))
        )
    for group, (s, qe, te) in outs:
        s = np.asarray(s)
        qe = np.asarray(qe)
        te = np.asarray(te)
        idx = group.indices.reshape(-1)
        valid = idx >= 0
        scores[idx[valid]] = s.reshape(-1)[valid]
        q_ends[idx[valid]] = qe.reshape(-1)[valid]
        t_ends[idx[valid]] = te.reshape(-1)[valid]
    return scores, q_ends, t_ends


def _run_group_xla(prof_t, targets, lengths, go, ge, algorithm):
    """Run the vectorized XLA engine over a stacked group of blocks."""
    fn = jax.vmap(
        lambda t, l: xla.search_block(prof_t, t, l, go, ge, algorithm)
    )
    return fn(targets, lengths)


def _empty_query_results(packed, go, ge, algorithm):
    n = packed.n_targets
    lengths = np.zeros(n, dtype=np.int64)
    for g in packed.groups:
        idx = g.indices.reshape(-1)
        valid = idx >= 0
        lengths[idx[valid]] = g.lengths.reshape(-1)[valid]
    if algorithm == "nw":
        scores = np.where(lengths > 0, -(go + (lengths - 1) * ge), 0)
    else:
        scores = np.zeros(n, dtype=np.int64)
    return (
        scores.astype(np.int32),
        np.full(n, -1, np.int32),
        (lengths - 1).astype(np.int32) if algorithm == "nw" else np.full(n, -1, np.int32),
    )


def search(
    database,
    query_enc: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    mode: str,
    algorithm: str,
    start: int,
    end: int,
):
    """Full search over ``database[start:end)``; returns result objects.

    Must be called with the database read lock held (mirrors the nogil
    region of the reference shims, ``pyx.in:76-91``).
    """
    packed = packing.pack_database_slice(database, start, end)
    scores, q_ends, t_ends = search_scores(
        packed,
        query_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        with_ends=(mode == "end"),
    )

    n = packed.n_targets
    if mode == "score":
        return [ScoreResult(start + i, int(scores[i])) for i in range(n)]
    if mode == "end":
        return [
            EndResult(start + i, int(scores[i]), int(q_ends[i]), int(t_ends[i]))
            for i in range(n)
        ]

    # mode == "full": per-pair alignment recompute (reference two-phase
    # strategy: SIMD score pass then pairwise reconstruction [upstream])
    from . import traceback as tb

    results = []
    Q = int(query_enc.shape[0])
    for i in range(n):
        target = database.get_encoded(start + i)
        score, qs, ts, qe, te, ops = tb.full_alignment(
            query_enc, target, matrix, gap_open, gap_extend, algorithm
        )
        assert score == int(scores[i]), (
            f"traceback score {score} != kernel score {int(scores[i])} "
            f"for target {start + i}"
        )
        results.append(
            FullResult(
                start + i,
                score,
                qe,
                te,
                qs,
                ts,
                Q,
                int(target.shape[0]),
                ops,
            )
        )
    return results
