"""Search dispatcher: packs the database slice and runs a compute engine.

This is the TPU analog of the reference's generated platform shims
(``/root/reference/src/pyopal/platform/pyx.in:16-108``): it receives the
validated search parameters from `Aligner.align`, selects the best
engine for the current backend (Pallas TPU kernel, or the vectorized
XLA engine elsewhere / for outsized queries), runs every packed block,
and assembles result objects keyed by *global* target index — chunking
never changes scores (invariant pinned by ``pyx.in:67-69``).

Host<->device traffic is minimized for the (remote-attached) TPU path:
the query profile upload is memoized, packed database blocks and their
index maps live in HBM across calls, per-group results are scattered
into one global array *on device*, and exactly one readback happens per
search call.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

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
            jax.device_put(group.indices),
        )
        group._dev = dev
    return dev


# --- query profile upload memoization ----------------------------------------

_PROFILE_CACHE: dict = {}
_PROFILE_CACHE_MAX = 32


def _profile_for(query_enc: np.ndarray, matrix: np.ndarray, kind: str):
    key = (kind, query_enc.tobytes(), matrix.tobytes())
    hit = _PROFILE_CACHE.get(key)
    if hit is not None:
        return hit
    if kind == "pallas":
        from . import pallas_kernel

        prof = pallas_kernel.make_profile(query_enc, matrix)
        jax.block_until_ready(prof[0])
    else:
        prof = jax.device_put(xla.make_profile_t(query_enc, matrix))
    if len(_PROFILE_CACHE) >= _PROFILE_CACHE_MAX:
        _PROFILE_CACHE.pop(next(iter(_PROFILE_CACHE)))
    _PROFILE_CACHE[key] = prof
    return prof


# --- on-device result assembly ------------------------------------------------


@partial(jax.jit, static_argnames=("n_targets", "with_ends"))
def _assemble(idx_list, s_list, qe_list, te_list, n_targets, with_ends):
    """Scatter per-group per-lane results into global target order."""
    allidx = jnp.concatenate([i.reshape(-1) for i in idx_list])
    tgt = jnp.where(allidx < 0, n_targets, allidx)
    alls = jnp.concatenate([s.reshape(-1) for s in s_list])
    scores = jnp.zeros((n_targets + 1,), jnp.int32).at[tgt].set(alls)[:-1]
    if not with_ends:
        return scores
    allqe = jnp.concatenate([x.reshape(-1) for x in qe_list])
    allte = jnp.concatenate([x.reshape(-1) for x in te_list])
    q_ends = (
        jnp.full((n_targets + 1,), -1, jnp.int32).at[tgt].set(allqe)[:-1]
    )
    t_ends = (
        jnp.full((n_targets + 1,), -1, jnp.int32).at[tgt].set(allte)[:-1]
    )
    return jnp.stack([scores, q_ends, t_ends])


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
    if n == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy(), z.copy()

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

        run = partial(pallas_kernel.search_group, with_ends=with_ends)
        prof = _profile_for(query_enc, matrix, "pallas")
    else:
        run = _run_group_xla
        prof = _profile_for(query_enc, matrix, "xla")

    idx_list, s_list, qe_list, te_list = [], [], [], []
    for group in packed.groups:
        targets, lengths, indices = _device_arrays(group)
        s, qe, te = run(prof, targets, lengths, gap_open, gap_extend, algorithm)
        idx_list.append(indices)
        s_list.append(s)
        qe_list.append(qe)
        te_list.append(te)

    out = _assemble(
        tuple(idx_list),
        tuple(s_list),
        tuple(qe_list),
        tuple(te_list),
        n_targets=n,
        with_ends=with_ends,
    )
    out = np.asarray(out)  # the single host readback
    if with_ends:
        return out[0], out[1], out[2]
    return out, np.full(n, -1, np.int32), np.full(n, -1, np.int32)


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
        t_ends = (lengths - 1).astype(np.int32)
    else:
        scores = np.zeros(n, dtype=np.int64)
        t_ends = np.full(n, -1, np.int32)
    return scores.astype(np.int32), np.full(n, -1, np.int32), t_ends


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
