"""Search dispatcher: packs the database slice and runs a compute engine.

This is the TPU analog of the reference's generated platform shims
(``/root/reference/src/pyopal/platform/pyx.in:16-108``): it receives the
validated search parameters from `Aligner.align`, selects the best
engine for the current backend, runs the packed database, and assembles
result objects keyed by *global* target index — chunking never changes
scores (invariant pinned by ``pyx.in:67-69``).

Engine selection:

- **TPU**: the ragged single-launch Pallas kernel
  (`pyopal_tpu.ops.pallas_ragged`) — one dispatch covers the whole
  database and a whole query batch, with one compiled shape per
  ``(query tier, algorithm, mode)``.
- **CPU / fallback** (including queries beyond the VMEM tier): the
  vectorized XLA engine over length-bucketed groups.

Host<->device traffic is minimized for the (remote-attached) TPU path:
packed database blocks and index maps live in HBM across calls, query
profiles upload in one batched transfer, results are scattered into
global target order *on device*, and exactly one readback happens per
search call.
"""

from __future__ import annotations

from functools import partial

import threading

import numpy as np
import jax
import jax.numpy as jnp

from ..results import (
    EndResult,
    FullResult,
    ScoreResult,
    build_end_results,
    build_score_results,
)
from . import packing, xla


#: test hook: run the Pallas dispatch path (cohorts, q8 group
#: splitting, assembly, readback) with interpreted kernels on any
#: backend, so its bookkeeping is exercised without TPU hardware
_INTERPRET = False


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


def _flat_device(fp: packing.FlatPacked):
    """Device-resident flat-packed arrays, cached on the object."""
    dev = getattr(fp, "_dev", None)
    if dev is None:
        dev = (
            jax.device_put(fp.flat_targets),
            jax.device_put(fp.lengths),
            jax.device_put(fp.block_of_step),
            jax.device_put(fp.chunk_of_step),
            jax.device_put(fp.last_of_step),
            jax.device_put(fp.inv_pos),
        )
        fp._dev = dev
    return dev


# --- on-device result assembly ------------------------------------------------


@jax.jit
def _pack_rows_i16(x):
    """Pack row pairs of an int32 array into one int32 plane: row
    ``2k`` in the low 16 bits, row ``2k+1`` in the high.

    The tunneled device link moves ~33 MB/s regardless of content or
    thread count (experiments/probe_readback_*.py), so halving readback
    *bytes* halves the dominant e2e term.  Rows pair on the major axis
    — three elementwise int32 ops, no relayout (the lane-dim bitcast
    variant measured slower, DEVNOTES).  Callers must guarantee every
    value fits int16 (see `_pack16_domain`).
    """
    if x.shape[0] % 2:
        x = jnp.concatenate(
            [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0
        )
    return (x[0::2] & 0xFFFF) | (x[1::2] << 16)


def _unpack_rows_i16(packed: np.ndarray, rows: int) -> np.ndarray:
    """Host inverse of `_pack_rows_i16` (sign-extending both halves)."""
    lo = (packed & 0xFFFF).astype(np.int16).astype(np.int32)
    hi = (packed >> 16).astype(np.int32)  # arithmetic shift
    out = np.empty((packed.shape[0] * 2,) + packed.shape[1:], np.int32)
    out[0::2] = lo
    out[1::2] = hi
    return out[:rows]


def _slice_maxlen(database, start, end) -> int:
    """Longest target in ``database[start:end)``, memoized on the
    database mutation version (the O(n) scan costs ~2 ms on a 12k-seq
    database — too much for the single-query latency path)."""
    cache_d = getattr(database, "_pack_cache", None)
    key = (database.get_version(), start, end)
    # a separate (uncapped-cheap) side dict: tmax entries are tiny
    # ints, and routing them through the 16-slot pack cache used to
    # evict live packed layouts under sliding-window query patterns
    side = getattr(database, "_tmax_cache", None)
    if side is None and cache_d is not None:
        side = database.__dict__.setdefault("_tmax_cache", {})
    if side is not None:
        hit = side.get(key)
        if hit is not None:
            return hit
    lengths = database.get_lengths()
    t_max = int(max((lengths[i] for i in range(start, end)), default=0))
    if side is not None:
        if len(side) > 1024:
            side.clear()
        side[key] = t_max
    return t_max


def _pack16_domain(database, start, end, queries_enc, matrix, go, ge) -> bool:
    """Whether every readback value (scores and end coordinates) of
    this call provably fits int16.

    Unlike `_fp32_exact_domain` (which must bound every DP
    *intermediate*), only the FINAL scores matter here: the optimum is
    at least the all-diagonal-then-gap path (``>= -(min * m_max + go +
    span * ge)``) and at most one best match per aligned column
    (``<= min * m_max``).
    """
    if go < 0 or ge < 0:
        # gap *bonuses* make score magnitudes grow with path length,
        # so no static bound holds
        return False
    t_max = _slice_maxlen(database, start, end)
    q_max = int(max((q.shape[0] for q in queries_enc), default=0))
    m_max = int(np.abs(matrix).max(initial=0))
    bound = (
        min(q_max, t_max) * m_max + go + (q_max + t_max) * ge
    )
    # q_max/t_max guards cover the end coordinates (ends mode), which
    # are not bounded by the score bound when gap_extend == 0
    return bound < 2**15 and t_max < 2**15 and q_max < 2**15


@partial(jax.jit, static_argnames=("with_ends",))
def _assemble_flat(inv_pos, s, qe, te, with_ends):
    """Reorder ragged-kernel outputs ``(n_q, n_blocks, LANES)`` into
    global target order via a precomputed inverse-permutation gather
    (TPU-friendly; scatters are slow)."""
    nq = s.shape[0]

    def one(x):
        return jnp.take(x.reshape(nq, -1), inv_pos, axis=1)

    scores = one(s)
    if not with_ends:
        return scores
    return jnp.stack([scores, one(qe), one(te)], axis=1)


@partial(jax.jit, static_argnames=("with_ends",))
def _assemble_flat_q8(inv_pos, s, qe, te, with_ends):
    """Reorder q8-kernel outputs ``(n_g, n_blocks, QB, lanes)`` into
    per-slot rows in global target order (row = g * QB + qb; padding
    slots carry garbage and are skipped by the caller)."""
    n_g, n_blocks, qb, lanes = s.shape

    def one(x):
        flat = x.transpose(0, 2, 1, 3).reshape(n_g * qb, -1)
        return jnp.take(flat, inv_pos, axis=1)

    scores = one(s)
    if not with_ends:
        return scores
    return jnp.stack([scores, one(qe), one(te)], axis=1)


# --- query profile upload memoization -----------------------------------------

_PROFILE_CACHE: dict = {}
_PROFILE_CACHE_MAX = 64
# align(threads>=2) runs engine code from ThreadPool workers holding
# only the shared read lock; cache mutation needs its own guard
_PROFILE_CACHE_LOCK = threading.Lock()


def _profiles_for_cohort(cohort, matrix):
    """Device-resident stacked profiles + query lengths, memoized.

    Uploads over the (possibly remote-attached) device link are
    latency-expensive; repeated searches with the same query set reuse
    the uploaded profile stack.
    """
    from . import pallas_ragged as pr

    key = (
        b"".join(q.tobytes() + b"\xff" for q in cohort),
        matrix.tobytes(),
    )
    with _PROFILE_CACHE_LOCK:
        hit = _PROFILE_CACHE.get(key)
    if hit is not None:
        return hit
    profs_host = pr.make_profiles_host(cohort, matrix)
    profs = jnp.asarray(profs_host, dtype=jnp.bfloat16)
    qlens = jnp.asarray(np.array([len(q) for q in cohort], np.int32))
    with _PROFILE_CACHE_LOCK:
        while len(_PROFILE_CACHE) >= _PROFILE_CACHE_MAX:
            _PROFILE_CACHE.pop(next(iter(_PROFILE_CACHE)))
        _PROFILE_CACHE[key] = (profs, qlens)
    return profs, qlens


# --- engines -------------------------------------------------------------------


def _run_group_xla(prof_t, targets, lengths, go, ge, algorithm):
    """Run the vectorized XLA engine over a stacked group of blocks."""
    fn = jax.vmap(
        lambda t, l: xla.search_block(prof_t, t, l, go, ge, algorithm)
    )
    return fn(targets, lengths)


#: q8 lane width by query tier (bounded by the 16 MB scoped-VMEM limit
#: on its (Q_pad, 8, lanes) f32 H/E + (ncols, Q_pad, 8, lanes) bf16 S
#: scratch); tiers beyond 512 stay on the v2 ragged kernel, which wins
#: there (see DEVNOTES.md).
_Q8_LANES_BY_TIER = {64: 512, 128: 512, 256: 512, 512: 256}

#: leftover-cohort size at which a PARTIAL q8 group (empty sublane
#: slots) beats a v2 launch: the group costs a fixed 8-slot sweep at
#: ~207 GCUPS vs the v2 kernel's per-query ~135 (see DEVNOTES.md)
_Q8_PARTIAL_MIN = 6

#: q8 groups (of 8 queries) per kernel launch.  Batches beyond the
#: quantum split into multiple launches, which bounds the set of
#: compiled n_groups shapes to {quantum, remainders < quantum}.
#: Measured on the tunneled dev device, splitting does NOT overlap
#: readbacks with compute (the link serializes transfers), so the
#: quantum is set at the bench batch size; on directly-attached
#: hardware a smaller quantum pipelines transfer under compute.
_Q8_LAUNCH_GROUPS = 8


def plan_tier_launches(queries_enc, safe_pad):
    """Plan kernel routing for a query batch, shared by the
    single-device dispatcher and the mesh front-end
    (`pyopal_tpu.parallel.align_arrays_sharded`).

    Queries are grouped into cohorts by profile tier (padded query
    length); within each tier, full groups of `pallas_q8.QB` queries
    take the query-packed q8 kernel when the tier has a q8 lane route
    and the matrix allows the padded-profile trick, and the remainder
    takes the v2 ragged kernel.

    Returns a list of ``(tier, lanes_q8, q8_groups, v2_idx)`` sorted by
    tier: ``q8_groups`` is a list of QB-length lists of query indices
    (empty when nothing routes to q8), ``v2_idx`` the leftover indices.
    """
    from . import pallas_q8 as q8
    from . import pallas_ragged as pr

    cohorts: dict = {}
    for i, q in enumerate(queries_enc):
        tier = pr.profile_qpad(max(len(q), 8))
        cohorts.setdefault(tier, []).append(i)

    plan = []
    for tier, qidx in sorted(cohorts.items()):
        lanes_q8 = _Q8_LANES_BY_TIER.get(tier) if safe_pad else None
        q8_idx, v2_idx = [], qidx
        if lanes_q8 is not None:
            order = sorted(qidx, key=lambda i: -queries_enc[i].shape[0])
            m = (len(order) // q8.QB) * q8.QB
            # a partial q8 group still sweeps the database with all
            # QB sublane slots, so it costs ~QB/207 GCUPS-normalized
            # units vs the v2 kernel's L/135 for L leftover queries:
            # the padded group wins once L >= 6 (break-even 5.2)
            if len(order) - m >= _Q8_PARTIAL_MIN:
                m = len(order)
            q8_idx, v2_idx = order[:m], order[m:]
        groups = [
            q8_idx[k : k + q8.QB] for k in range(0, len(q8_idx), q8.QB)
        ]
        plan.append((tier, lanes_q8, groups, v2_idx))
    return plan


def _profiles_q8(queries_enc, matrix, groups, lanes):
    """Device-resident q8 profile stack (+qv/maxq), memoized like
    `_profiles_for_cohort`."""
    from . import pallas_q8 as q8

    key = (
        "q8",
        lanes,
        b"".join(
            queries_enc[i].tobytes() + b"\xff" for g in groups for i in g
        ),
        matrix.tobytes(),
    )
    with _PROFILE_CACHE_LOCK:
        hit = _PROFILE_CACHE.get(key)
    if hit is not None:
        return hit
    profs, qv, maxq = q8.make_profiles_q8_host(
        queries_enc, matrix, groups, lanes=lanes
    )
    out = (
        jnp.asarray(profs, dtype=jnp.bfloat16),
        jnp.asarray(qv),
        jnp.asarray(maxq),
    )
    with _PROFILE_CACHE_LOCK:
        while len(_PROFILE_CACHE) >= _PROFILE_CACHE_MAX:
            _PROFILE_CACHE.pop(next(iter(_PROFILE_CACHE)))
        _PROFILE_CACHE[key] = out
    return out


def _search_batch_pallas(
    database, start, end, queries_enc, matrix, go, ge, algorithm, with_ends
):
    """Pallas path: one launch per query-tier cohort.

    Full groups of `pallas_q8.QB` same-tier queries take the
    query-packed q8 kernel (scan-free, fastest); leftovers and tiers
    beyond its VMEM ceiling take the v2 ragged kernel.  Results are
    assembled into global target order on device, then each launch's
    block starts streaming to the host immediately
    (``copy_to_host_async``) so transfers overlap later launches'
    compute — only the last block's transfer is exposed
    (experiments/probe_readback_overlap.py: 772 ms vs 951 ms for a
    stacked end readback on 3 MB / 4 launches).
    """
    from . import pallas_q8 as q8
    from . import pallas_ragged as pr
    from ..utils import cache

    cache.enable()
    nq = len(queries_enc)
    n = max(end - start, 0)
    safe_pad = matrix.shape[1] <= 31

    fp128 = None

    def _fp():
        nonlocal fp128
        if fp128 is None:
            fp128 = packing.pack_database_slice_flat(database, start, end)
        return fp128

    pack16 = _pack16_domain(
        database, start, end, queries_enc, matrix, go, ge
    )
    launches = []  # (device array, rows, row→query-index list)

    def _emit(dev_out, order):
        # per-launch i16 row-pair pack (halves wire bytes when every
        # value provably fits int16) + immediate async D2H
        if pack16:
            dev_out = _pack_rows_i16(dev_out)
        try:
            dev_out.copy_to_host_async()
        except AttributeError:  # interpret-mode / tracer outputs
            pass
        launches.append((dev_out, len(order), order))

    for tier, lanes_q8, groups, v2_idx in plan_tier_launches(
        queries_enc, safe_pad
    ):
        if groups:
            fpw = packing.pack_database_slice_flat(
                database, start, end, lanes=lanes_q8
            )
            flat_t, lengths, bos, cos, los, inv_pos = _flat_device(fpw)
            # split large batches into launch quanta: the per-launch
            # result buffers read back while later launches compute,
            # hiding all but the last transfer behind kernel time (and
            # quantizing n_groups keeps the compiled-shape set small)
            for k in range(0, len(groups), _Q8_LAUNCH_GROUPS):
                gs = groups[k : k + _Q8_LAUNCH_GROUPS]
                profs, qv, maxq = _profiles_q8(
                    queries_enc, matrix, gs, lanes_q8
                )
                s, qe, te = q8.search_flat_q8(
                    profs,
                    qv,
                    maxq,
                    flat_t,
                    lengths,
                    bos,
                    cos,
                    los,
                    int(go),
                    int(ge),
                    algorithm,
                    with_ends,
                    interpret=_INTERPRET,
                    chunk=fpw.chunk,
                )
                _emit(
                    _assemble_flat_q8(
                        inv_pos, s, qe, te, with_ends=with_ends
                    ),
                    [qi for g in gs for qi in g],
                )

        if v2_idx:
            cohort = [queries_enc[i] for i in v2_idx]
            fp = _fp()
            flat_t, lengths, bos, cos, los, inv_pos = _flat_device(fp)
            profs, qlens = _profiles_for_cohort(cohort, matrix)
            s, qe, te = pr.search_flat(
                profs,
                qlens,
                flat_t,
                lengths,
                bos,
                cos,
                los,
                int(go),
                int(ge),
                algorithm,
                with_ends,
                interpret=_INTERPRET,
                chunk=fp.chunk,
                # pad symbol 31 scores PAD for every query row iff the
                # alphabet leaves profile column 31 unused
                safe_pad=safe_pad,
            )
            _emit(
                _assemble_flat(inv_pos, s, qe, te, with_ends=with_ends),
                list(v2_idx),
            )

    # gather: every block but the last already transferred during
    # compute; ``np.asarray`` per block just waits on its copy
    scores = np.zeros((nq, n), dtype=np.int32)
    q_ends = np.full((nq, n), -1, dtype=np.int32)
    t_ends = np.full((nq, n), -1, dtype=np.int32)
    for dev_out, rows, order in launches:
        if pack16:
            block = _unpack_rows_i16(np.asarray(dev_out), rows)
        else:
            block = np.asarray(dev_out)
        for pos, qi in enumerate(order):
            if with_ends:
                scores[qi] = block[pos, 0]
                q_ends[qi] = block[pos, 1]
                t_ends[qi] = block[pos, 2]
            else:
                scores[qi] = block[pos]
    return scores, q_ends, t_ends


def _device_arrays_trimmed(group: packing.PackedGroup):
    """Like `_device_arrays`, but padding lanes beyond the group's
    widest block are sliced off first (to a multiple of 8 lanes).

    The 128-lane block width is a TPU vreg constraint; the XLA engine
    vectorizes over however many lanes it is given, so a near-empty
    block (e.g. a 3-sequence database) must not pay for 128 lanes of
    DP — that is a 40x waste on the very path (CPU fallback) least
    able to absorb it."""
    used = int((group.indices >= 0).sum(axis=1).max(initial=0))
    width = max(-(-used // 8) * 8, 8)
    if width >= group.targets.shape[2]:
        return _device_arrays(group)
    dev = getattr(group, "_dev_trim", None)
    if dev is None:
        dev = (
            jax.device_put(group.targets[:, :, :width].astype(np.int32)),
            jax.device_put(group.lengths[:, :width]),
            jax.device_put(group.indices[:, :width]),
        )
        group._dev_trim = dev
    return dev


def _search_batch_xla(
    database, start, end, queries_enc, matrix, go, ge, algorithm, with_ends
):
    """Grouped XLA-engine path (CPU backend / oversized queries)."""
    packed = packing.pack_database_slice(database, start, end)
    n = packed.n_targets
    nq = len(queries_enc)
    scores = np.zeros((nq, n), dtype=np.int32)
    q_ends = np.full((nq, n), -1, dtype=np.int32)
    t_ends = np.full((nq, n), -1, dtype=np.int32)

    for qi, query_enc in enumerate(queries_enc):
        prof = xla.make_profile_t(query_enc, matrix)
        for group in packed.groups:
            targets, lengths, indices = _device_arrays_trimmed(group)
            s, qe, te = _run_group_xla(
                prof, targets, lengths, go, ge, algorithm
            )
            s = np.asarray(s).reshape(-1)
            qe = np.asarray(qe).reshape(-1)
            te = np.asarray(te).reshape(-1)
            # indices from the (possibly lane-trimmed) device arrays,
            # not group.indices: shapes must match the outputs
            idx = np.asarray(indices).reshape(-1)
            valid = idx >= 0
            scores[qi, idx[valid]] = s[valid]
            q_ends[qi, idx[valid]] = qe[valid]
            t_ends[qi, idx[valid]] = te[valid]
    return scores, q_ends, t_ends


#: fp32 represents every integer in (-2**24, 2**24) exactly; the Pallas
#: kernels carry H/E in fp32, so any call whose DP values could leave
#: that window must take the int32 XLA engine instead
_FP32_EXACT_BOUND = 2**24


def _fp32_exact_domain(
    database, start, end, queries_enc, matrix, gap_open, gap_extend
) -> bool:
    """Whether every DP intermediate of this call fits the fp32
    exact-integer window (the TPU analog of the reference's precision
    escalation — ``/root/reference/src/pyopal/lib.pyx:1283-1289``:
    narrow passes are an optimization that must never be silently
    wrong, SURVEY.md section 7).

    The bound is static and conservative: positive values are capped by
    one match per aligned column, negative ones by a full gap chain
    plus one maximal mismatch per column.
    """
    if gap_open < 0 or gap_extend < 0:
        # gap *bonuses* make score magnitudes grow with path length;
        # the static bound below assumes penalties, so route such
        # (pathological but accepted) parameters to the int32 engine
        return False
    t_max = _slice_maxlen(database, start, end)
    q_max = int(max((q.shape[0] for q in queries_enc), default=0))
    m_max = int(np.abs(matrix).max(initial=0))
    span = q_max + t_max
    bound = span * m_max + gap_open + span * gap_extend
    # the kernels also hold E/F (>= -(bound + go)) and the F-scan's
    # offset intermediates tmp + row * min(go, ge) (rows up to the
    # padded query tier, <= 2*q_max for power-of-two tiers and
    # q_max + 512 for fine tiers) — all of those must stay inside the
    # fp32 exact-integer window too, not just H
    q_pad_bound = max(2 * q_max, q_max + 512, 64)
    worst = bound + gap_open + q_pad_bound * min(gap_open, gap_extend)
    return worst < _FP32_EXACT_BOUND


def search_scores_batch(
    database,
    start: int,
    end: int,
    queries_enc,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    algorithm: str,
    with_ends: bool = True,
):
    """Pipelined multi-query search over ``database[start:end)``.

    Returns ``(scores, q_ends, t_ends)`` of shape
    ``(n_queries, n_targets)`` each, in slice-local target order.
    Must be called with the database read lock held.
    """
    n = end - start
    nq = len(queries_enc)
    if n <= 0 or nq == 0:
        z = np.zeros((nq, max(n, 0)), dtype=np.int32)
        return z, z.copy(), z.copy()

    queries_enc = [np.asarray(q, dtype=np.uint8) for q in queries_enc]

    # queries the device engines cannot take (empty / beyond VMEM tier)
    # are answered by the host paths below.  The Pallas kernels look up
    # profile scores through a bf16 MXU matmul, exact only for integer
    # entries within +-256; larger (custom) matrices take the int32 XLA
    # engine instead.
    use_pallas = (
        (_backend_kind() == "tpu" or _INTERPRET)
        and np.abs(matrix).max(initial=0) <= 256
        and _fp32_exact_domain(
            database, start, end, queries_enc, matrix, gap_open, gap_extend
        )
    )
    if use_pallas:
        from . import pallas_ragged as pr

        device_ok = [
            q.shape[0] > 0
            and pr.supports(
                q.shape[0],
                algorithm,
                with_ends,
                safe_pad=matrix.shape[1] <= 31,
            )
            for q in queries_enc
        ]
    else:
        device_ok = [q.shape[0] > 0 for q in queries_enc]

    scores = np.zeros((nq, n), dtype=np.int32)
    q_ends = np.full((nq, n), -1, dtype=np.int32)
    t_ends = np.full((nq, n), -1, dtype=np.int32)

    dev_idx = [i for i, ok in enumerate(device_ok) if ok]
    if dev_idx:
        run = _search_batch_pallas if use_pallas else _search_batch_xla
        s, qe, te = run(
            database,
            start,
            end,
            [queries_enc[i] for i in dev_idx],
            matrix,
            gap_open,
            gap_extend,
            algorithm,
            with_ends,
        )
        for k, i in enumerate(dev_idx):
            scores[i], q_ends[i], t_ends[i] = s[k], qe[k], te[k]

    for i, ok in enumerate(device_ok):
        if ok:
            continue
        q = queries_enc[i]
        if q.shape[0] == 0:
            scores[i], q_ends[i], t_ends[i] = _empty_query_results(
                database, start, end, gap_open, gap_extend, algorithm
            )
        elif use_pallas:
            # long query: segmented ragged kernel (sequential launches
            # over QSEG query rows, boundary state in HBM)
            s, qe, te = _search_long_pallas(
                database,
                start,
                end,
                q,
                matrix,
                gap_open,
                gap_extend,
                algorithm,
                with_ends,
            )
            scores[i], q_ends[i], t_ends[i] = s, qe, te
        else:
            s, qe, te = _search_batch_xla(
                database,
                start,
                end,
                [q],
                matrix,
                gap_open,
                gap_extend,
                algorithm,
                with_ends,
            )
            scores[i], q_ends[i], t_ends[i] = s[0], qe[0], te[0]
    return scores, q_ends, t_ends


def _search_long_pallas(
    database, start, end, query_enc, matrix, go, ge, algorithm, with_ends
):
    """Long-query search: fine-tier v2 launch, or the segmented kernel.

    A query beyond the batched tiers first tries ONE v2 strip-kernel
    launch at a `pallas_ragged.fine_qpad` tier (512-quantum padding —
    2.4% pad rows at 5000 aa vs 64% at the power-of-two tier), which
    measures ~2x the segmented kernel's throughput; only queries whose
    fine-tier scratch would blow the VMEM budget (or 32-letter custom
    matrices, which v2's safe_pad argument excludes) take the
    segmented multi-launch path.
    """
    from . import pallas_kernel as pk
    from . import pallas_ragged as pr
    from . import pallas_ragged_long as prl
    from ..utils import cache

    cache.enable()
    fp = packing.pack_database_slice_flat(database, start, end)
    flat_t, lengths, bos, cos, los, inv_pos = _flat_device(fp)
    safe_pad = matrix.shape[1] <= 31
    Q = int(query_enc.shape[0])
    if safe_pad and pr.supports_fine(Q, algorithm, with_ends):
        q_pad = pr.fine_qpad(Q)
        S = np.asarray(matrix, dtype=np.float32)
        prof = np.full((1, q_pad, pk.ALPHA), pk.PAD_SCORE, np.float32)
        prof[0, :Q, : S.shape[1]] = S[query_enc.astype(np.int64), :]
        s, qe, te = pr.search_flat(
            jnp.asarray(prof, jnp.bfloat16),
            jnp.asarray(np.array([Q], np.int32)),
            flat_t,
            lengths,
            bos,
            cos,
            los,
            int(go),
            int(ge),
            algorithm,
            with_ends,
            interpret=_INTERPRET,
            chunk=fp.chunk,
            safe_pad=True,
        )
        s, qe, te = s[0], qe[0], te[0]
    else:
        s, qe, te = prl.search_flat_long(
            query_enc,
            matrix,
            flat_t,
            lengths,
            bos,
            cos,
            los,
            int(go),
            int(ge),
            algorithm,
            with_ends,
            interpret=_INTERPRET,
            chunk=fp.chunk,
        )
    flatpos = np.asarray(fp.inv_pos)
    # one readback for all three planes (a separate np.asarray each
    # would pay the link's ~28 ms base RTT three times)
    stacked = np.asarray(
        jnp.stack(
            [s.reshape(-1), qe.reshape(-1), te.reshape(-1)], axis=0
        )
    )[:, flatpos]
    return stacked[0], stacked[1], stacked[2]


def search_scores(
    database,
    start: int,
    end: int,
    query_enc: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    algorithm: str,
    with_ends: bool = True,
):
    """Single-query search; see `search_scores_batch`."""
    s, qe, te = search_scores_batch(
        database,
        start,
        end,
        [query_enc],
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        with_ends=with_ends,
    )
    return s[0], qe[0], te[0]


def _empty_query_results(database, start, end, go, ge, algorithm):
    n = end - start
    lengths = np.asarray(
        database.get_lengths()[start:end], dtype=np.int64
    )
    if algorithm == "nw":
        scores = np.where(lengths > 0, -(go + (lengths - 1) * ge), 0)
        t_ends = (lengths - 1).astype(np.int32)
    else:
        scores = np.zeros(n, dtype=np.int64)
        t_ends = np.full(n, -1, np.int32)
    return scores.astype(np.int32), np.full(n, -1, np.int32), t_ends


def _full_rows_for(
    database, indices, query_enc, matrix, go, ge, algorithm, ends
):
    """Raw full-alignment rows for ``indices`` (global) given a score
    pass: ``(targets, rows)`` where ``rows[k]`` is the
    ``(score, q_start, t_start, q_end, t_end, ops)`` tuple for
    ``indices[k]``, cross-checked against the kernel score.

    ``ends`` holds per-selected-target ``(scores, q_ends, t_ends)``
    1-D arrays aligned with ``indices``.
    """
    from . import traceback as tb

    targets = [database.get_encoded(int(i)) for i in indices]
    outs = tb.full_alignments_batch(
        query_enc, targets, matrix, go, ge, algorithm, ends
    )
    for k, row in enumerate(outs):
        if row[0] != int(ends[0][k]):
            # a kernel/traceback divergence is exactly the bug class
            # this guard exists for; it must fire under -O too
            raise RuntimeError(
                f"traceback score {row[0]} != kernel score "
                f"{int(ends[0][k])} for target {int(indices[k])}"
            )
    return targets, outs


def _full_results_for(
    database, indices, query_enc, matrix, go, ge, algorithm, ends
):
    """`FullResult` objects for ``indices`` (global) given a score pass.

    ``ends`` holds per-selected-target ``(scores, q_ends, t_ends)``
    1-D arrays aligned with ``indices``.
    """
    Q = int(query_enc.shape[0])
    targets, outs = _full_rows_for(
        database, indices, query_enc, matrix, go, ge, algorithm, ends
    )
    return [
        FullResult(
            int(indices[k]),
            score,
            qe,
            te,
            qs,
            ts,
            Q,
            int(targets[k].shape[0]),
            ops,
        )
        for k, (score, qs, ts, qe, te, ops) in enumerate(outs)
    ]


def search_full_batch(
    database,
    start: int,
    end: int,
    queries_enc,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    algorithm: str,
):
    """Batched ``mode="full"`` search: one fused score+ends pass over
    ``database[start:end)`` for every query, then per-query batched
    traceback of every target (reference parity: its one ``align()``
    covers all three modes over a slice,
    ``/root/reference/src/pyopal/lib.pyx:1278-1282``).

    Returns one `FullResult` list per query.  Must be called with the
    database read lock held.
    """
    scores, q_ends, t_ends = search_scores_batch(
        database,
        start,
        end,
        queries_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        with_ends=True,
    )
    indices = np.arange(start, end)
    return [
        _full_results_for(
            database,
            indices,
            queries_enc[qi],
            matrix,
            gap_open,
            gap_extend,
            algorithm,
            (scores[qi], q_ends[qi], t_ends[qi]),
        )
        for qi in range(len(queries_enc))
    ]


def full_arrays_from_ends(
    database, start, end, queries_enc, matrix, go, ge, algorithm, ends
):
    """Columnar ``mode="full"`` assembly from a score+ends pass.

    ``ends`` is ``(scores, q_ends, t_ends)``, each of shape
    ``(n_queries, end - start)``.  Returns the extra full-mode arrays:
    ``query_starts``/``target_starts`` int32 arrays of the same shape
    (``0`` for empty alignments, matching the reference's
    zero-initialized start locations) and ``cigars``, an object array
    of SAM CIGAR strings (`None` for empty alignments, like
    `FullResult.cigar`).  Must be called with the read lock held.
    """
    from ..results import cigar_string

    scores, q_ends, t_ends = ends
    nq, n = scores.shape
    q_starts = np.zeros((nq, n), dtype=np.int32)
    t_starts = np.zeros((nq, n), dtype=np.int32)
    cigars = np.empty((nq, n), dtype=object)
    indices = np.arange(start, end)
    for qi in range(nq):
        _, rows = _full_rows_for(
            database,
            indices,
            queries_enc[qi],
            matrix,
            go,
            ge,
            algorithm,
            (scores[qi], q_ends[qi], t_ends[qi]),
        )
        for k, (_, qs, ts, _, _, ops) in enumerate(rows):
            q_starts[qi, k] = qs
            t_starts[qi, k] = ts
            cigars[qi, k] = cigar_string(ops)
    return q_starts, t_starts, cigars


def search_top_k(
    database,
    query_enc: np.ndarray,
    matrix: np.ndarray,
    gap_open: int,
    gap_extend: int,
    algorithm: str,
    k: int,
    start: int,
    end: int,
):
    """Two-phase top-k search: score+ends pass, then realign k hits.

    The TPU-first shape of the reference's documented workflow (score
    pass -> extract top hits -> full-mode realign, see the reference
    example notebook ``/root/reference/docs/examples/``): one fused
    kernel dispatch scores the whole slice, the top ``k`` targets by
    score (ties broken by database order) are selected on the host, and
    only those are realigned — no sub-database repacking, no second
    score pass.  Returns `FullResult` objects sorted by descending
    score; ``target_index`` stays global.  Must be called with the
    database read lock held.
    """
    n = max(end - start, 0)
    k = max(min(k, n), 0)
    if k == 0:
        return []
    scores, q_ends, t_ends = search_scores(
        database,
        start,
        end,
        query_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        with_ends=True,
    )
    order = np.argsort(-scores, kind="stable")[:k]
    sel = (scores[order], q_ends[order], t_ends[order])
    return _full_results_for(
        database,
        order + start,
        query_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        sel,
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
    n = max(end - start, 0)
    scores, q_ends, t_ends = search_scores(
        database,
        start,
        end,
        query_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        with_ends=(mode != "score"),
    )

    if mode == "score":
        return build_score_results(start, scores)
    if mode == "end":
        return build_end_results(start, scores, q_ends, t_ends)

    # mode == "full": batched two-phase reconstruction (reference
    # strategy: SIMD score pass then pairwise recompute [upstream]) —
    # the direction matrices are computed on-device in padded batches
    return _full_results_for(
        database,
        np.arange(start, end),
        query_enc,
        matrix,
        gap_open,
        gap_extend,
        algorithm,
        (scores, q_ends, t_ends),
    )
