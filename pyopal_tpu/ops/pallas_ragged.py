"""Ragged single-launch Pallas kernel: whole database, one dispatch.

Evolution of `pyopal_tpu.ops.pallas_kernel` driven by three measured
costs on the target system:

1. kernel compiles are expensive and keyed by shape — so the grid must
   not depend on target lengths.  Here the grid is
   ``(n_queries, n_steps)`` where a *step* is one fixed-size chunk of
   ``CHUNK`` target columns of some block; blocks of any padded length
   concatenate into one flat ``(total_rows, LANES)`` array and a
   scalar-prefetched ``block_of_step`` map tells each step which
   block's lengths/outputs it addresses.  One compiled shape serves
   every database layout with the same ``(Q_pad, algorithm, mode)``.

2. per-call dispatch overhead — one ``pallas_call`` covers the whole
   database *and* a whole query batch (the query axis is the outer grid
   dimension; profiles are stacked on device).

3. padding waste — block lengths quantize to ``CHUNK`` (128 columns)
   instead of powers of two.

DP semantics, layout, and the exact F-scan are identical to
`pallas_kernel` (one target per lane, one-hot MXU profile matmul,
bit-exact fp32); cross-validated against the naive oracle in
``tests/test_engines.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import ALGORITHMS
from .pallas_kernel import (
    ALPHA,
    NEG,
    PAD_SCORE,
    _cummax,
    _first_argmax,
    _shift_down,
)

LANES = 128
CHUNK = 128  # default target columns per grid step (= flat-layout quantum)
UNROLL = 16  # column-loop unroll factor (ILP across F-scan chains)
#: Flat packing pads target columns with this symbol.  When the
#: alphabet has <= 31 letters, profile column 31 is PAD_SCORE for every
#: query row, so out-of-range columns decay to 0 under the SW clamp and
#: a running elementwise ``best`` needs no per-column validity masking.
PAD_SYMBOL = 31


#: Queries beyond this tier go to the segmented long-query kernel
#: (`pallas_ragged_long`): at the 4096 tier the column-loop temporaries
#: (~6 live (Q_pad, LANES) f32 arrays) blow the 16 MB scoped-VMEM limit.
RAGGED_MAX_QPAD = 2048

#: Strip height for the strip-blocked bestvec kernel (SW score-only).
#: Strips cut the exact F max-scan from log2(Q_pad) to log2(STRIP)
#: shift+max rounds per column at the cost of per-column boundary
#: carries in VMEM; measured +20% at Q_pad >= 1024
#: (experiments/bench_strip.py, validated cell-exact vs the full scan).
STRIP = 256
#: Use the strip kernel at tiers where the scan saving beats the
#: boundary-carry overhead (at 256 it ties; below it loses).
STRIP_MIN_QPAD = 512


#: The strip-blocked bestvec kernel's ceiling: its live column-loop
#: temporaries are (STRIP, LANES) regardless of tier, so only the
#: H/E/best scratch (3 x Q_pad x 128 f32 = 6.3 MB at 4096) bounds it.
RAGGED_MAX_QPAD_STRIP = 4096


def supports(
    Q: int,
    algorithm: str = "sw",
    with_ends: bool = True,
    safe_pad: bool = False,
) -> bool:
    """Whether `search_flat` can take a query of length ``Q``.

    With ``safe_pad`` flat packing the unified strip kernel
    (`_ragged_kernel_v2`) serves every algorithm and mode up to
    `RAGGED_MAX_QPAD_STRIP` (its live column-loop temporaries are
    ``(strip, LANES)`` and the per-row trackers are elementwise).
    Without it, the generic full-scan kernel tops out at
    `RAGGED_MAX_QPAD`.
    """
    del algorithm
    if not 0 < Q:
        return False
    if safe_pad:
        return Q <= RAGGED_MAX_QPAD_STRIP
    if Q <= RAGGED_MAX_QPAD:
        return True
    return (not with_ends) and Q <= RAGGED_MAX_QPAD_STRIP


def profile_qpad(Q: int) -> int:
    """Pad query length to a power-of-two tier (bounds compile count)."""
    tier = 64
    while tier < Q:
        tier *= 2
    return tier


#: fine-tier quantum for long single queries (`fine_qpad`); must be a
#: multiple of `STRIP`
FINE_QUANTUM = 512

#: scoped-VMEM budget for a fine-tier v2 launch: the 16 MB limit minus
#: headroom for the profile block, target chunk, boundary scratch and
#: compiler temporaries (v2's live column-loop temporaries are
#: (strip, LANES), so the statically declared scratch dominates)
V2_FINE_BUDGET = 13_500_000


def fine_qpad(Q: int) -> int:
    """Pad a LONG query to the `FINE_QUANTUM` grid instead of a power
    of two: at 5000 aa the power-of-two tier (8192) wastes 64% of the
    sweep on pad rows, the fine tier (5120) 2.4%.  Used only by the
    single-long-query path (`engine._search_long_pallas`), where each
    query compiles its own shape anyway."""
    return max(-(-Q // FINE_QUANTUM) * FINE_QUANTUM, FINE_QUANTUM)


def v2_scratch_bytes(Q_pad: int, algorithm: str, with_ends: bool) -> int:
    """Bytes of (Q_pad, LANES) VMEM scratch a v2 launch declares."""
    n = 2  # H, E
    if algorithm != "nw":
        n += 1  # best
        if with_ends:
            n += 1  # bestj
    if algorithm in ("nw", "ov"):
        n += 1  # cap
    return n * Q_pad * LANES * 4


def supports_fine(Q: int, algorithm: str, with_ends: bool) -> bool:
    """Whether a single long query fits a fine-tier v2 launch
    (safe_pad packing assumed; beyond this the segmented kernel
    takes over)."""
    if Q <= 0:
        return False
    q_pad = fine_qpad(Q)
    return v2_scratch_bytes(q_pad, algorithm, with_ends) <= V2_FINE_BUDGET


def make_profiles_host(queries_enc, matrix) -> np.ndarray:
    """Stacked ``(n_q, Q_pad, 32)`` fp32 profiles at a common tier."""
    qmax = max(len(q) for q in queries_enc)
    Q_pad = profile_qpad(max(qmax, 8))
    profs = np.full(
        (len(queries_enc), Q_pad, ALPHA), PAD_SCORE, dtype=np.float32
    )
    S = np.asarray(matrix, dtype=np.float32)
    for i, q in enumerate(queries_enc):
        q = np.asarray(q, dtype=np.int64)
        profs[i, : q.shape[0], : S.shape[1]] = S[q, :]
    return profs


def _ragged_kernel(
    # scalar prefetch
    bos_ref,  # (n_steps,) block index of step
    cos_ref,  # (n_steps,) chunk index within block
    los_ref,  # (n_steps,) 1 if last chunk of block
    qlen_ref,  # (n_q,) true query lengths
    # inputs
    prof_ref,  # (1, Q_pad, 32) bf16 (current query)
    targets_ref,  # (CHUNK, LANES) int32
    lengths_ref,  # (1, 1, LANES) int32
    # outputs
    scores_ref,  # (1, 1, 1, LANES) int32
    qend_ref,
    tend_ref,
    # scratch
    H_ref,  # (Q_pad, LANES) f32
    E_ref,  # (Q_pad, LANES) f32
    trk_f_ref,  # (8, LANES) f32: 0=best 1=cap
    trk_i_ref,  # (8, LANES) i32: 0=bi 1=bj 2=lc_i
    best_ref,  # (Q_pad, LANES) f32 running max (bestvec mode) or (8, ...)
    *,
    algorithm: str,
    go: int,
    ge: int,
    with_ends: bool,
    chunk: int,
    unroll: int,
    bestvec: bool,
):
    spec = ALGORITHMS[algorithm]
    Q_pad, L = H_ref.shape
    qi = pl.program_id(0)
    i = pl.program_id(1)
    c = cos_ref[i]
    is_last = los_ref[i] == 1
    Q = qlen_ref[qi]  # dynamic true query length (same compiled tier)
    Qf = Q.astype(jnp.float32)

    gof = np.float32(go)
    gef = np.float32(ge)
    gmin = np.float32(min(go, ge))

    lengths = lengths_ref[0, 0:1, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
    ivec = row_iota.astype(jnp.float32) * gmin

    @pl.when(c == 0)
    def _init():
        if spec.penalize_first_col:
            col0 = -(gof + row_iota.astype(jnp.float32) * gef)
        else:
            col0 = jnp.zeros((Q_pad, L), jnp.float32)
        H_ref[:] = col0
        E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
        if spec.track_terminal:
            cap0 = -(gof + (Qf - 1.0) * gef)
        else:
            cap0 = NEG
        if spec.track_last_row:
            if spec.penalize_first_col:
                best0 = -(gof + (Qf - 1.0) * gef)
            else:
                best0 = jnp.float32(0.0)
        else:
            best0 = jnp.float32(0.0)
        trk_f_ref[0:1, :] = jnp.full((1, L), best0, jnp.float32)
        trk_f_ref[1:2, :] = jnp.full((1, L), cap0, jnp.float32)
        trk_i_ref[0:1, :] = jnp.full((1, L), -1, jnp.int32)
        trk_i_ref[1:2, :] = jnp.full((1, L), -1, jnp.int32)
        trk_i_ref[2:3, :] = jnp.full((1, L), -1, jnp.int32)
        if bestvec:
            best_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)

    alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)
    prof = prof_ref[0]  # (Q_pad, 32) bf16
    # padded profile rows already carry PAD_SCORE for rows >= true Q
    last_row_sel = row_iota == (Q - 1)
    # F-scan constant, folded: F[i] = C[i-1] - ivec[i] - go + gmin where
    # C = cummax(tmp + ivec) (see pallas_kernel module docstring)
    ivec_f = ivec + (gof - gmin)

    def column(jj, carry):
        # DP state and trackers ride the loop carry (vector registers);
        # VMEM scratch is only touched once per grid step
        H, E, best, cap, bi, bj, lc = carry
        j = c * chunk + jj
        sym = targets_ref[pl.ds(jj, 1), :]  # (1, LANES)
        onehot = (alpha_iota == sym).astype(jnp.bfloat16)
        prof_col = jax.lax.dot_general(
            prof,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        E_new = jnp.maximum(H - gof, E - gef)

        jf = j.astype(jnp.float32)
        if spec.penalize_first_row:
            row0_cur = -(gof + jf * gef)
            row0_prev = jnp.where(j == 0, 0.0, -(gof + (jf - 1.0) * gef))
        else:
            row0_cur = jnp.float32(0.0)
            row0_prev = jnp.float32(0.0)

        shifted = _shift_down(H, 1, 0.0)
        if spec.penalize_first_row:
            # top fill must be the (penalized) row-0 boundary; for the
            # other algorithms the 0.0 fill above is already correct
            shifted = jnp.where(row_iota == 0, row0_prev, shifted)
        diag = shifted + prof_col

        tmp = jnp.maximum(diag, E_new)
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0.0)

        C = _cummax(tmp + ivec)
        Cs = _shift_down(C, 1, NEG)
        if spec.clamp_zero and not spec.penalize_first_row:
            # sw: the row-0 boundary F candidate is -(i*gmin + go) < 0
            # <= tmp (clamped), hence redundant
            F = Cs - ivec_f
        else:
            # Gs[i] = C[i-1] - ivec[i-1] = Cs[i] - (ivec[i] - gmin)
            F = jnp.maximum(Cs - (ivec - gmin), row0_cur - ivec) - gof
        H_new = jnp.maximum(tmp, F)

        valid = j < lengths
        at_end = j == (lengths - 1)

        if spec.track_all_cells:  # sw
            if bestvec:
                # pad columns/rows can never win (PAD_SYMBOL scoring):
                # one elementwise max per column, reduced at finalize
                best = jnp.maximum(best, H_new)
            elif with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                upd = valid & (colmax > best)
                best = jnp.where(upd, colmax, best)
                bi = jnp.where(upd, coli, bi)
                bj = jnp.where(upd, j, bj)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
                upd = valid & (colmax > best)
                best = jnp.where(upd, colmax, best)
        if spec.track_last_row:  # hw / ov — dynamic last row select
            rowval = jnp.max(
                jnp.where(last_row_sel, H_new, NEG), axis=0, keepdims=True
            )
            upd = valid & (rowval > best)
            best = jnp.where(upd, rowval, best)
            if with_ends:
                bj = jnp.where(upd, j, bj)
        if spec.track_terminal:  # nw
            rowval = jnp.max(
                jnp.where(last_row_sel, H_new, NEG), axis=0, keepdims=True
            )
            cap = jnp.where(at_end, rowval, cap)
        if spec.track_last_col:  # ov
            if with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                lc = jnp.where(at_end, coli, lc)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
            cap = jnp.where(at_end, colmax, cap)
        return H_new, E_new, best, cap, bi, bj, lc

    def body(base, carry):
        for u in range(unroll):
            carry = column(base * unroll + u, carry)
        return carry

    carry0 = (
        H_ref[:],
        E_ref[:],
        best_ref[:] if bestvec else trk_f_ref[0:1, :],
        trk_f_ref[1:2, :],
        trk_i_ref[0:1, :],
        trk_i_ref[1:2, :],
        trk_i_ref[2:3, :],
    )
    H, E, best, cap, bi, bj, lc = jax.lax.fori_loop(
        0, chunk // unroll, body, carry0
    )
    H_ref[:] = H
    E_ref[:] = E
    if bestvec:
        best_ref[:] = best
    else:
        trk_f_ref[0:1, :] = best
    trk_f_ref[1:2, :] = cap
    trk_i_ref[0:1, :] = bi
    trk_i_ref[1:2, :] = bj
    trk_i_ref[2:3, :] = lc

    @pl.when(is_last)
    def _finalize():
        if bestvec:
            best = jnp.max(best_ref[:], axis=0, keepdims=True)
        else:
            best = trk_f_ref[0:1, :]
        cap = trk_f_ref[1:2, :]
        bi = trk_i_ref[0:1, :]
        bj = trk_i_ref[1:2, :]
        lc_i = trk_i_ref[2:3, :]
        qlast = jnp.full((1, L), 1, jnp.int32) * (Q - 1)
        tlast = lengths - 1

        if algorithm == "sw":
            score = best
            qe = jnp.where(best > 0, bi, -1)
            te = jnp.where(best > 0, bj, -1)
        elif algorithm == "nw":
            score = cap
            qe = qlast
            te = tlast
        elif algorithm == "hw":
            score = best
            qe = qlast
            te = bj
        else:  # ov
            use_col = cap > best
            score = jnp.maximum(best, cap)
            qe = jnp.where(use_col, lc_i, qlast)
            te = jnp.where(use_col, tlast, bj)

        scores_ref[0, 0, 0:1, :] = score.astype(jnp.int32)
        qend_ref[0, 0, 0:1, :] = qe
        tend_ref[0, 0, 0:1, :] = te


def _ragged_kernel_v2(
    # scalar prefetch
    bos_ref,
    cos_ref,
    los_ref,
    qlen_ref,
    # inputs
    prof_ref,  # (1, Q_pad, 32) bf16 (current query)
    targets_ref,  # (chunk, LANES) int32
    lengths_ref,  # (1, 1, LANES) int32
    # outputs
    scores_ref,
    qend_ref,
    tend_ref,
    # scratch (composition depends on algorithm/mode; unpacked below)
    *scratch,
    algorithm: str,
    go: int,
    ge: int,
    with_ends: bool,
    chunk: int,
    unroll: int,
    strip: int,
):
    """Unified strip-blocked kernel: all four algorithms, both modes.

    Two ideas over `_ragged_kernel` (see DEVNOTES.md for measurements):

    1. **Strip-blocked exact F-scan** (from `v1`'s score-only strip
       kernel): query rows go in strips of ``strip`` rows, cutting the
       per-column max-scan from ``log2(Q_pad)`` to ``log2(strip)``
       shift+max rounds; the cross-strip chain is carried through
       per-column VMEM buffers (``bC``/``bH``) and a parity-double-
       buffered cross-chunk carry (``Hcarry``).

    2. **Elementwise tracking** — no per-column reductions at all.
       Score/end tracking keeps per-*(row, lane)* running state updated
       with 1-3 elementwise ops per column, and performs a single
       log-depth reduction at block finalize:

       - ``best``/``bestj`` (sw/hw/ov): per-row max of ``H`` over
         columns and the column of its first attainment (strictly-
         greater updates reproduce the oracle's sweep order: max score,
         then min target column, then min query row);
       - ``cap`` (nw/ov): the last *valid* column of ``H``, captured by
         an elementwise select at ``j == length-1``.

       This replaces the old kernel's per-column masked argmax/max
       reductions (a second log-depth scan that made ``end`` mode ~4x
       slower than ``score`` mode) and makes every mode strip-safe.

    Requires ``safe_pad`` flat packing (pad symbol 31 scoring
    ``PAD_SCORE`` in every profile row): padded columns then compute the
    exact DP of the *padded* target, whose tracked results provably
    equal the unpadded ones — any path through pad columns is dominated
    by its straight-line valid counterpart (gap costs are nonnegative
    and pad diagonals score ``PAD_SCORE``), so pad cells never win a
    strictly-greater update, and ``cap`` only reads valid columns.
    """
    spec = ALGORITHMS[algorithm]
    it = iter(scratch)
    H_ref = next(it)
    E_ref = next(it)
    best_ref = next(it) if algorithm != "nw" else None
    bestj_ref = next(it) if (with_ends and algorithm != "nw") else None
    cap_ref = next(it) if algorithm in ("nw", "ov") else None
    Q_pad, L = H_ref.shape
    S = strip
    n_strips = Q_pad // S
    # single-strip tiers skip the boundary machinery entirely (static)
    single = n_strips == 1
    if not single:
        bH_ref = next(it)  # (chunk, LANES) f32: strip's last-row H/col
        bC_ref = next(it)  # (chunk, LANES) f32: incl. chain max, last row
        Hcarry_ref = next(it)  # (2*n_strips, LANES) f32: x-chunk carry
    qi = pl.program_id(0)
    i = pl.program_id(1)
    c = cos_ref[i]
    is_last = los_ref[i] == 1
    Q = qlen_ref[qi]
    Qf = Q.astype(jnp.float32)

    gof = np.float32(go)
    gef = np.float32(ge)
    gmin = np.float32(min(go, ge))

    lengths = lengths_ref[0, 0:1, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)

    # the empty-target score (read when a lane's length is 0): nw/hw
    # consume the whole query as one first-column gap; sw/ov report 0
    empty_score = -(gof + (Qf - 1.0) * gef)

    @pl.when(c == 0)
    def _init():
        giota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        if spec.penalize_first_col:
            H_ref[:] = -(gof + giota.astype(jnp.float32) * gef)
        else:
            H_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)
        E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
        if best_ref is not None:
            # hw's initial candidate is the all-gap alignment at the
            # column-0 boundary (oracle: H[Q][0]); sw/ov start at 0
            best0 = empty_score if spec.penalize_first_col else 0.0
            best_ref[:] = jnp.full((Q_pad, L), best0, jnp.float32)
        if bestj_ref is not None:
            bestj_ref[:] = jnp.full((Q_pad, L), -1, jnp.int32)
        if cap_ref is not None:
            cap0 = empty_score if algorithm == "nw" else NEG
            cap_ref[:] = jnp.full((Q_pad, L), cap0, jnp.float32)
        if not single:
            Hcarry_ref[:] = jnp.zeros((2 * n_strips, L), jnp.float32)

    track_best = best_ref is not None
    track_j = bestj_ref is not None
    track_cap = cap_ref is not None

    def strip_body(s, _):
        base = s * S
        base_f = jnp.asarray(base).astype(jnp.float32)
        ivec = row_iota.astype(jnp.float32) * gmin + base_f * gmin
        ivec_f = ivec + (gof - gmin)
        prof = prof_ref[0, pl.ds(base, S), :]
        is_first = s == 0

        def column(jj, carry):
            H, E, best, bestj, cap, top_prev = carry
            j = c * chunk + jj
            if not single:
                # read the strip-above boundary at THIS column before
                # overwriting it below; consumed as next column's diag
                bH_above = bH_ref[pl.ds(jj, 1), :]
            if spec.clamp_zero:
                # sw: the row-0 boundary F candidate is < 0 <= tmp
                cin0 = NEG
            else:
                # virtual row -1 of the normalized scan domain: the
                # (possibly penalized) row-0 boundary H at column j
                jf = j.astype(jnp.float32)
                if spec.penalize_first_row:
                    row0_cur = -(gof + jf * gef)
                else:
                    row0_cur = jnp.float32(0.0)
                cin0 = row0_cur - gmin
            if single:
                Cin = jnp.broadcast_to(
                    jnp.asarray(cin0, jnp.float32), (1, L)
                )
            else:
                Cin = jnp.where(is_first, cin0, bC_ref[pl.ds(jj, 1), :])
            sym = targets_ref[pl.ds(jj, 1), :]
            onehot = (alpha_iota == sym).astype(jnp.bfloat16)
            prof_col = jax.lax.dot_general(
                prof,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            E_new = jnp.maximum(H - gof, E - gef)
            shifted = _shift_down(H, 1, 0.0)
            # row 0 of this strip: diag comes from the strip above
            # (H at its last row, previous column)
            if spec.penalize_first_row:
                jf = j.astype(jnp.float32)
                row0_prev = jnp.where(
                    j == 0, 0.0, -(gof + (jf - 1.0) * gef)
                )
            else:
                row0_prev = jnp.float32(0.0)
            if single:
                if spec.penalize_first_row:
                    shifted = jnp.where(row_iota == 0, row0_prev, shifted)
                # else: the 0.0 shift fill IS the free row-0 boundary
            else:
                top = jnp.where(is_first, row0_prev, top_prev)
                shifted = jnp.where(row_iota == 0, top, shifted)
            diag = shifted + prof_col
            tmp = jnp.maximum(diag, E_new)
            if spec.clamp_zero:
                tmp = jnp.maximum(tmp, 0.0)
            # chain entering this strip: C at strip above's last row,
            # same column (vertical gap chain crossing the boundary)
            C = _cummax(tmp + ivec)
            if not (single and spec.clamp_zero):
                # sw single-strip: Cin is NEG, the max is a no-op
                C = jnp.maximum(C, Cin)
            # exclusive shift with the incoming chain at row 0
            F = jnp.concatenate([Cin, C[: S - 1]], axis=0) - ivec_f
            H_new = jnp.maximum(tmp, F)

            if track_best:
                if track_j:
                    upd = H_new > best
                    best = jnp.where(upd, H_new, best)
                    bestj = jnp.where(upd, j, bestj)
                else:
                    best = jnp.maximum(best, H_new)
            if track_cap:
                cap = jnp.where(j == (lengths - 1), H_new, cap)

            if single:
                return H_new, E_new, best, bestj, cap, top_prev
            bH_ref[pl.ds(jj, 1), :] = H_new[S - 1 : S, :]
            bC_ref[pl.ds(jj, 1), :] = C[S - 1 : S, :]
            return H_new, E_new, best, bestj, cap, bH_above

        def body(b, carry):
            for u in range(unroll):
                carry = column(b * unroll + u, carry)
            return carry

        neg_row = jnp.full((1, L), NEG, jnp.float32)
        if single:
            top0 = neg_row  # unused: every column fills row 0 inline
        else:
            # column 0's diag top: strip-above's last-row H at the
            # previous chunk's final column (previous-parity buffer);
            # at the block's first chunk, the column -1 boundary
            s_above = jnp.maximum(s - 1, 0)  # s=0 masked by is_first
            top0 = Hcarry_ref[
                pl.ds(((c + 1) % 2) * n_strips + s_above, 1), :
            ]
            if spec.penalize_first_col:
                boundary0 = -(gof + (base_f - 1.0) * gef)
            else:
                boundary0 = jnp.float32(0.0)
            top0 = jnp.where(c == 0, boundary0, top0)
        carry0 = (
            H_ref[pl.ds(base, S), :],
            E_ref[pl.ds(base, S), :],
            best_ref[pl.ds(base, S), :] if track_best else neg_row,
            bestj_ref[pl.ds(base, S), :]
            if track_j
            else jnp.full((1, L), -1, jnp.int32),
            cap_ref[pl.ds(base, S), :] if track_cap else neg_row,
            top0,
        )
        H, E, best, bestj, cap, _ = jax.lax.fori_loop(
            0, chunk // unroll, body, carry0
        )
        H_ref[pl.ds(base, S), :] = H
        E_ref[pl.ds(base, S), :] = E
        if track_best:
            best_ref[pl.ds(base, S), :] = best
        if track_j:
            bestj_ref[pl.ds(base, S), :] = bestj
        if track_cap:
            cap_ref[pl.ds(base, S), :] = cap
        if not single:
            Hcarry_ref[pl.ds((c % 2) * n_strips + s, 1), :] = (
                H[S - 1 : S, :]
            )
        return 0

    if single:
        strip_body(0, 0)
    else:
        jax.lax.fori_loop(0, n_strips, strip_body, 0)

    @pl.when(is_last)
    def _finalize():
        BIG = jnp.int32(2**30)
        giota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        last_row = giota == (Q - 1)
        qlast = jnp.full((1, L), 1, jnp.int32) * (Q - 1)
        tlast = lengths - 1
        neg1 = jnp.full((1, L), -1, jnp.int32)

        def row_select_f(x):
            """x[Q-1] as a (1, L) row (one masked reduction)."""
            return jnp.max(
                jnp.where(last_row, x, NEG), axis=0, keepdims=True
            )

        def row_select_i(x):
            return jnp.max(
                jnp.where(last_row, x, -BIG), axis=0, keepdims=True
            )

        if algorithm == "sw":
            bestv = best_ref[:]
            score = jnp.max(bestv, axis=0, keepdims=True)
            if with_ends:
                bj = bestj_ref[:]
                cand_j = jnp.where(bestv == score, bj, BIG)
                j_star = jnp.min(cand_j, axis=0, keepdims=True)
                cand_i = jnp.where(cand_j == j_star, giota, BIG)
                i_star = jnp.min(cand_i, axis=0, keepdims=True)
                qe = jnp.where(score > 0, i_star, -1)
                te = jnp.where(score > 0, j_star, -1)
            else:
                qe, te = neg1, neg1
        elif algorithm == "nw":
            score = row_select_f(cap_ref[:])
            qe, te = (qlast, tlast) if with_ends else (neg1, neg1)
        elif algorithm == "hw":
            # a length-0 lane has only pad columns: boundary-originated
            # gap paths through them have no valid-column counterpart,
            # so `best` is garbage there — restore the empty-target
            # score (the domination argument needs length >= 1)
            len0 = lengths == 0
            score = jnp.where(len0, empty_score, row_select_f(best_ref[:]))
            if with_ends:
                qe = qlast
                te = jnp.where(len0, -1, row_select_i(bestj_ref[:]))
            else:
                qe, te = neg1, neg1
        else:  # ov
            len0 = lengths == 0
            rowbest = jnp.where(len0, 0.0, row_select_f(best_ref[:]))
            capv = cap_ref[:]
            valid_rows = giota < Q
            capm = jnp.where(valid_rows, capv, NEG)
            capmax = jnp.max(capm, axis=0, keepdims=True)
            score = jnp.maximum(rowbest, capmax)
            if with_ends:
                bj = jnp.where(len0, -1, row_select_i(bestj_ref[:]))
                cand = jnp.where(capm == capmax, giota, BIG)
                lc = jnp.min(cand, axis=0, keepdims=True)
                use_col = capmax > rowbest  # ties -> last-row end (oracle)
                qe = jnp.where(use_col, lc, qlast)
                te = jnp.where(use_col, tlast, bj)
            else:
                qe, te = neg1, neg1

        scores_ref[0, 0, 0:1, :] = score.astype(jnp.int32)
        qend_ref[0, 0, 0:1, :] = qe
        tend_ref[0, 0, 0:1, :] = te


def _ragged_kernel_strip(
    # scalar prefetch
    bos_ref,
    cos_ref,
    los_ref,
    qlen_ref,
    # inputs
    prof_ref,  # (1, Q_pad, 32) bf16 (current query)
    targets_ref,  # (chunk, LANES) int32
    lengths_ref,  # (1, 1, LANES) int32
    # outputs
    scores_ref,
    qend_ref,
    tend_ref,
    # scratch
    H_ref,  # (Q_pad, LANES) f32
    E_ref,  # (Q_pad, LANES) f32
    best_ref,  # (Q_pad, LANES) f32 elementwise max (bestvec) or (8, .)
    bH_ref,  # (chunk, LANES) f32: strip's last-row H per column
    bC_ref,  # (chunk, LANES) f32: inclusive chain max at last row
    Hcarry_ref,  # (2 * n_strips, LANES) f32: cross-chunk carry
    trk_ref,  # (2, LANES) f32: 0=best (last-row/colmax), 1=cap
    *,
    algorithm: str,
    go: int,
    ge: int,
    chunk: int,
    unroll: int,
    strip: int,
    bestvec: bool,
):
    """Strip-blocked score-only variant of `_ragged_kernel`.

    The query rows are processed in strips of ``strip`` rows (outer
    fori_loop), columns inner.  The exact F resolution then only scans
    ``strip`` rows — max-scan is associative, so the chain entering
    strip ``s+1`` at column ``j`` is exactly the inclusive scan value at
    strip ``s``'s last row (``bC_ref[j]``), and the diag term for row 0
    is the strip-above's last-row H at column ``j-1`` (``bH_ref[j]``
    read before being overwritten, carried one column in registers).
    Cross-chunk, the strip-above's H at the previous chunk's *final*
    column is double-buffered by chunk parity in ``Hcarry_ref``: within
    a chunk strip ``s-1`` writes its slot before strip ``s`` runs, so a
    single buffer would hand strip ``s`` a value one chunk too new.
    The penalized row-0 boundary chain (nw) enters strip 0's F through
    ``Cin = row0_boundary - gmin`` — a virtual row -1 in the scan's
    normalized domain — and propagates to lower strips through ``bC``.

    Score-only tracking commutes with strip order (everything merges by
    max; the nw terminal cell is written by exactly one strip/column and
    merges by select), so all four algorithms are supported — but not
    end tracking, whose first-argmax tie-breaking is column-ordered.
    With ``bestvec`` (sw + PAD_SYMBOL-safe packing) tracking is a
    running elementwise max with no per-column reduction or masking.
    Validated against the full-scan kernel and the scalar oracle
    (experiments/bench_strip.py, tests/test_engines.py).
    """
    spec = ALGORITHMS[algorithm]
    Q_pad, L = H_ref.shape
    S = strip
    n_strips = Q_pad // S
    qi = pl.program_id(0)
    i = pl.program_id(1)
    c = cos_ref[i]
    is_last = los_ref[i] == 1
    Q = qlen_ref[qi]
    Qf = Q.astype(jnp.float32)

    gof = np.float32(go)
    gef = np.float32(ge)
    gmin = np.float32(min(go, ge))
    NEGH = np.float32(-5.0e29)  # "was this sentinel overwritten" bar

    lengths = lengths_ref[0, 0:1, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)

    @pl.when(c == 0)
    def _init():
        giota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        if spec.penalize_first_col:
            H_ref[:] = -(gof + giota.astype(jnp.float32) * gef)
        else:
            H_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)
        E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
        if bestvec:
            best_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)
        # tracker init values mirror `_ragged_kernel` (empty-target
        # semantics: nw/hw score of a zero-length lane)
        if spec.track_terminal:
            cap0 = -(gof + (Qf - 1.0) * gef)
        else:
            cap0 = NEG
        if spec.track_last_row and spec.penalize_first_col:
            best0 = -(gof + (Qf - 1.0) * gef)
        else:
            best0 = jnp.float32(0.0)
        trk_ref[0:1, :] = jnp.full((1, L), best0, jnp.float32)
        trk_ref[1:2, :] = jnp.full((1, L), cap0, jnp.float32)
        Hcarry_ref[:] = jnp.zeros((2 * n_strips, L), jnp.float32)

    track_best = spec.track_last_row or (
        spec.track_all_cells and not bestvec
    )

    def strip_body(s, _):
        base = s * S
        base_f = base.astype(jnp.float32)
        ivec = row_iota.astype(jnp.float32) * gmin + base_f * gmin
        ivec_f = ivec + (gof - gmin)
        prof = prof_ref[0, pl.ds(base, S), :]
        is_first = s == 0
        # last-row select for this strip (dynamic true query length)
        last_row_sel = (row_iota + base) == (Q - 1)

        def column(jj, carry):
            H, E, best, bpart, cpart, top_prev = carry
            j = c * chunk + jj
            # read the strip-above boundary at THIS column before
            # overwriting it below; consumed as next column's diag
            bH_above = bH_ref[pl.ds(jj, 1), :]
            if spec.clamp_zero:
                # sw: the row-0 boundary F candidate is < 0 <= tmp
                cin0 = NEG
            else:
                # virtual row -1 of the normalized scan domain: the
                # (possibly penalized) row-0 boundary H at column j
                jf = j.astype(jnp.float32)
                if spec.penalize_first_row:
                    row0_cur = -(gof + jf * gef)
                else:
                    row0_cur = jnp.float32(0.0)
                cin0 = row0_cur - gmin
            Cin = jnp.where(is_first, cin0, bC_ref[pl.ds(jj, 1), :])
            sym = targets_ref[pl.ds(jj, 1), :]
            onehot = (alpha_iota == sym).astype(jnp.bfloat16)
            prof_col = jax.lax.dot_general(
                prof,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            E_new = jnp.maximum(H - gof, E - gef)
            shifted = _shift_down(H, 1, 0.0)
            # row 0 of this strip: diag comes from the strip above
            # (H at its last row, previous column)
            if spec.penalize_first_row:
                jf = j.astype(jnp.float32)
                row0_prev = jnp.where(
                    j == 0, 0.0, -(gof + (jf - 1.0) * gef)
                )
            else:
                row0_prev = jnp.float32(0.0)
            top = jnp.where(is_first, row0_prev, top_prev)
            shifted = jnp.where(row_iota == 0, top, shifted)
            diag = shifted + prof_col
            tmp = jnp.maximum(diag, E_new)
            if spec.clamp_zero:
                tmp = jnp.maximum(tmp, 0.0)
            # chain entering this strip: C at strip above's last row,
            # same column (vertical gap chain crossing the boundary)
            C = jnp.maximum(_cummax(tmp + ivec), Cin)
            # exclusive shift with the incoming chain at row 0
            F = jnp.concatenate([Cin, C[: S - 1]], axis=0) - ivec_f
            H_new = jnp.maximum(tmp, F)

            if bestvec:
                best = jnp.maximum(best, H_new)
            else:
                valid = j < lengths
                at_end = j == (lengths - 1)
                if spec.track_all_cells:  # sw without safe packing
                    colmax = jnp.max(H_new, axis=0, keepdims=True)
                    bpart = jnp.maximum(
                        bpart, jnp.where(valid, colmax, NEG)
                    )
                if spec.track_last_row:  # hw / ov
                    rowval = jnp.max(
                        jnp.where(last_row_sel, H_new, NEG),
                        axis=0,
                        keepdims=True,
                    )
                    bpart = jnp.maximum(
                        bpart, jnp.where(valid, rowval, NEG)
                    )
                if spec.track_terminal:  # nw: exactly one hit per lane
                    rowval = jnp.max(
                        jnp.where(last_row_sel, H_new, NEG),
                        axis=0,
                        keepdims=True,
                    )
                    cpart = jnp.where(at_end, rowval, cpart)
                if spec.track_last_col:  # ov: strips share the column
                    colmax = jnp.max(H_new, axis=0, keepdims=True)
                    cpart = jnp.maximum(
                        cpart, jnp.where(at_end, colmax, NEG)
                    )
            bH_ref[pl.ds(jj, 1), :] = H_new[S - 1 : S, :]
            bC_ref[pl.ds(jj, 1), :] = C[S - 1 : S, :]
            return H_new, E_new, best, bpart, cpart, bH_above

        def body(b, carry):
            for u in range(unroll):
                carry = column(b * unroll + u, carry)
            return carry

        # column 0's diag top: strip-above's last-row H at the previous
        # chunk's final column (previous-parity buffer); at the block's
        # first chunk it is the column -1 boundary instead
        s_above = jnp.maximum(s - 1, 0)  # s=0 is masked by is_first
        top0 = Hcarry_ref[pl.ds(((c + 1) % 2) * n_strips + s_above, 1), :]
        if spec.penalize_first_col:
            boundary0 = -(gof + (base_f - 1.0) * gef)
        else:
            boundary0 = jnp.float32(0.0)
        top0 = jnp.where(c == 0, boundary0, top0)
        neg_row = jnp.full((1, L), NEG, jnp.float32)
        carry0 = (
            H_ref[pl.ds(base, S), :],
            E_ref[pl.ds(base, S), :],
            best_ref[pl.ds(base, S), :] if bestvec else neg_row,
            neg_row,
            neg_row,
            top0,
        )
        H, E, best, bpart, cpart, _ = jax.lax.fori_loop(
            0, chunk // unroll, body, carry0
        )
        H_ref[pl.ds(base, S), :] = H
        E_ref[pl.ds(base, S), :] = E
        if bestvec:
            best_ref[pl.ds(base, S), :] = best
        else:
            if track_best:
                trk_ref[0:1, :] = jnp.maximum(trk_ref[0:1, :], bpart)
            if spec.track_terminal:
                trk_ref[1:2, :] = jnp.where(
                    cpart > NEGH, cpart, trk_ref[1:2, :]
                )
            if spec.track_last_col:
                trk_ref[1:2, :] = jnp.maximum(trk_ref[1:2, :], cpart)
        Hcarry_ref[pl.ds((c % 2) * n_strips + s, 1), :] = H[S - 1 : S, :]
        return 0

    jax.lax.fori_loop(0, n_strips, strip_body, 0)

    @pl.when(is_last)
    def _finalize():
        if bestvec:
            score = jnp.max(best_ref[:], axis=0, keepdims=True)
        elif algorithm == "nw":
            score = trk_ref[1:2, :]
        elif algorithm == "ov":
            score = jnp.maximum(trk_ref[0:1, :], trk_ref[1:2, :])
        else:  # sw (tracked) / hw
            score = trk_ref[0:1, :]
        scores_ref[0, 0, 0:1, :] = score.astype(jnp.int32)
        qend_ref[0, 0, 0:1, :] = jnp.full((1, L), -1, jnp.int32)
        tend_ref[0, 0, 0:1, :] = jnp.full((1, L), -1, jnp.int32)


def _scratch_shapes(
    Q_pad, chunk, algorithm, with_ends, bestvec, use_v2, strip_mode, strip
):
    """VMEM scratch list matching the selected kernel's signature."""
    f32 = jnp.float32
    if use_v2:
        shapes = [
            pltpu.VMEM((Q_pad, LANES), f32),  # H
            pltpu.VMEM((Q_pad, LANES), f32),  # E
        ]
        if algorithm != "nw":
            shapes.append(pltpu.VMEM((Q_pad, LANES), f32))  # best
        if with_ends and algorithm != "nw":
            shapes.append(pltpu.VMEM((Q_pad, LANES), jnp.int32))  # bestj
        if algorithm in ("nw", "ov"):
            shapes.append(pltpu.VMEM((Q_pad, LANES), f32))  # cap
        if strip < Q_pad:  # multi-strip boundary machinery
            shapes += [
                pltpu.VMEM((chunk, LANES), f32),  # bH
                pltpu.VMEM((chunk, LANES), f32),  # bC
                pltpu.VMEM((2 * (Q_pad // strip), LANES), f32),  # Hcarry
            ]
        return shapes
    if strip_mode:
        return [
            pltpu.VMEM((Q_pad, LANES), f32),
            pltpu.VMEM((Q_pad, LANES), f32),
            pltpu.VMEM((Q_pad if bestvec else 8, LANES), f32),
            pltpu.VMEM((chunk, LANES), f32),
            pltpu.VMEM((chunk, LANES), f32),
            pltpu.VMEM((2 * (Q_pad // strip), LANES), f32),
            pltpu.VMEM((2, LANES), f32),
        ]
    return [
        pltpu.VMEM((Q_pad, LANES), f32),
        pltpu.VMEM((Q_pad, LANES), f32),
        pltpu.VMEM((8, LANES), f32),
        pltpu.VMEM((8, LANES), jnp.int32),
        pltpu.VMEM((Q_pad if bestvec else 8, LANES), f32),
    ]


@partial(
    jax.jit,
    static_argnames=(
        "go",
        "ge",
        "algorithm",
        "with_ends",
        "interpret",
        "chunk",
        "unroll",
        "safe_pad",
        "strip",
    ),
)
def search_flat(
    profs,  # (n_q, Q_pad, 32) bf16
    qlens,  # (n_q,) int32 true query lengths
    flat_targets,  # (total_rows, LANES) uint8 or int32 symbols
    lengths,  # (n_blocks, 1, LANES) int32
    bos,  # (n_steps,) int32
    cos,  # (n_steps,) int32
    los,  # (n_steps,) int32
    go,
    ge,
    algorithm,
    with_ends,
    interpret=False,
    chunk=CHUNK,
    unroll=UNROLL,
    safe_pad=False,
    strip=None,
):
    """One kernel launch: all queries x the whole flat-packed database.

    ``strip`` overrides the v2 kernel's strip height (default `STRIP`,
    clamped to the query tier; must divide the tier).
    Returns ``(scores, q_ends, t_ends)`` of shape
    ``(n_q, n_blocks, LANES)`` int32.
    """
    n_q, Q_pad, _ = profs.shape
    n_steps = bos.shape[0]
    n_blocks = lengths.shape[0]

    # the packed payload is stored uint8 (1 byte/residue at rest); the
    # kernel wants int32 lanes and Mosaic cannot lower narrow VMEM
    # loads, so widen with one XLA cast at the launch boundary
    if flat_targets.dtype != jnp.int32:
        flat_targets = flat_targets.astype(jnp.int32)

    while chunk % unroll:
        unroll //= 2
    # v2 (safe_pad flat packing, i.e. every bundled matrix): the unified
    # strip-blocked kernel with elementwise tracking — all algorithms,
    # both modes, one code path.  Without safe_pad (a 32-letter custom
    # matrix), fall back to the v1 kernels with per-column reductions
    # and validity masks.
    use_v2 = bool(safe_pad)
    # bestvec (v1 path only): SW score-only running-max tracking
    bestvec = algorithm == "sw" and not with_ends and safe_pad
    strip_mode = (
        not use_v2 and not with_ends and Q_pad >= STRIP_MIN_QPAD
    )
    if Q_pad > RAGGED_MAX_QPAD and not (use_v2 or strip_mode):
        raise ValueError(
            f"query tier {Q_pad} needs a strip-blocked path; use the "
            "segmented long-query kernel for end/full modes with "
            "32-letter matrices (see engine.search_scores_batch)"
        )
    strip = min(strip or STRIP, Q_pad)
    if Q_pad % strip:
        raise ValueError(
            f"strip {strip} must divide the query tier {Q_pad}"
        )
    if use_v2:
        unroll = min(unroll, 8)
    elif strip_mode:
        unroll = min(unroll, 8)
    elif Q_pad > 1024:
        # scoped-VMEM pressure scales with unroll x live (Q_pad, LANES)
        # temporaries; shrink the unroll at the largest tier
        unroll = min(unroll, 2)

    if use_v2:
        kernel = partial(
            _ragged_kernel_v2,
            algorithm=algorithm,
            go=int(go),
            ge=int(ge),
            with_ends=with_ends,
            chunk=chunk,
            unroll=unroll,
            strip=strip,
        )
    elif strip_mode:
        kernel = partial(
            _ragged_kernel_strip,
            algorithm=algorithm,
            go=int(go),
            ge=int(ge),
            chunk=chunk,
            unroll=unroll,
            strip=strip,
            bestvec=bestvec,
        )
    else:
        kernel = partial(
            _ragged_kernel,
            algorithm=algorithm,
            go=int(go),
            ge=int(ge),
            with_ends=with_ends,
            chunk=chunk,
            unroll=unroll,
            bestvec=bestvec,
        )
    out_shape = [
        jax.ShapeDtypeStruct((n_q, n_blocks, 1, LANES), jnp.int32)
        for _ in range(3)
    ]
    out_spec = pl.BlockSpec(
        (1, 1, 1, LANES), lambda q, i, bos, cos, los, qlen: (q, bos[i], 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_q, n_steps),
        in_specs=[
            pl.BlockSpec(
                (1, Q_pad, ALPHA),
                lambda q, i, bos, cos, los, qlen: (q, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, LANES),
                lambda q, i, bos, cos, los, qlen: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, LANES),
                lambda q, i, bos, cos, los, qlen: (bos[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        scratch_shapes=_scratch_shapes(
            Q_pad,
            chunk,
            algorithm,
            with_ends,
            bestvec,
            use_v2,
            strip_mode,
            strip,
        ),
    )
    flops_per_cell = 24
    cost = pl.CostEstimate(
        flops=(flops_per_cell + 2 * ALPHA)
        * n_q
        * n_steps
        * chunk
        * LANES
        * Q_pad,
        bytes_accessed=n_q * flat_targets.size * 4,
        transcendentals=0,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(bos, cos, los, qlens, profs, flat_targets, lengths)
    return tuple(o.reshape(n_q, n_blocks, LANES) for o in outs)
