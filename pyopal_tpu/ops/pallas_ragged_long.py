"""Long-query extension of the ragged kernel: query segmentation.

Queries longer than the VMEM tier (`pallas_ragged.RAGGED_MAX_QPAD`) are
processed in sequential *segments* of ``QSEG`` query rows.  Each
segment is one launch of a kernel nearly identical to the ragged
kernel, plus:

- **per-column boundary arrays** ``Hb``/``Fb`` in HBM, shaped like the
  flat target array: segment ``s`` reads the bottom-row ``H``/``F`` of
  segment ``s-1`` at every target column (the vertical DP crossing
  state) and writes its own for segment ``s+1``;
- **carried trackers**: best-score state is passed between launches as
  in/out arrays, with the tie rule extended so cross-segment merging
  preserves the sweep-order semantics (smaller target end wins ties;
  for equal ends the earlier segment — smaller query row — wins);
- the **segment offset is a scalar-prefetch input**, so every segment
  reuses one compiled shape.

The DP math is the same exact formulation; only the top-row terms
change: the closed-form row-0 boundary becomes the per-column vectors
from the previous segment.  Validated against the scalar oracle in
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
QSEG = 2048  # query rows per segment


def _seg_kernel(
    # scalar prefetch
    bos_ref,
    cos_ref,
    los_ref,
    meta_ref,  # (3,): [Q, seg_offset, is_first_segment]
    # inputs
    prof_ref,  # (QSEG, 32) bf16 — this segment's profile slice
    targets_ref,  # (chunk, LANES) int32
    lengths_ref,  # (1, 1, LANES) int32
    hb_in_ref,  # (chunk, LANES) f32 — prev segment bottom-row H
    fb_in_ref,  # (chunk, LANES) f32 — prev segment bottom-row F
    tf_in_ref,  # (1, 2, LANES) f32 — carried f32 trackers
    ti_in_ref,  # (1, 4, LANES) i32 — carried i32 trackers
    # outputs
    scores_ref,  # (1, 1, LANES) i32
    qend_ref,
    tend_ref,
    hb_out_ref,  # (chunk, LANES) f32
    fb_out_ref,  # (chunk, LANES) f32
    tf_out_ref,  # (1, 2, LANES) f32
    ti_out_ref,  # (1, 4, LANES) i32
    # scratch
    H_ref,  # (QSEG, LANES) f32
    E_ref,
    trk_f_ref,  # (8, LANES) f32
    trk_i_ref,  # (8, LANES) i32
    carry_ref,  # (8, LANES) f32: rows 0-1 = prev-column Hb/unused
    *,
    algorithm: str,
    go: int,
    ge: int,
    with_ends: bool,
    chunk: int,
):
    spec = ALGORITHMS[algorithm]
    Q_pad, L = H_ref.shape
    i = pl.program_id(1)
    c = cos_ref[i]
    is_last = los_ref[i] == 1
    Q = meta_ref[0]
    seg_off = meta_ref[1]
    first_seg = meta_ref[2] == 1
    seg_off_f = seg_off.astype(jnp.float32)

    gof = np.float32(go)
    gef = np.float32(ge)
    gmin = np.float32(min(go, ge))

    lengths = lengths_ref[0, 0:1, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
    ivec = row_iota.astype(jnp.float32) * gmin
    grow_f = row_iota.astype(jnp.float32) + seg_off_f  # global row index

    @pl.when(c == 0)
    def _init():
        if spec.penalize_first_col:
            col0 = -(gof + grow_f * gef)
        else:
            col0 = jnp.zeros((Q_pad, L), jnp.float32)
        H_ref[:] = col0
        E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
        # carry row 0: H value of the previous segment's bottom row at
        # the virtual column -1 (its first-column boundary value)
        if spec.penalize_first_col:
            hb_init = -(gof + (seg_off_f - 1.0) * gef)
        else:
            hb_init = jnp.float32(0.0)
        carry_ref[0:1, :] = jnp.full((1, L), hb_init, jnp.float32)

        # trackers: first segment initializes, later segments resume
        Qf = Q.astype(jnp.float32)
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
        trk_f_ref[0:1, :] = jnp.where(
            first_seg, jnp.full((1, L), best0, jnp.float32), tf_in_ref[0, 0:1, :]
        )
        trk_f_ref[1:2, :] = jnp.where(
            first_seg, jnp.full((1, L), cap0, jnp.float32), tf_in_ref[0, 1:2, :]
        )
        neg1 = jnp.full((1, L), -1, jnp.int32)
        trk_i_ref[0:1, :] = jnp.where(first_seg, neg1, ti_in_ref[0, 0:1, :])
        trk_i_ref[1:2, :] = jnp.where(first_seg, neg1, ti_in_ref[0, 1:2, :])
        trk_i_ref[2:3, :] = jnp.where(first_seg, neg1, ti_in_ref[0, 2:3, :])
        # row 3 is carry padding (the buffer is 8 sublanes tall): pin
        # it so the persisted carry never holds uninitialized VMEM
        trk_i_ref[3:4, :] = neg1

    alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)
    prof = prof_ref[:]
    local_last = Q - 1 - seg_off  # row of the query's final residue
    last_row_sel = row_iota == local_last

    def column(jj):
        j = c * chunk + jj
        sym = targets_ref[pl.ds(jj, 1), :]
        onehot = (alpha_iota == sym).astype(jnp.bfloat16)
        prof_col = jax.lax.dot_general(
            prof,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        H = H_ref[:]
        E = E_ref[:]
        E_new = jnp.maximum(H - gof, E - gef)

        # top-row boundary terms
        jf = j.astype(jnp.float32)
        if spec.penalize_first_row:
            row0_cur_c = -(gof + jf * gef)
            row0_prev_c = jnp.where(j == 0, 0.0, -(gof + (jf - 1.0) * gef))
        else:
            row0_cur_c = jnp.float32(0.0)
            row0_prev_c = jnp.float32(0.0)
        # previous segment bottom-row values at this column / previous
        # column (first segment falls back to the closed-form row 0)
        hb_j = hb_in_ref[pl.ds(jj, 1), :]  # (1, L)
        fb_j = fb_in_ref[pl.ds(jj, 1), :]
        hb_prev = jnp.where(
            jj == 0, carry_ref[0:1, :], hb_in_ref[pl.ds(jj - 1, 1), :]
        )
        diag_top = jnp.where(first_seg, row0_prev_c, hb_prev)  # (1, L)
        # F entering this segment's first row
        f_top = jnp.maximum(hb_j - gof, fb_j - gef)  # only used seg>0

        shifted = _shift_down(H, 1, 0.0)
        shifted = jnp.where(row_iota == 0, diag_top, shifted)
        diag = shifted + prof_col

        tmp = jnp.maximum(diag, E_new)
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0.0)

        G = _cummax(tmp + ivec) - ivec
        Gs = _shift_down(G, 1, NEG)
        # the k=0 term: closed-form row0 for segment 0, carried F above
        # for later segments.  F_top is an F *at* row 0, so it competes
        # as (f_top + go) - ivec - go; the closed form stays as before.
        top_term = jnp.where(first_seg, row0_cur_c - ivec, f_top + gof - ivec)
        F = jnp.maximum(Gs, top_term) - gof
        # segment > 0: row 0's F is exactly f_top (not derived from Gs)
        F = jnp.where(
            jnp.logical_and(row_iota == 0, jnp.logical_not(first_seg)),
            f_top,
            F,
        )
        H_new = jnp.maximum(tmp, F)

        H_ref[:] = H_new
        E_ref[:] = E_new

        # emit this segment's bottom row for the next segment
        hb_out_ref[pl.ds(jj, 1), :] = H_new[Q_pad - 1 : Q_pad, :]
        fb_out_ref[pl.ds(jj, 1), :] = F[Q_pad - 1 : Q_pad, :]

        @pl.when(jj == chunk - 1)
        def _():
            carry_ref[0:1, :] = hb_j

        valid = j < lengths
        at_end = j == (lengths - 1)

        if spec.track_all_cells:  # sw
            best = trk_f_ref[0:1, :]
            bj = trk_i_ref[1:2, :]
            if with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                upd = valid & (
                    (colmax > best) | ((colmax == best) & (j < bj))
                )
                trk_f_ref[0:1, :] = jnp.where(upd, colmax, best)
                bi = trk_i_ref[0:1, :]
                trk_i_ref[0:1, :] = jnp.where(upd, coli + seg_off, bi)
                trk_i_ref[1:2, :] = jnp.where(upd, j, bj)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
                upd = valid & (colmax > best)
                trk_f_ref[0:1, :] = jnp.where(upd, colmax, best)
        if spec.track_last_row:  # hw / ov
            rowval = jnp.max(
                jnp.where(last_row_sel, H_new, NEG), axis=0, keepdims=True
            )
            best = trk_f_ref[0:1, :]
            upd = valid & (rowval > best)
            trk_f_ref[0:1, :] = jnp.where(upd, rowval, best)
            if with_ends:
                bj = trk_i_ref[1:2, :]
                trk_i_ref[1:2, :] = jnp.where(upd, j, bj)
        if spec.track_terminal:  # nw — only the final segment has the row
            cap = trk_f_ref[1:2, :]
            rowval = jnp.max(
                jnp.where(last_row_sel, H_new, NEG), axis=0, keepdims=True
            )
            has_row = jnp.logical_and(local_last >= 0, local_last < Q_pad)
            trk_f_ref[1:2, :] = jnp.where(
                jnp.logical_and(at_end, has_row), rowval, cap
            )
        if spec.track_last_col:  # ov
            cap = trk_f_ref[1:2, :]
            if with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                upd = at_end & (colmax > cap)
                lc_i = trk_i_ref[2:3, :]
                trk_i_ref[2:3, :] = jnp.where(upd, coli + seg_off, lc_i)
                trk_f_ref[1:2, :] = jnp.where(upd, colmax, cap)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
                trk_f_ref[1:2, :] = jnp.where(
                    at_end, jnp.maximum(colmax, cap), cap
                )

    # unrolled column loop: ILP across the serialized F-scan rounds
    # (same lever as `pallas_ragged`, measured ~10% there per 2x)
    unroll = 8
    while chunk % unroll:
        unroll //= 2

    def body(base, _):
        for u in range(unroll):
            column(base * unroll + u)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)

    @pl.when(is_last)
    def _finalize():
        # persist trackers for the next segment
        tf_out_ref[0, 0:1, :] = trk_f_ref[0:1, :]
        tf_out_ref[0, 1:2, :] = trk_f_ref[1:2, :]
        ti_out_ref[0, 0:1, :] = trk_i_ref[0:1, :]
        ti_out_ref[0, 1:2, :] = trk_i_ref[1:2, :]
        ti_out_ref[0, 2:3, :] = trk_i_ref[2:3, :]
        ti_out_ref[0, 3:4, :] = trk_i_ref[3:4, :]

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
        else:  # ov: last-row optimum wins ties
            use_col = cap > best
            score = jnp.maximum(best, cap)
            qe = jnp.where(use_col, lc_i, qlast)
            te = jnp.where(use_col, tlast, bj)

        scores_ref[0, 0:1, :] = score.astype(jnp.int32)
        qend_ref[0, 0:1, :] = qe
        tend_ref[0, 0:1, :] = te


@partial(
    jax.jit,
    static_argnames=(
        "go",
        "ge",
        "algorithm",
        "with_ends",
        "interpret",
        "chunk",
    ),
)
def _segment_call(
    prof_seg,  # (QSEG, 32) bf16
    meta,  # (3,) int32: [Q, seg_offset, is_first]
    flat_targets,
    lengths,
    bos,
    cos,
    los,
    hb_in,
    fb_in,
    tf_in,  # (n_blocks, 2, LANES) f32
    ti_in,  # (n_blocks, 4, LANES) i32
    go,
    ge,
    algorithm,
    with_ends,
    interpret=False,
    chunk=64,
):
    n_steps = bos.shape[0]
    n_blocks = lengths.shape[0]
    total_rows = flat_targets.shape[0]

    kernel = partial(
        _seg_kernel,
        algorithm=algorithm,
        go=int(go),
        ge=int(ge),
        with_ends=with_ends,
        chunk=chunk,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks, 1, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks, 1, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks, 1, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 2, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 4, LANES), jnp.int32),
    ]
    blk = lambda *shape: shape
    out_specs = [
        pl.BlockSpec((1, 1, LANES), lambda q, i, bos, cos, los, meta: (bos[i], 0, 0)),
        pl.BlockSpec((1, 1, LANES), lambda q, i, bos, cos, los, meta: (bos[i], 0, 0)),
        pl.BlockSpec((1, 1, LANES), lambda q, i, bos, cos, los, meta: (bos[i], 0, 0)),
        pl.BlockSpec((chunk, LANES), lambda q, i, bos, cos, los, meta: (i, 0)),
        pl.BlockSpec((chunk, LANES), lambda q, i, bos, cos, los, meta: (i, 0)),
        pl.BlockSpec((1, 2, LANES), lambda q, i, bos, cos, los, meta: (bos[i], 0, 0)),
        pl.BlockSpec((1, 4, LANES), lambda q, i, bos, cos, los, meta: (bos[i], 0, 0)),
    ]
    in_specs = [
        pl.BlockSpec(
            (QSEG, ALPHA),
            lambda q, i, bos, cos, los, meta: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chunk, LANES),
            lambda q, i, bos, cos, los, meta: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, LANES),
            lambda q, i, bos, cos, los, meta: (bos[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chunk, LANES),
            lambda q, i, bos, cos, los, meta: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chunk, LANES),
            lambda q, i, bos, cos, los, meta: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 2, LANES),
            lambda q, i, bos, cos, los, meta: (bos[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 4, LANES),
            lambda q, i, bos, cos, los, meta: (bos[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1, n_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((QSEG, LANES), jnp.float32),
            pltpu.VMEM((QSEG, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bos, cos, los, meta, prof_seg, flat_targets, lengths, hb_in, fb_in, tf_in, ti_in)
    return outs


def search_flat_long(
    query_enc,
    matrix,
    flat_targets,
    lengths,
    bos,
    cos,
    los,
    go,
    ge,
    algorithm,
    with_ends,
    interpret=False,
    chunk=64,
):
    """Segmented search for one long query over a flat-packed database.

    Returns ``(scores, q_ends, t_ends)`` of shape ``(n_blocks, LANES)``.
    """
    query_enc = np.asarray(query_enc, dtype=np.uint8)
    Q = query_enc.shape[0]
    S = np.asarray(matrix, dtype=np.float32)
    # widen the uint8 at-rest payload once for all segment launches
    flat_targets = jnp.asarray(flat_targets)
    if flat_targets.dtype != jnp.int32:
        flat_targets = flat_targets.astype(jnp.int32)
    n_segments = -(-Q // QSEG)
    n_blocks = lengths.shape[0]
    total_rows = flat_targets.shape[0]

    # profile, padded to n_segments * QSEG rows
    prof = np.full((n_segments * QSEG, ALPHA), PAD_SCORE, dtype=np.float32)
    prof[:Q, : S.shape[1]] = S[query_enc.astype(np.int64), :]
    prof = jnp.asarray(prof, dtype=jnp.bfloat16)

    hb = jnp.zeros((total_rows, LANES), jnp.float32)
    fb = jnp.full((total_rows, LANES), float(NEG), jnp.float32)
    tf = jnp.zeros((n_blocks, 2, LANES), jnp.float32)
    ti = jnp.zeros((n_blocks, 4, LANES), jnp.int32)

    for s in range(n_segments):
        meta = jnp.asarray(
            np.array([Q, s * QSEG, 1 if s == 0 else 0], np.int32)
        )
        outs = _segment_call(
            prof[s * QSEG : (s + 1) * QSEG],
            meta,
            flat_targets,
            lengths,
            bos,
            cos,
            los,
            hb,
            fb,
            tf,
            ti,
            int(go),
            int(ge),
            algorithm,
            with_ends,
            interpret=interpret,
            chunk=chunk,
        )
        scores, qe, te, hb, fb, tf, ti = outs
    return (
        scores.reshape(n_blocks, LANES),
        qe.reshape(n_blocks, LANES),
        te.reshape(n_blocks, LANES),
    )
