"""Vectorized XLA engine: batched column-sweep DP in pure ``jax.numpy``.

This engine implements the exact semantics of the naive oracle
(`pyopal_tpu.ops.naive`) but vectorized over a block of targets (one
target per batch lane, the SWIPE/Opal inter-sequence layout re-expressed
as array programming):

- ``lax.scan`` over target columns carries the ``(Q+1, B)`` H/E state;
- the vertical-gap (F) dependency inside a column is solved *exactly*
  with a log-depth prefix max (``lax.cummax``) using the substitution

      F[i] = max_{k < i} ( tmp[k] - gap_open - (i-1-k) * min(go, ge) )

  which is an identity of the affine recurrence for any gap parameters
  (derivation: F[i] = max(H[i-1]-go, F[i-1]-ge) with
  H[i-1] = max(tmp[i-1], F[i-1]) folds to
  F[i] = max(tmp[i-1]-go, F[i-1]-min(go, ge))).

All arithmetic is int32 (scores are exact integers).  It runs on any
backend: it is the CPU test/fallback path and the long-query fallback on
TPU; the Pallas kernel (`pyopal_tpu.ops.pallas_kernel`) implements the
same math with VMEM-resident state and a one-hot MXU profile matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ALGORITHMS

NEG = np.int32(-(2**30))  # "minus infinity" clear of int32 wraparound


@partial(jax.jit, static_argnames=("algorithm",))
def search_block(prof_t, targets, lengths, go, ge, algorithm):
    """Score + end locations for one padded block of targets.

    Arguments:
        prof_t: ``(Q, A)`` int32 query profile, ``prof_t[i, a] =
            S[q[i], a]`` (A = alphabet size).
        targets: ``(T_pad, B)`` int32 encoded targets (0-padded).
        lengths: ``(B,)`` int32 true target lengths.
        go / ge: int32 gap open / extend penalties (positive).
        algorithm: one of ``nw`` / ``hw`` / ``ov`` / ``sw`` (static).

    Returns:
        ``(scores, query_end, target_end)`` int32 arrays of shape
        ``(B,)``; ends are 0-based residue coordinates (-1 = empty).
    """
    spec = ALGORITHMS[algorithm]
    Q = prof_t.shape[0]
    T_pad, B = targets.shape
    go = jnp.int32(go)
    ge = jnp.int32(ge)
    gmin = jnp.minimum(go, ge)

    rows = jnp.arange(Q + 1, dtype=jnp.int32)[:, None]  # (Q+1, 1)

    # first column of H (j = 0)
    if spec.penalize_first_col:
        col0 = jnp.where(rows > 0, -(go + (rows - 1) * ge), 0)
    else:
        col0 = jnp.zeros((Q + 1, 1), dtype=jnp.int32)
    H0 = jnp.broadcast_to(col0, (Q + 1, B)).astype(jnp.int32)
    E0 = jnp.full((Q + 1, B), NEG, dtype=jnp.int32)

    # trackers: (best, best_i, best_j) + nw terminal + ov last-column
    zero = jnp.zeros((B,), dtype=jnp.int32)
    if spec.track_last_row:
        # hw/ov: ending at j=0 (whole target is a free overhang) is legal;
        # H[Q][0] is the initial last-row candidate with target_end = -1
        best0 = jnp.broadcast_to(col0[Q], (B,)).astype(jnp.int32)
    else:
        best0 = jnp.full((B,), NEG, dtype=jnp.int32)
    # nw: score for empty targets is the first-column terminal value
    nw0 = jnp.broadcast_to(col0[Q], (B,)).astype(jnp.int32)
    # ov last-column capture for empty targets: first column itself
    lc_best0 = jnp.where(lengths == 0, jnp.max(col0[1:]), NEG)
    lc_i0 = jnp.full((B,), 1, dtype=jnp.int32)

    A = prof_t.shape[1]

    def step(carry, xs):
        H, E, best, bi, bj, nw_score, lc_best, lc_i = carry
        sym, j = xs  # sym: (B,) int32; j: 1-based column index
        valid = (j <= lengths) & (lengths > 0)

        # profile lookup as a one-hot contraction — rides the MXU on
        # TPU instead of lowering to a (slow) gather; an INTEGER
        # contraction, because this engine is the exactness fallback
        # and an f32 dot would round matrix entries >= 2**24
        onehot = (
            sym[None, :] == jnp.arange(A, dtype=jnp.int32)[:, None]
        ).astype(jnp.int32)  # (A, B)
        prof_col = jnp.dot(
            prof_t,
            onehot,
            preferred_element_type=jnp.int32,
        )  # (Q, B)

        E_new = jnp.maximum(H - go, E - ge)  # (Q+1, B)

        if spec.penalize_first_row:
            row0 = -(go + (j - 1) * ge)
        else:
            row0 = jnp.int32(0)
        row0 = jnp.broadcast_to(row0, (1, B)).astype(jnp.int32)

        diag = H[:-1] + prof_col  # (Q, B) for rows 1..Q
        tmp = jnp.maximum(diag, E_new[1:])
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0)
        tmp_full = jnp.concatenate([row0, tmp], axis=0)  # (Q+1, B)

        # exact affine F via prefix max (see module docstring)
        aux = tmp_full + rows * gmin
        cmax = jax.lax.cummax(aux, axis=0)
        # F[i] = cmax[i-1] - go - (i-1)*gmin for DP rows i = 1..Q
        F_rows = cmax[:-1] - go - rows[:-1] * gmin

        H_rows = jnp.maximum(tmp, F_rows)
        H_new = jnp.concatenate([row0, H_rows], axis=0)

        if spec.track_all_cells:
            colmax = jnp.max(H_rows, axis=0)
            coli = jnp.argmax(H_rows, axis=0).astype(jnp.int32) + 1
            upd = valid & (colmax > best)
            best = jnp.where(upd, colmax, best)
            bi = jnp.where(upd, coli, bi)
            bj = jnp.where(upd, j, bj)
        if spec.track_last_row:
            rowval = H_new[Q]
            upd = valid & (rowval > best)
            best = jnp.where(upd, rowval, best)
            bj = jnp.where(upd, j, bj)
        if spec.track_terminal:
            nw_score = jnp.where(j == lengths, H_new[Q], nw_score)
        if spec.track_last_col:
            colmax = jnp.max(H_rows, axis=0)
            coli = jnp.argmax(H_rows, axis=0).astype(jnp.int32) + 1
            at_end = j == lengths
            lc_best = jnp.where(at_end, colmax, lc_best)
            lc_i = jnp.where(at_end, coli, lc_i)

        return (H_new, E_new, best, bi, bj, nw_score, lc_best, lc_i), None

    xs = (
        targets.astype(jnp.int32),
        jnp.arange(1, T_pad + 1, dtype=jnp.int32),
    )
    init = (H0, E0, best0, zero, zero, nw0, lc_best0, lc_i0)
    (H, E, best, bi, bj, nw_score, lc_best, lc_i), _ = jax.lax.scan(
        step, init, xs
    )

    Qi = jnp.int32(Q)
    if spec.track_terminal:  # nw
        return nw_score, jnp.full((B,), Q - 1, jnp.int32), lengths - 1
    if spec.track_all_cells:  # sw
        empty = best <= 0
        score = jnp.where(empty, 0, best)
        return (
            score,
            jnp.where(empty, -1, bi - 1),
            jnp.where(empty, -1, bj - 1),
        )
    if spec.track_last_col:  # ov: row optimum wins ties
        use_col = lc_best > best
        score = jnp.maximum(best, lc_best)
        qe = jnp.where(use_col, lc_i - 1, Qi - 1)
        te = jnp.where(use_col, lengths - 1, bj - 1)
        return score, qe, te
    # hw
    return best, jnp.full((B,), Q - 1, jnp.int32), bj - 1


def make_profile_t(query_enc: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """Build the ``(Q, A)`` transposed query profile (int32)."""
    S = np.asarray(matrix, dtype=np.int32)
    q = np.asarray(query_enc, dtype=np.int64)
    return S[q, :]
