"""Full-alignment reconstruction (``mode="full"``).

Two-phase, like the reference [upstream] (cf. the SW#db method cited at
``README.md:188``): the vectorized score+end pass runs over all
targets, then each requested alignment is reconstructed.

Reconstruction itself is split device/host:

- a batched, jitted **direction-matrix pass** recomputes the DP for a
  (padded) batch of pairs on the accelerator, emitting one packed
  ``uint8`` per cell: the argmax source of ``H`` (diag / gap-in-query /
  gap-in-target / local stop) plus gap-open bits for ``E``/``F`` —
  with tie-breaking identical to the scalar oracle (diag first, then
  gap in query, then gap in target; gap-open preferred over extend);
- a cheap **host walk** follows the directions from the known end cell
  (O(Q+T) per pair).

Cross-validated against `pyopal_tpu.ops.naive.traceback` (which remains
the ground truth and the fallback for oversized pairs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ALGORITHMS
from ..results import OP_DEL, OP_INS, OP_MATCH, OP_MISMATCH
from . import naive

NEG = np.int32(-(2**30))

# direction codes (bits 0-1): source of H[i][j]
DIR_DIAG = 0
DIR_E = 1  # gap in query: from the left
DIR_F = 2  # gap in target: from above
DIR_STOP = 3  # sw: clamped zero — local alignment starts here
E_OPEN = 4  # bit 2: E came from H (gap open) rather than E (extend)
F_OPEN = 8  # bit 3: F came from H (gap open)

#: pairs with more DP cells than this go to the scalar fallback
MAX_DEVICE_CELLS = 64 * 1024 * 1024


def _dir_matrix(prof_t, target, go, ge, algorithm):
    """Packed direction matrix for one (padded) pair.

    ``prof_t``: (Q, A) int32 profile; ``target``: (T_pad,) int32.
    Returns ``(Q, T_pad) uint8``.  The column sweep uses the same exact
    prefix-max F formulation as the XLA engine; the gap-open bits are
    derived algebraically afterwards.
    """
    spec = ALGORITHMS[algorithm]
    Q = prof_t.shape[0]
    go = jnp.int32(go)
    ge = jnp.int32(ge)
    gmin = jnp.minimum(go, ge)

    rows = jnp.arange(Q + 1, dtype=jnp.int32)
    if spec.penalize_first_col:
        col0 = jnp.where(rows > 0, -(go + (rows - 1) * ge), 0)
    else:
        col0 = jnp.zeros(Q + 1, jnp.int32)
    H0 = col0
    E0 = jnp.full(Q + 1, NEG, jnp.int32)

    def step(carry, xs):
        H, E = carry
        sym, j = xs
        prof_col = prof_t[:, sym]  # (Q,)

        E_new = jnp.maximum(H - go, E - ge)
        e_open = (H - go) >= (E - ge)  # tie -> open, like the oracle

        if spec.penalize_first_row:
            row0 = -(go + (j - 1) * ge)
        else:
            row0 = jnp.int32(0)

        diag = H[:-1] + prof_col  # rows 1..Q
        tmp = jnp.maximum(diag, E_new[1:])
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0)
        tmp_full = jnp.concatenate([row0[None], tmp])

        aux = tmp_full + rows * gmin
        cmax = jax.lax.cummax(aux, axis=0)
        F_rows = cmax[:-1] - go - rows[:-1] * gmin  # F[i], i = 1..Q

        H_rows = jnp.maximum(tmp, F_rows)
        H_new = jnp.concatenate([row0[None], H_rows])

        # F gap-open bits: F[i] from H_new[i-1] (open) vs F[i-1] (extend)
        f_prev = jnp.concatenate([jnp.array([NEG]), F_rows[:-1]])
        f_open = (H_new[:-1] - go) >= (f_prev - ge)

        is_diag = H_rows == diag
        is_e = H_rows == E_new[1:]
        dirs = jnp.where(is_diag, DIR_DIAG, jnp.where(is_e, DIR_E, DIR_F))
        if spec.clamp_zero:
            dirs = jnp.where(H_rows == 0, DIR_STOP, dirs)
        dirs = (
            dirs
            + jnp.where(e_open[1:], E_OPEN, 0)
            + jnp.where(f_open, F_OPEN, 0)
        ).astype(jnp.uint8)

        return (H_new, E_new), dirs

    T_pad = target.shape[0]
    xs = (target, jnp.arange(1, T_pad + 1, dtype=jnp.int32))
    (_, _), dirs = jax.lax.scan(step, (H0, E0), xs)
    return dirs.T  # (Q, T_pad)


@partial(jax.jit, static_argnames=("algorithm",))
def _dir_matrix_batch(prof_t, targets, go, ge, algorithm):
    return jax.vmap(
        lambda t: _dir_matrix(prof_t, t, go, ge, algorithm)
    )(targets)


def _walk(dirs, spec, qs_hint, qe, te, go, ge):
    """Host walk from the end cell; returns (q_start, t_start, ops)."""
    i, j = qe + 1, te + 1
    ops = []
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            if i == 0:
                if spec.penalize_first_row:
                    ops.append(OP_INS)
                    j -= 1
                    continue
                break
            if j == 0:
                if spec.penalize_first_col:
                    ops.append(OP_DEL)
                    i -= 1
                    continue
                break
            d = int(dirs[i - 1, j - 1])
            code = d & 3
            if code == DIR_STOP:
                break
            if code == DIR_DIAG:
                ops.append(OP_MATCH)  # refined to X by the caller
                i -= 1
                j -= 1
            elif code == DIR_E:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            ops.append(OP_INS)
            opened = bool(dirs[i - 1, j - 1] & E_OPEN) if i > 0 else True
            j -= 1
            if opened:
                state = "H"
            # else stay in E: next iteration reads dirs[i-1, j-1] of the
            # new column for the chained open bit
        else:  # state == "F"
            ops.append(OP_DEL)
            opened = bool(dirs[i - 1, j - 1] & F_OPEN) if j > 0 else True
            i -= 1
            if opened:
                state = "H"
    return i, j, ops[::-1]


def full_alignment(query_enc, target_enc, matrix, go, ge, algorithm):
    """(score, q_start, t_start, q_end, t_end, ops uint8 array).

    Scalar fallback used for a single pair; batched searches use
    `full_alignments_batch`.
    """
    return naive.traceback(
        np.asarray(query_enc, dtype=np.uint8),
        np.asarray(target_enc, dtype=np.uint8),
        matrix,
        go,
        ge,
        algorithm,
    )


def full_alignments_batch(
    query_enc, targets, matrix, go, ge, algorithm, ends
):
    """Batched reconstruction for one query against many targets.

    Arguments:
        targets: list of encoded target arrays.
        ends: ``(scores, q_ends, t_ends)`` from the score pass.

    Returns a list of ``(score, qs, ts, qe, te, ops)`` tuples matching
    the scalar oracle exactly.
    """
    spec = ALGORITHMS[algorithm]
    scores, q_ends, t_ends = ends
    query_enc = np.asarray(query_enc, dtype=np.uint8)
    Q = query_enc.shape[0]
    S = np.asarray(matrix, dtype=np.int32)
    prof_t = S[query_enc.astype(np.int64), :]  # (Q, A)
    prof_dev = jnp.asarray(prof_t)

    n = len(targets)
    out = [None] * n

    # group pairs into padded sub-batches to bound device memory
    order = sorted(range(n), key=lambda i: len(targets[i]))
    batch, batch_cells = [], 0
    flushes = []
    for i in order:
        t_pad = max(len(targets[i]), 1)
        cells = Q * t_pad
        if batch and (batch_cells + cells) * 1 > MAX_DEVICE_CELLS:
            flushes.append(batch)
            batch, batch_cells = [], 0
        batch.append(i)
        batch_cells += cells
    if batch:
        flushes.append(batch)

    for batch in flushes:
        t_pad = max(max(len(targets[i]) for i in batch), 1)
        tgt = np.zeros((len(batch), t_pad), dtype=np.int32)
        tlen = np.zeros(len(batch), dtype=np.int32)
        for k, i in enumerate(batch):
            seq = targets[i]
            tgt[k, : len(seq)] = seq
            tlen[k] = len(seq)
        dirs = np.asarray(
            _dir_matrix_batch(
                prof_dev, jnp.asarray(tgt), int(go), int(ge), algorithm
            )
        )
        for k, i in enumerate(batch):
            target = targets[i]
            score = int(scores[i])
            if len(target) == 0 or Q == 0:
                # degenerate pair: delegate to the scalar oracle
                out[i] = naive.traceback(
                    query_enc, target, matrix, go, ge, algorithm
                )
                continue
            qe, te = int(q_ends[i]), int(t_ends[i])
            if algorithm == "sw" and (qe < 0 or te < 0):
                # empty local alignment (score 0)
                out[i] = (score, 0, 0, qe, te, np.zeros(0, np.uint8))
                continue
            # semi-global ends on the j=0 boundary (te=-1) are walked
            # from column 0 like the oracle does
            qs, ts, ops = _walk(dirs[k], spec, 0, qe, te, go, ge)
            # refine M -> X where residues differ
            ops = np.asarray(ops, dtype=np.uint8)
            qi, ti = qs, ts
            for p in range(ops.shape[0]):
                op = ops[p]
                if op == OP_MATCH:
                    if query_enc[qi] != target[ti]:
                        ops[p] = OP_MISMATCH
                    qi += 1
                    ti += 1
                elif op == OP_DEL:
                    qi += 1
                else:
                    ti += 1
            # the walked path must span exactly [qs, qe] x [ts, te]
            assert qi == qe + 1 and ti == te + 1, (
                f"inconsistent traceback span for target {i}: "
                f"walked to ({qi},{ti}), expected ({qe + 1},{te + 1})"
            )
            out[i] = (score, qs, ts, qe, te, ops)
    return out
