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


def _round_up_128(n: int) -> int:
    return ((n + 127) // 128) * 128


@partial(jax.jit, static_argnames=("algorithm", "int_lookup"))
def _dir_matrix_batch(prof_t, targets, go, ge, algorithm, int_lookup=False):
    """Packed direction matrices for a padded batch of pairs.

    ``prof_t``: (Q, A) int32 profile; ``targets``: (B, T_pad) int32.
    Returns ``(B, Q, T_pad) uint8``.  Batch-oriented layout: the DP
    state is ``(Q+1, B)`` so every column step is one well-shaped 2D
    op block (the profile lookup is a one-hot contraction, not a
    per-pair gather), with the same exact prefix-max F formulation as
    the XLA engine; gap-open bits are derived algebraically.

    The f32 one-hot lookup sums exactly one nonzero product, so it is
    exact whenever the matrix entries themselves are f32-representable
    (|s| < 2**24); ``int_lookup=True`` (set by the caller for larger
    matrices) switches to an integer gather so the direction matrix
    never diverges from the int32 DP.
    """
    spec = ALGORITHMS[algorithm]
    Q, A = prof_t.shape
    B, T_pad = targets.shape
    go = jnp.int32(go)
    ge = jnp.int32(ge)
    gmin = jnp.minimum(go, ge)
    prof_f = prof_t.astype(jnp.float32)

    rows = jnp.arange(Q + 1, dtype=jnp.int32)[:, None]  # (Q+1, 1)
    if spec.penalize_first_col:
        col0 = jnp.where(rows > 0, -(go + (rows - 1) * ge), 0)
    else:
        col0 = jnp.zeros((Q + 1, 1), jnp.int32)
    H0 = jnp.broadcast_to(col0, (Q + 1, B)).astype(jnp.int32)
    E0 = jnp.full((Q + 1, B), NEG, jnp.int32)

    def step(carry, xs):
        H, E = carry
        sym, j = xs  # sym: (B,), j: scalar

        if int_lookup:
            prof_col = jnp.take(prof_t, sym, axis=1)  # (Q, B) exact
        else:
            onehot = (
                sym[None, :] == jnp.arange(A, dtype=jnp.int32)[:, None]
            ).astype(jnp.float32)
            prof_col = jnp.dot(
                prof_f, onehot, preferred_element_type=jnp.float32
            ).astype(jnp.int32)  # (Q, B)

        E_new = jnp.maximum(H - go, E - ge)
        e_open = (H - go) >= (E - ge)  # tie -> open, like the oracle

        if spec.penalize_first_row:
            row0 = -(go + (j - 1) * ge)
        else:
            row0 = jnp.int32(0)
        row0 = jnp.broadcast_to(row0, (1, B)).astype(jnp.int32)

        diag = H[:-1] + prof_col  # rows 1..Q
        tmp = jnp.maximum(diag, E_new[1:])
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0)
        tmp_full = jnp.concatenate([row0, tmp])

        aux = tmp_full + rows * gmin
        cmax = jax.lax.cummax(aux, axis=0)
        F_rows = cmax[:-1] - go - rows[:-1] * gmin  # F[i], i = 1..Q

        H_rows = jnp.maximum(tmp, F_rows)
        H_new = jnp.concatenate([row0, H_rows])

        # F gap-open bits: F[i] from H_new[i-1] (open) vs F[i-1] (extend)
        f_prev = jnp.concatenate(
            [jnp.full((1, B), NEG, jnp.int32), F_rows[:-1]]
        )
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

        return (H_new, E_new), dirs  # dirs: (Q, B)

    xs = (
        targets.T.astype(jnp.int32),  # (T_pad, B)
        jnp.arange(1, T_pad + 1, dtype=jnp.int32),
    )
    (_, _), dirs = jax.lax.scan(step, (H0, E0), xs)  # (T_pad, Q, B)
    return jnp.transpose(dirs, (2, 1, 0))  # (B, Q, T_pad)


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


@partial(jax.jit, static_argnames=("algorithm",))
def _walk_batch_device(dirs, qes, tes, algorithm):
    """Batched on-device traceback walk over resident direction matrices.

    The direction matrices are large (B x Q x T_pad bytes) and the
    device link is the bottleneck (~25x the dir-pass compute time on
    the remote-attached TPU, DEVNOTES.md), so instead of reading them
    back, the `_walk` state machine runs on device: a ``while_loop``
    over lock-stepped pairs, each step gathering one direction byte per
    pair and emitting one op (or 255 = none) into a ``(steps, B)``
    buffer — the readback shrinks to the op buffer (~1 MB).

    Returns ``(buf, i, j)``: ``buf[s, b]`` is pair ``b``'s op at step
    ``s`` (255 = no-op; ops are emitted end-to-start), and ``(i, j)``
    are the 1-based start cells (``q_start``, ``t_start``).
    """
    spec = ALGORITHMS[algorithm]
    B, Qd, T_pad = dirs.shape
    flat = dirs.reshape(B, Qd * T_pad)
    LMAX = 2 * (Qd + T_pad) + 4
    i0 = qes.astype(jnp.int32) + 1
    j0 = tes.astype(jnp.int32) + 1
    st0 = jnp.zeros((B,), jnp.int32)  # 0=H, 1=E, 2=F
    done0 = (i0 == 0) & (j0 == 0)
    buf0 = jnp.full((LMAX, B), 255, jnp.uint8)

    def cond(c):
        s, i, j, st, done, buf = c
        return (~jnp.all(done)) & (s < LMAX)

    def body(c):
        s, i, j, st, done, buf = c
        idx = jnp.clip((i - 1) * T_pad + (j - 1), 0, Qd * T_pad - 1)
        d = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )
        code = d & 3
        in_H = (st == 0) & ~done
        in_E = (st == 1) & ~done
        in_F = (st == 2) & ~done
        i_is0 = i == 0
        j_is0 = j == 0
        false = jnp.zeros((B,), bool)

        # H-state boundary and inner sub-cases (mirrors `_walk` exactly)
        h_ins = (in_H & i_is0) if spec.penalize_first_row else false
        h_stop_i0 = false if spec.penalize_first_row else (in_H & i_is0)
        h_del = (
            (in_H & ~i_is0 & j_is0)
            if spec.penalize_first_col
            else false
        )
        h_stop_j0 = (
            false
            if spec.penalize_first_col
            else (in_H & ~i_is0 & j_is0)
        )
        h_inner = in_H & ~i_is0 & ~j_is0
        h_stop_clamp = (
            (h_inner & (code == DIR_STOP)) if spec.clamp_zero else false
        )
        h_diag = h_inner & (code == DIR_DIAG)
        h_toE = h_inner & (code == DIR_E)
        h_toF = h_inner & (code == DIR_F) & ~h_stop_clamp

        e_open = jnp.where(i > 0, (d & E_OPEN) != 0, True)
        f_open = jnp.where(j > 0, (d & F_OPEN) != 0, True)

        emit = jnp.full((B,), 255, jnp.uint8)
        emit = jnp.where(h_ins | in_E, np.uint8(OP_INS), emit)
        emit = jnp.where(h_del | in_F, np.uint8(OP_DEL), emit)
        emit = jnp.where(h_diag, np.uint8(OP_MATCH), emit)

        di = (h_del | h_diag | in_F).astype(jnp.int32)
        dj = (h_ins | h_diag | in_E).astype(jnp.int32)
        i2 = i - di
        j2 = j - dj
        done2 = (
            done
            | h_stop_i0
            | h_stop_j0
            | h_stop_clamp
            | ((i2 == 0) & (j2 == 0))
        )
        st2 = jnp.where(
            h_toE,
            1,
            jnp.where(
                h_toF,
                2,
                jnp.where(
                    in_E,
                    jnp.where(e_open, 0, 1),
                    jnp.where(in_F, jnp.where(f_open, 0, 2), st),
                ),
            ),
        )
        buf = jax.lax.dynamic_update_slice(buf, emit[None, :], (s, 0))
        return s + 1, i2, j2, st2, done2, buf

    _, i, j, _, _, buf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), i0, j0, st0, done0, buf0)
    )
    return buf, i, j


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

    # group pairs into padded sub-batches to bound device memory; the
    # accounting uses the REAL allocation shape (batch rounded to a
    # power of two, columns to the 128 quantum, every row padded to the
    # batch max), not the raw cell count
    def _alloc(nb, tmax):
        b_pow2 = 1 << max(nb - 1, 0).bit_length()
        return b_pow2 * _round_up_128(tmax) * max(Q, 1)

    order = sorted(range(n), key=lambda i: len(targets[i]))
    batch, batch_tmax = [], 1
    flushes = []
    for i in order:
        t_pad = max(len(targets[i]), 1)
        if _alloc(1, t_pad) > MAX_DEVICE_CELLS:
            # a single pair over budget takes the scalar fallback
            out[i] = naive.traceback(
                query_enc, targets[i], matrix, go, ge, algorithm
            )
            continue
        if batch and _alloc(
            len(batch) + 1, max(batch_tmax, t_pad)
        ) > MAX_DEVICE_CELLS:
            flushes.append(batch)
            batch, batch_tmax = [], 1
        batch.append(i)
        batch_tmax = max(batch_tmax, t_pad)
    if batch:
        flushes.append(batch)

    for batch in flushes:
        # quantize the padded shape (columns to the chunk quantum, batch
        # to a power of two) so repeated top-k realigns reuse compiles
        # instead of paying one per exact (B, T_pad)
        t_pad = _round_up_128(max(max(len(targets[i]) for i in batch), 1))
        B = 1 << (len(batch) - 1).bit_length()
        tgt = np.zeros((B, t_pad), dtype=np.int32)
        tlen = np.zeros(B, dtype=np.int32)
        for k, i in enumerate(batch):
            seq = targets[i]
            tgt[k, : len(seq)] = seq
            tlen[k] = len(seq)
        dirs_dev = _dir_matrix_batch(
            prof_dev,
            jnp.asarray(tgt),
            int(go),
            int(ge),
            algorithm,
            # entries beyond the f32-exact window would corrupt the
            # one-hot lookup (and therefore the walked alignment): use
            # the exact integer gather instead
            int_lookup=bool(np.abs(S).max(initial=0) >= 2**24),
        )
        # the walk runs on device too: reading the direction matrices
        # back costs ~25x their compute on the remote-attached link
        # (DEVNOTES.md); pairs the walk does not serve get (-1, -1)
        # ends, which finish immediately (i0 = j0 = 0)
        qes = np.full(B, -1, np.int32)
        tes = np.full(B, -1, np.int32)
        for k, i in enumerate(batch):
            if len(targets[i]) == 0 or Q == 0:
                continue
            qe, te = int(q_ends[i]), int(t_ends[i])
            if algorithm == "sw" and (qe < 0 or te < 0):
                continue
            # semi-global ends on the j=0 boundary (te=-1) are walked
            # from column 0 like the oracle does
            qes[k], tes[k] = qe, te
        buf, i_start, j_start = _walk_batch_device(
            dirs_dev, jnp.asarray(qes), jnp.asarray(tes), algorithm
        )
        buf = np.asarray(buf)
        i_start = np.asarray(i_start)
        j_start = np.asarray(j_start)
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
            col = buf[:, k]
            ops = col[col != 255][::-1]  # emitted end-to-start
            qs, ts = int(i_start[k]), int(j_start[k])
            # refine M -> X where residues differ (vectorized)
            ops = np.asarray(ops, dtype=np.uint8)
            consumes_q = ops != OP_INS
            consumes_t = ops != OP_DEL
            qpos = qs + np.cumsum(consumes_q) - consumes_q
            tpos = ts + np.cumsum(consumes_t) - consumes_t
            # only index at match positions: after the final residue is
            # consumed, trailing gap ops carry positions one past the end
            m = np.nonzero(ops == OP_MATCH)[0]
            tarr = np.asarray(target)
            mism = query_enc[qpos[m]] != tarr[tpos[m]]
            ops[m[mism]] = OP_MISMATCH
            # the walked path must span exactly [qs, qe] x [ts, te] —
            # a kernel/traceback divergence guard that, like
            # engine._full_rows_for's score cross-check, must fire
            # under -O too (never a bare assert)
            qi = qs + int(consumes_q.sum())
            ti = ts + int(consumes_t.sum())
            if qi != qe + 1 or ti != te + 1:
                raise RuntimeError(
                    f"inconsistent traceback span for target {i}: "
                    f"walked to ({qi},{ti}), expected ({qe + 1},{te + 1})"
                )
            out[i] = (score, qs, ts, qe, te, ops)
    return out
