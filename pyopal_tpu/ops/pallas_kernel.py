"""Pallas TPU kernel: inter-sequence vectorized affine-gap DP.

TPU-native re-design of Opal's SIMD core (``opal.cpp`` [upstream]; ABI
at ``/root/reference/src/pyopal/opal.pxd:40-54``).  Layout and data
flow:

- **One database sequence per VPU lane.**  A block holds 128 targets
  (lanes); query positions run across sublanes/rows, so the DP state
  ``H``/``E`` is a ``(Q_pad, 128)`` fp32 array resident in VMEM and
  every vector op updates 128 alignment columns at once — the TPU
  reimagining of SWIPE inter-sequence vectorization (``README.md:26-28``).

- **Profile lookup rides the MXU.**  Opal gathers per-lane scoring
  profiles with SIMD shuffles; gathers are poison on TPU, so the score
  column ``prof[i, lane] = S[q_i, t_j[lane]]`` is computed as a one-hot
  matmul ``(Q_pad, 32)bf16 @ (32, 128)bf16 -> f32`` — exact, since all
  substitution scores are small integers.

- **Exact affine F-scan.**  The vertical gap recurrence
  ``F[i] = max(H[i-1]-go, F[i-1]-ge)`` is a max-plus prefix scan; using
  ``H[i-1] = max(tmp[i-1], F[i-1])`` it folds to
  ``F[i] = max_k (tmp[k] - go - (i-1-k) * min(go, ge))``, computed with
  a log-depth Kogge-Stone max-scan over sublanes — no per-row serial
  loop and no "lazy-F" approximation (exact for any gap parameters).

- **Column streaming.**  Long targets are processed in chunks of
  ``COL_CHUNK`` columns: the grid is ``(n_blocks, n_chunks)`` and the
  ``H``/``E`` state + best-score trackers persist in VMEM scratch
  across the sequential chunk dimension, so target length is unbounded
  by VMEM (the TPU analog of the O(query) column-sweep memory of the
  reference engine).

All arithmetic is fp32 — exact for the integer score domain (bounded by
|S|max * len < 2^24), hence bit-identical to the int32 oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import ALGORITHMS

LANES = 128
ALPHA = 32  # padded alphabet/contraction dim (MAX_ALPHABET_SIZE)
COL_CHUNK = 256  # target columns processed per grid step
MAX_QPAD = 4096  # VMEM budget for H/E state; longer queries fall back
NEG = np.float32(-1.0e30)
#: Profile rows beyond the true query (and, under safe_pad flat
#: packing, the PAD_SYMBOL column) score this.  It must dominate any
#: legitimate H value so padded rows/columns can never win a running
#: max: |H| <= Q_max * max|S| = 4096 * 256 ~= 1.05e6 (the engine routes
#: matrices with entries beyond bf16's exact-integer range of +-256 to
#: the int32 XLA path), so -4e6 guarantees H + PAD_SCORE < 0 while
#: keeping all DP values well inside fp32's exact-integer domain (2^24).
PAD_SCORE = np.float32(-4.0e6)


def supports(Q: int) -> bool:
    """Whether the kernel handles this query length in VMEM."""
    return 0 < Q <= MAX_QPAD


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def make_profile(query_enc: np.ndarray, matrix: np.ndarray):
    """Build the ``(Q_pad, 32)`` bf16 transposed query profile.

    Rows past the true query length get ``PAD_SCORE`` so padded DP rows
    can never win any tracked maximum.  Returns ``(profile, Q)``.
    """
    prof = make_profile_host(query_enc, matrix)
    return jnp.asarray(prof, dtype=jnp.bfloat16), int(query_enc.shape[0])


def make_profile_host(query_enc: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """Host-side float32 profile (see `make_profile`)."""
    q = np.asarray(query_enc, dtype=np.int64)
    S = np.asarray(matrix, dtype=np.float32)
    Q = q.shape[0]
    Q_pad = _round_up(max(Q, 8), 8)
    prof = np.full((Q_pad, ALPHA), PAD_SCORE, dtype=np.float32)
    prof[:Q, : S.shape[1]] = S[q, :]
    return prof


def _shift_down(x, d, fill):
    """Shift rows down by ``d`` (static), filling the top with ``fill``."""
    if d >= x.shape[0]:
        return jnp.full_like(x, fill)
    top = jnp.full((d, x.shape[1]), fill, dtype=x.dtype)
    return jnp.concatenate([top, x[:-d]], axis=0)


def _cummax(x):
    """Inclusive max-scan along axis 0 (log-depth Kogge-Stone)."""
    d = 1
    while d < x.shape[0]:
        x = jnp.maximum(x, _shift_down(x, d, NEG))
        d *= 2
    return x


def _first_argmax(x, row_iota):
    """(max, first-argmax) over axis 0 of ``(Q_pad, L)`` fp32 ``x``."""
    m = jnp.max(x, axis=0, keepdims=True)  # (1, L)
    big = jnp.int32(2**30)
    idx = jnp.where(x >= m, row_iota, big)
    return m, jnp.min(idx, axis=0, keepdims=True)  # (1, L)


def _dp_kernel(
    # inputs
    prof_ref,  # (Q_pad, 32) bf16
    targets_ref,  # (1, COL_CHUNK, LANES) int32
    lengths_ref,  # (1, 1, LANES) int32
    # outputs
    scores_ref,  # (1, 1, LANES) int32
    qend_ref,  # (1, 1, LANES) int32
    tend_ref,  # (1, 1, LANES) int32
    # scratch
    H_ref,  # (Q_pad, LANES) f32
    E_ref,  # (Q_pad, LANES) f32
    trk_f_ref,  # (8, LANES) f32: 0=best 1=cap
    trk_i_ref,  # (8, LANES) i32: 0=bi 1=bj 2=lc_i
    *,
    algorithm: str,
    go: int,
    ge: int,
    Q: int,
    chunk: int,
    n_chunks: int,
    with_ends: bool,
):
    spec = ALGORITHMS[algorithm]
    Q_pad, L = H_ref.shape
    c = pl.program_id(1)

    gof = np.float32(go)
    gef = np.float32(ge)
    gmin = np.float32(min(go, ge))

    lengths = lengths_ref[0, 0:1, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
    ivec = row_iota.astype(jnp.float32) * gmin  # a * gmin per row

    # ---- init state on the first column chunk of each block ----
    @pl.when(c == 0)
    def _init():
        if spec.penalize_first_col:
            col0 = -(gof + row_iota.astype(jnp.float32) * gef)
        else:
            col0 = jnp.zeros((Q_pad, L), jnp.float32)
        H_ref[:] = col0
        E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
        if spec.track_terminal:  # nw terminal for empty targets
            cap0 = -(gof + np.float32(Q - 1) * gef)
        else:
            cap0 = NEG
        if spec.track_last_row:
            best0 = (
                -(gof + np.float32(Q - 1) * gef)
                if spec.penalize_first_col
                else np.float32(0.0)
            )
        else:
            best0 = np.float32(0.0)  # sw floor: empty alignment
        trk_f_ref[0:1, :] = jnp.full((1, L), best0, jnp.float32)
        trk_f_ref[1:2, :] = jnp.full((1, L), cap0, jnp.float32)
        trk_i_ref[0:1, :] = jnp.full((1, L), -1, jnp.int32)
        trk_i_ref[1:2, :] = jnp.full((1, L), -1, jnp.int32)
        trk_i_ref[2:3, :] = jnp.full((1, L), -1, jnp.int32)

    alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)
    prof = prof_ref[:]  # (Q_pad, 32) bf16

    def column(jj, _):
        j = c * chunk + jj  # global 0-based target position
        sym = targets_ref[0, pl.ds(jj, 1), :]  # (1, LANES) int32
        onehot = (alpha_iota == sym).astype(jnp.bfloat16)  # (32, LANES)
        prof_col = jax.lax.dot_general(
            prof,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q_pad, LANES) f32

        H = H_ref[:]
        E = E_ref[:]

        E_new = jnp.maximum(H - gof, E - gef)

        jf = j.astype(jnp.float32)
        if spec.penalize_first_row:
            row0_cur = -(gof + jf * gef)
            row0_prev = jnp.where(j == 0, 0.0, -(gof + (jf - 1.0) * gef))
        else:
            row0_cur = jnp.float32(0.0)
            row0_prev = jnp.float32(0.0)

        shifted = _shift_down(H, 1, 0.0)
        shifted = jnp.where(row_iota == 0, row0_prev, shifted)
        diag = shifted + prof_col

        tmp = jnp.maximum(diag, E_new)
        if spec.clamp_zero:
            tmp = jnp.maximum(tmp, 0.0)

        # exact affine F via log-depth max-scan (module docstring)
        G = _cummax(tmp + ivec) - ivec
        Gs = _shift_down(G, 1, NEG)
        F = jnp.maximum(Gs, row0_cur - ivec) - gof
        H_new = jnp.maximum(tmp, F)

        H_ref[:] = H_new
        E_ref[:] = E_new

        valid = j < lengths  # (1, LANES) bool
        at_end = j == (lengths - 1)

        if spec.track_all_cells:  # sw
            best = trk_f_ref[0:1, :]
            if with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                upd = valid & (colmax > best)
                trk_f_ref[0:1, :] = jnp.where(upd, colmax, best)
                bi = trk_i_ref[0:1, :]
                bj = trk_i_ref[1:2, :]
                trk_i_ref[0:1, :] = jnp.where(upd, coli, bi)
                trk_i_ref[1:2, :] = jnp.where(upd, j, bj)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
                upd = valid & (colmax > best)
                trk_f_ref[0:1, :] = jnp.where(upd, colmax, best)
        if spec.track_last_row:  # hw / ov
            rowval = H_new[Q - 1 : Q, :]  # (1, LANES)
            best = trk_f_ref[0:1, :]
            upd = valid & (rowval > best)
            trk_f_ref[0:1, :] = jnp.where(upd, rowval, best)
            if with_ends:
                bj = trk_i_ref[1:2, :]
                trk_i_ref[1:2, :] = jnp.where(upd, j, bj)
        if spec.track_terminal:  # nw
            cap = trk_f_ref[1:2, :]
            rowval = H_new[Q - 1 : Q, :]
            trk_f_ref[1:2, :] = jnp.where(at_end, rowval, cap)
        if spec.track_last_col:  # ov
            cap = trk_f_ref[1:2, :]
            if with_ends:
                colmax, coli = _first_argmax(H_new, row_iota)
                lc_i = trk_i_ref[2:3, :]
                trk_i_ref[2:3, :] = jnp.where(at_end, coli, lc_i)
            else:
                colmax = jnp.max(H_new, axis=0, keepdims=True)
            trk_f_ref[1:2, :] = jnp.where(at_end, colmax, cap)
        return 0

    jax.lax.fori_loop(0, chunk, column, 0)

    # ---- finalize on the last chunk ----
    @pl.when(c == n_chunks - 1)
    def _finalize():
        best = trk_f_ref[0:1, :]
        cap = trk_f_ref[1:2, :]
        bi = trk_i_ref[0:1, :]
        bj = trk_i_ref[1:2, :]
        lc_i = trk_i_ref[2:3, :]
        qlast = jnp.full((1, L), Q - 1, jnp.int32)
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
    static_argnames=("go", "ge", "algorithm", "Q", "with_ends", "interpret"),
)
def _search_group_impl(
    prof, targets, lengths, go, ge, algorithm, Q, with_ends, interpret=False
):
    n_blocks, t_pad, lanes = targets.shape
    Q_pad = prof.shape[0]
    chunk = min(COL_CHUNK, t_pad)
    n_chunks = pl.cdiv(t_pad, chunk)

    kernel = partial(
        _dp_kernel,
        algorithm=algorithm,
        go=go,
        ge=ge,
        Q=Q,
        chunk=chunk,
        n_chunks=n_chunks,
        with_ends=with_ends,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks, 1, lanes), jnp.int32)
        for _ in range(3)
    ]
    out_spec = pl.BlockSpec((1, 1, lanes), lambda b, c: (b, 0, 0))
    in_specs = [
        pl.BlockSpec(
            (Q_pad, ALPHA), lambda b, c: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, chunk, lanes),
            lambda b, c: (b, c, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, lanes), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    flops_per_cell = 20
    cost = pl.CostEstimate(
        flops=flops_per_cell * n_blocks * t_pad * lanes * Q_pad
        + 2 * ALPHA * n_blocks * t_pad * lanes * Q_pad,
        bytes_accessed=targets.size * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Q_pad, lanes), jnp.float32),
            pltpu.VMEM((Q_pad, lanes), jnp.float32),
            pltpu.VMEM((8, lanes), jnp.float32),
            pltpu.VMEM((8, lanes), jnp.int32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(prof, targets, lengths.reshape(n_blocks, 1, lanes))
    return tuple(o.reshape(n_blocks, lanes) for o in out)


def search_group(
    prof_and_q, targets, lengths, go, ge, algorithm, with_ends=True, interpret=False
):
    """Run the kernel over a stacked group of blocks.

    ``prof_and_q`` is the ``(profile, Q)`` pair from `make_profile`;
    ``targets``/``lengths`` as produced by `pyopal_tpu.ops.packing`.
    """
    prof, Q = prof_and_q
    return _search_group_impl(
        prof,
        targets,
        lengths,
        int(go),
        int(ge),
        algorithm,
        int(Q),
        bool(with_ends),
        interpret,
    )
