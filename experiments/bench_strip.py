"""Microbenchmark: strip-blocked F-scan vs full-Q Kogge-Stone scan.

The ragged kernel's exact F resolution is an inclusive max-scan over
all Q_pad rows per target column: log2(Q_pad) rounds x (shift + max)
over the full (Q_pad, LANES) state = ~22 vector ops/element at
Q_pad=2048 (~45% of kernel time, DEVNOTES).  Strip-blocking processes
the query in strips of S rows: the scan depth drops to log2(S), at the
cost of per-column boundary carries between strips (the H and
running-chain-max C values at each strip's last row, stored per column
in small VMEM scratch) and a second loop level.

Semantics are unchanged: the F chain entering strip s+1 at column j is
exactly C_last[s][j], the inclusive scan value at strip s's last row,
because max-scan is associative.  The diag term for strip s+1 row 0 at
column j needs H_last[s][j-1], carried through the column loop.

SW score-only (bestvec) variant; validated cell-exact against the
full-scan kernel on random data before timing.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ALPHA = 32
CHUNK = 128
N_STEPS = 64
NEG = np.float32(-1e30)
GO = np.float32(3)
GE = np.float32(1)
GMIN = np.float32(1)


def _shift_down(x, d, fill):
    if d >= x.shape[0]:
        return jnp.full_like(x, fill)
    top = jnp.full((d, x.shape[1]), fill, dtype=x.dtype)
    return jnp.concatenate([top, x[:-d]], axis=0)


def _cummax(x):
    d = 1
    while d < x.shape[0]:
        x = jnp.maximum(x, _shift_down(x, d, NEG))
        d *= 2
    return x


def make_full_kernel(Q_pad, unroll):
    """Current design: full-Q scan, column fori_loop with carry."""

    def kernel(prof_ref, targets_ref, scores_ref, H_ref, E_ref, best_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            H_ref[:] = jnp.zeros((Q_pad, LANES), jnp.float32)
            E_ref[:] = jnp.full((Q_pad, LANES), NEG, jnp.float32)
            best_ref[:] = jnp.zeros((Q_pad, LANES), jnp.float32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, LANES), 0)
        ivec = row_iota.astype(jnp.float32) * GMIN
        ivec_f = ivec + (GO - GMIN)
        alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, LANES), 0)
        prof = prof_ref[:]

        def column(jj, carry):
            H, E, best = carry
            sym = targets_ref[pl.ds(jj, 1), :]
            onehot = (alpha_iota == sym).astype(jnp.bfloat16)
            prof_col = jax.lax.dot_general(
                prof, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            E_new = jnp.maximum(H - GO, E - GE)
            diag = _shift_down(H, 1, 0.0) + prof_col
            tmp = jnp.maximum(jnp.maximum(diag, E_new), 0.0)
            C = _cummax(tmp + ivec)
            F = _shift_down(C, 1, NEG) - ivec_f
            H_new = jnp.maximum(tmp, F)
            best = jnp.maximum(best, H_new)
            return H_new, E_new, best

        def body(base, carry):
            for u in range(unroll):
                carry = column(base * unroll + u, carry)
            return carry

        H, E, best = jax.lax.fori_loop(
            0, CHUNK // unroll, body, (H_ref[:], E_ref[:], best_ref[:])
        )
        H_ref[:] = H
        E_ref[:] = E
        best_ref[:] = best

        @pl.when(c == N_STEPS - 1)
        def _fin():
            scores_ref[0:1, :] = jnp.max(
                best_ref[:], axis=0, keepdims=True
            ).astype(jnp.int32)

    return kernel


def make_strip_kernel(Q_pad, S, unroll):
    """Strip-blocked: outer loop over Q strips, inner over columns.

    VMEM boundary scratch, written by strip s / read by strip s+1
    *within the same chunk* (strip s runs first, and the consumer
    reads a column's value before overwriting it with its own):
      bH_ref (CHUNK, LANES): H at strip's last row, per column
      bC_ref (CHUNK, LANES): inclusive chain max (C) at last row
    Cross-chunk per-strip carry (the strip-above's last-row H at the
    previous chunk's final column, needed for column 0's diag) is
    double-buffered by chunk parity — within a chunk, strip s-1
    overwrites its slot before strip s runs, so a single buffer would
    hand strip s a value one chunk too new:
      Hcarry_ref (2 * n_strips, LANES), slot (c%2)*n_strips + s.
    """
    n_strips = Q_pad // S

    def kernel(
        prof_ref, targets_ref, scores_ref,
        H_ref, E_ref, best_ref, bH_ref, bC_ref, Hcarry_ref,
    ):
        c = pl.program_id(0)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
        alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, LANES), 0)

        @pl.when(c == 0)
        def _init():
            H_ref[:] = jnp.zeros((Q_pad, LANES), jnp.float32)
            E_ref[:] = jnp.full((Q_pad, LANES), NEG, jnp.float32)
            best_ref[:] = jnp.zeros((Q_pad, LANES), jnp.float32)
            Hcarry_ref[:] = jnp.zeros((2 * n_strips, LANES), jnp.float32)

        def strip(s, _):
            base_f = (s * S).astype(jnp.float32)
            ivec = row_iota.astype(jnp.float32) * GMIN + base_f * GMIN
            ivec_f = ivec + (GO - GMIN)
            prof = prof_ref[pl.ds(s * S, S), :]
            is_first = s == 0

            def column(jj, carry):
                H, E, best, top_prev = carry
                # read the strip-above boundary at THIS column before
                # overwriting it below; consumed as next column's diag
                bH_above = bH_ref[pl.ds(jj, 1), :]
                Cin = jnp.where(is_first, NEG, bC_ref[pl.ds(jj, 1), :])
                sym = targets_ref[pl.ds(jj, 1), :]
                onehot = (alpha_iota == sym).astype(jnp.bfloat16)
                prof_col = jax.lax.dot_general(
                    prof, onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                E_new = jnp.maximum(H - GO, E - GE)
                shifted = _shift_down(H, 1, 0.0)
                # row 0 of this strip: diag comes from the strip above
                # (H at its last row, previous column)
                top = jnp.where(is_first, 0.0, top_prev)
                shifted = jnp.where(row_iota == 0, top, shifted)
                diag = shifted + prof_col
                tmp = jnp.maximum(jnp.maximum(diag, E_new), 0.0)
                # chain entering this strip: C at strip above's last
                # row, same column (vertical chain)
                C = jnp.maximum(_cummax(tmp + ivec), Cin)
                # exclusive shift with the incoming chain at row 0
                F = jnp.concatenate([Cin, C[: S - 1]], axis=0) - ivec_f
                H_new = jnp.maximum(tmp, F)
                best = jnp.maximum(best, H_new)
                bH_ref[pl.ds(jj, 1), :] = H_new[S - 1 : S, :]
                bC_ref[pl.ds(jj, 1), :] = C[S - 1 : S, :]
                return H_new, E_new, best, bH_above

            def body(base, carry):
                for u in range(unroll):
                    carry = column(base * unroll + u, carry)
                return carry

            # column 0's diag top: strip-above's last-row H at the
            # previous chunk's final column (prev-parity buffer)
            s_above = jnp.maximum(s - 1, 0)  # s=0 is masked by is_first
            top0 = Hcarry_ref[pl.ds(((c + 1) % 2) * n_strips + s_above, 1), :]
            top0 = jnp.where((c == 0) | is_first, 0.0, top0)
            carry0 = (
                H_ref[pl.ds(s * S, S), :],
                E_ref[pl.ds(s * S, S), :],
                best_ref[pl.ds(s * S, S), :],
                top0,
            )
            H, E, best, _ = jax.lax.fori_loop(
                0, CHUNK // unroll, body, carry0
            )
            H_ref[pl.ds(s * S, S), :] = H
            E_ref[pl.ds(s * S, S), :] = E
            best_ref[pl.ds(s * S, S), :] = best
            Hcarry_ref[pl.ds((c % 2) * n_strips + s, 1), :] = H[S - 1 : S, :]
            return 0

        jax.lax.fori_loop(0, n_strips, strip, 0)

        @pl.when(c == N_STEPS - 1)
        def _fin():
            scores_ref[0:1, :] = jnp.max(
                best_ref[:], axis=0, keepdims=True
            ).astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("variant", "Q_pad", "S", "unroll"))
def run(prof, targets, variant, Q_pad, S=64, unroll=4):
    if variant == "full":
        kernel = make_full_kernel(Q_pad, unroll)
        scratch = [
            pltpu.VMEM((Q_pad, LANES), jnp.float32) for _ in range(3)
        ]
    else:
        kernel = make_strip_kernel(Q_pad, S, unroll)
        scratch = [
            pltpu.VMEM((Q_pad, LANES), jnp.float32) for _ in range(3)
        ] + [
            pltpu.VMEM((CHUNK, LANES), jnp.float32),
            pltpu.VMEM((CHUNK, LANES), jnp.float32),
            pltpu.VMEM((2 * (Q_pad // S), LANES), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(N_STEPS,),
        in_specs=[
            pl.BlockSpec(
                (Q_pad, ALPHA), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        scratch_shapes=scratch,
    )(prof, targets)


def main():
    rng = np.random.default_rng(0)
    for Q_pad in (256, 1024, 2048):
        prof = jnp.asarray(
            rng.integers(-4, 12, (Q_pad, ALPHA)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        targets = jnp.asarray(
            rng.integers(0, 20, (N_STEPS * CHUNK, LANES)).astype(np.int32)
        )
        cells = Q_pad * N_STEPS * CHUNK * LANES
        ref = np.asarray(run(prof, targets, "full", Q_pad))
        rows = []
        for variant, S, unroll in [
            ("full", 0, 4),
            ("full", 0, 8),
            ("full", 0, 8),  # repeat: measurement-stability check
            ("full", 0, 16),
            ("strip", 64, 8),
            ("strip", 128, 8),
            ("strip", 256, 8),
        ]:
            if variant == "strip" and S >= Q_pad:
                continue
            try:
                out = np.asarray(
                    run(prof, targets, variant, Q_pad, S, unroll)
                )
            except Exception as e:
                print(
                    f"Q={Q_pad} {variant} S={S} u={unroll}: "
                    f"FAILED {type(e).__name__}: {str(e)[:200]}"
                )
                continue
            match = "match" if np.array_equal(out, ref) else "MISMATCH"
            K = 12
            t0 = time.perf_counter()
            _ = np.asarray(run(prof, targets, variant, Q_pad, S, unroll))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(K):
                r = run(prof, targets, variant, Q_pad, S, unroll)
            _ = np.asarray(r)
            tK = time.perf_counter() - t0
            marginal = (tK - t1) / (K - 1)
            rows.append(
                f"Q={Q_pad} {variant:5s} S={S:4d} u={unroll}: "
                f"{marginal*1e3:7.2f} ms  {cells/marginal/1e9:6.1f} GCUPS"
                f"  {match}"
            )
        print("\n".join(rows), flush=True)


if __name__ == "__main__":
    main()
