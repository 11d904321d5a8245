"""Measure fp32 SW column-loop GCUPS vs lane width and column unroll.

Hypothesis: the per-column F-scan is a serialized dependency chain
(log2(Q_pad) max-rounds); widening the lane axis (more targets per
kernel instance) adds independent vreg work per round and may lift
throughput if the VPU is stalling on the chain rather than saturating
issue slots.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA = 32
Q_PAD = 256
CHUNK = 128
N_COLS = 8192  # total target columns processed per dispatch


def _shift_down(x, d, fill):
    if d >= x.shape[0]:
        return jnp.full_like(x, fill)
    top = jnp.full((d, x.shape[1]), fill, dtype=x.dtype)
    return jnp.concatenate([top, x[:-d]], axis=0)


def _cummax(x, neg):
    d = 1
    while d < x.shape[0]:
        x = jnp.maximum(x, _shift_down(x, d, neg))
        d *= 2
    return x


NEG = np.float32(-1e30)
GO = np.float32(3)
GE = np.float32(1)


def make_kernel(lanes, unroll):
    def kernel(prof_ref, targets_ref, scores_ref, H_ref, E_ref, best_ref):
        c = pl.program_id(0)
        Q_pad, L = H_ref.shape

        @pl.when(c == 0)
        def _init():
            H_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)
            E_ref[:] = jnp.full((Q_pad, L), NEG, jnp.float32)
            best_ref[:] = jnp.zeros((Q_pad, L), jnp.float32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        ivec = row_iota.astype(jnp.float32)  # gmin = 1
        alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)
        prof = prof_ref[:]

        def one_col(jj):
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
            E_new = jnp.maximum(H - GO, E - GE)
            shifted = _shift_down(H, 1, np.float32(0))
            diag = shifted + prof_col
            tmp = jnp.maximum(jnp.maximum(diag, E_new), 0.0)
            G = _cummax(tmp + ivec, NEG) - ivec
            Gs = _shift_down(G, 1, NEG)
            H_new = jnp.maximum(tmp, Gs - GO)
            H_ref[:] = H_new
            E_ref[:] = E_new
            best_ref[:] = jnp.maximum(best_ref[:], H_new)

        def column(base, _):
            for u in range(unroll):
                one_col(base * unroll + u)
            return 0

        jax.lax.fori_loop(0, CHUNK // unroll, column, 0)

        @pl.when(c == (N_COLS // CHUNK) - 1)
        def _fin():
            bf = best_ref[:]
            scores_ref[0:1, :] = jnp.max(bf, axis=0, keepdims=True).astype(
                jnp.int32
            )

    return kernel


@partial(jax.jit, static_argnames=("lanes", "unroll"))
def run(prof, targets, lanes, unroll):
    kernel = make_kernel(lanes, unroll)
    out = pl.pallas_call(
        kernel,
        grid=(N_COLS // CHUNK,),
        in_specs=[
            pl.BlockSpec(
                (Q_PAD, ALPHA), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, lanes), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, lanes), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Q_PAD, lanes), jnp.float32),
            pltpu.VMEM((Q_PAD, lanes), jnp.float32),
            pltpu.VMEM((Q_PAD, lanes), jnp.float32),
        ],
    )(prof, targets)
    return out


def main():
    rng = np.random.default_rng(0)
    prof = jnp.asarray(
        rng.integers(-4, 12, (Q_PAD, ALPHA)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    for lanes in (128,):
        targets = jnp.asarray(
            rng.integers(0, 20, (N_COLS, lanes)).astype(np.int32)
        )
        cells = Q_PAD * N_COLS * lanes
        for unroll in (1, 2, 4, 8, 2, 4):
            try:
                np.asarray(run(prof, targets, lanes, unroll))
            except Exception as e:
                print(
                    f"lanes={lanes} unroll={unroll}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}",
                    flush=True,
                )
                continue
            K = 12
            t0 = time.perf_counter()
            _ = np.asarray(run(prof, targets, lanes, unroll))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(K):
                r = run(prof, targets, lanes, unroll)
            _ = np.asarray(r)
            tK = time.perf_counter() - t0
            marginal = (tK - t1) / (K - 1)
            print(
                f"lanes={lanes} unroll={unroll}: {marginal*1e3:.2f} ms "
                f"{cells/marginal/1e9:.1f} GCUPS",
                flush=True,
            )


if __name__ == "__main__":
    main()
