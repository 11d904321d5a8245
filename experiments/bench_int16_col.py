"""Microbenchmark: SW column loop in fp32 vs int16 (packed) on TPU.

Measures the marginal per-dispatch time of a Pallas kernel running the
exact SW score-only column recurrence (matmul profile lookup + E/F/H
updates + Kogge-Stone F-scan + best tracking) for both dtypes, to
decide whether an int16 fast path is worth building.
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
Q_PAD = 256
CHUNK = 128
N_STEPS = 64  # columns total = N_STEPS * CHUNK


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


def make_kernel(dtype):
    if dtype == jnp.float32:
        NEG = np.float32(-1e30)
        go, ge = np.float32(3), np.float32(1)
        gmin = np.float32(1)
    else:
        NEG = np.int16(-20000)
        go, ge = np.int16(3), np.int16(1)
        gmin = np.int16(1)

    def kernel(prof_ref, targets_ref, scores_ref, H_ref, E_ref, best_ref):
        c = pl.program_id(0)
        Q_pad, L = H_ref.shape

        @pl.when(c == 0)
        def _init():
            H_ref[:] = jnp.zeros((Q_pad, L), dtype)
            E_ref[:] = jnp.full((Q_pad, L), NEG, dtype)
            best_ref[:] = jnp.zeros((8, L), dtype)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        if dtype == jnp.float32:
            ivec = row_iota.astype(jnp.float32) * gmin
        else:
            ivec = row_iota.astype(jnp.int16) * gmin
        alpha_iota = jax.lax.broadcasted_iota(jnp.int32, (ALPHA, L), 0)
        prof = prof_ref[:]

        def column(jj, _):
            sym = targets_ref[pl.ds(jj, 1), :]
            onehot = (alpha_iota == sym).astype(jnp.bfloat16)
            prof_col = jax.lax.dot_general(
                prof,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dtype != jnp.float32:
                prof_col = prof_col.astype(jnp.int16)

            H = H_ref[:]
            E = E_ref[:]
            E_new = jnp.maximum(H - go, E - ge)
            shifted = _shift_down(H, 1, dtype(0) if dtype != jnp.float32 else np.float32(0))
            diag = shifted + prof_col
            tmp = jnp.maximum(diag, E_new)
            tmp = jnp.maximum(tmp, 0)
            G = _cummax(tmp + ivec, NEG) - ivec
            Gs = _shift_down(G, 1, NEG)
            F = Gs - go
            H_new = jnp.maximum(tmp, F)
            H_ref[:] = H_new
            E_ref[:] = E_new
            colmax = jnp.max(H_new, axis=0, keepdims=True)
            best_ref[0:1, :] = jnp.maximum(best_ref[0:1, :], colmax)
            return 0

        jax.lax.fori_loop(0, CHUNK, column, 0)

        @pl.when(c == N_STEPS - 1)
        def _fin():
            scores_ref[0:1, :] = best_ref[0:1, :].astype(jnp.int32)

    return kernel, NEG


@partial(jax.jit, static_argnames=("dtype_name",))
def run(prof, targets, dtype_name):
    dtype = {"f32": jnp.float32, "i16": jnp.int16}[dtype_name]
    kernel, _ = make_kernel(dtype)
    out = pl.pallas_call(
        kernel,
        grid=(N_STEPS,),
        in_specs=[
            pl.BlockSpec((Q_PAD, ALPHA), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Q_PAD, LANES), dtype),
            pltpu.VMEM((Q_PAD, LANES), dtype),
            pltpu.VMEM((8, LANES), dtype),
        ],
    )(prof, targets)
    return out


def main():
    rng = np.random.default_rng(0)
    prof = jnp.asarray(
        rng.integers(-4, 12, (Q_PAD, ALPHA)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    targets = jnp.asarray(
        rng.integers(0, 20, (N_STEPS * CHUNK, LANES)).astype(np.int32)
    )

    cells = Q_PAD * N_STEPS * CHUNK * LANES

    for name in ("f32", "i16"):
        try:
            out = np.asarray(run(prof, targets, name))  # compile + sync
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:500]}")
            continue
        K = 12
        t0 = time.perf_counter()
        r = run(prof, targets, name)
        _ = np.asarray(r)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(prof, targets, name)
        _ = np.asarray(r)
        tK = time.perf_counter() - t0
        marginal = (tK - t1) / (K - 1)
        print(
            f"{name}: marginal {marginal*1e3:.2f} ms  "
            f"{cells/marginal/1e9:.1f} GCUPS  sample={out[0,:4]}"
        )


if __name__ == "__main__":
    main()
