"""Microbenchmark v2: SW score-only column loop, fp32 vs int16.

Changes vs v1:
- "bestvec" tracking: running elementwise max over columns (1 vreg op
  per column) instead of a per-column sublane reduction; one reduction
  at finalize (cast to f32 first — int16 reductions unsupported).
  Requires target padding symbols to score PAD for all query rows so
  out-of-range columns can never win (verified in the real kernel by
  masking at finalize instead; here synthetic targets are all valid).
- int16 state H/E/G with the same Kogge-Stone ivec scan (ivec <= Q*gmin
  fits int16); profile column converted f32 -> i16 after the MXU matmul.
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
N_STEPS = 64


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
    f32 = dtype == jnp.float32
    NEG = np.float32(-1e30) if f32 else np.int16(-20000)
    go = np.float32(3) if f32 else np.int16(3)
    ge = np.float32(1) if f32 else np.int16(1)
    gmin = np.float32(1) if f32 else np.int16(1)
    zero = np.float32(0) if f32 else np.int16(0)

    def kernel(prof_ref, targets_ref, scores_ref, H_ref, E_ref, best_ref):
        c = pl.program_id(0)
        Q_pad, L = H_ref.shape

        @pl.when(c == 0)
        def _init():
            H_ref[:] = jnp.zeros((Q_pad, L), dtype)
            E_ref[:] = jnp.full((Q_pad, L), NEG, dtype)
            best_ref[:] = jnp.zeros((Q_pad, L), dtype)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Q_pad, L), 0)
        ivec = (
            row_iota.astype(jnp.float32) * gmin
            if f32
            else row_iota.astype(jnp.int16) * gmin
        )
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
            if not f32:
                prof_col = prof_col.astype(jnp.int16)

            H = H_ref[:]
            E = E_ref[:]
            E_new = jnp.maximum(H - go, E - ge)
            shifted = _shift_down(H, 1, zero)
            diag = shifted + prof_col
            tmp = jnp.maximum(diag, E_new)
            tmp = jnp.maximum(tmp, zero)
            G = _cummax(tmp + ivec, NEG) - ivec
            Gs = _shift_down(G, 1, NEG)
            F = Gs - go
            H_new = jnp.maximum(tmp, F)
            H_ref[:] = H_new
            E_ref[:] = E_new
            best_ref[:] = jnp.maximum(best_ref[:], H_new)
            return 0

        jax.lax.fori_loop(0, CHUNK, column, 0)

        @pl.when(c == N_STEPS - 1)
        def _fin():
            bf = best_ref[:].astype(jnp.float32)
            scores_ref[0:1, :] = jnp.max(bf, axis=0, keepdims=True).astype(
                jnp.int32
            )

    return kernel


@partial(jax.jit, static_argnames=("dtype_name",))
def run(prof, targets, dtype_name):
    dtype = {"f32": jnp.float32, "i16": jnp.int16}[dtype_name]
    kernel = make_kernel(dtype)
    out = pl.pallas_call(
        kernel,
        grid=(N_STEPS,),
        in_specs=[
            pl.BlockSpec(
                (Q_PAD, ALPHA), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Q_PAD, LANES), dtype),
            pltpu.VMEM((Q_PAD, LANES), dtype),
            pltpu.VMEM((Q_PAD, LANES), dtype),
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

    ref = None
    for name in ("f32", "i16"):
        try:
            out = np.asarray(run(prof, targets, name))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:400]}")
            continue
        if ref is None:
            ref = out
        match = "match" if np.array_equal(out, ref) else "MISMATCH"
        K = 12
        t0 = time.perf_counter()
        _ = np.asarray(run(prof, targets, name))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(prof, targets, name)
        _ = np.asarray(r)
        tK = time.perf_counter() - t0
        marginal = (tK - t1) / (K - 1)
        print(
            f"{name}: marginal {marginal*1e3:.2f} ms  "
            f"{cells/marginal/1e9:.1f} GCUPS  {match}  sample={out[0,:4]}"
        )


if __name__ == "__main__":
    main()
