"""Probe: can the remote Mosaic toolchain read uint8 target symbols?

Three variants of the ragged kernels' symbol-read idiom:
  a) uint8 VMEM ref, dynamic 1-row slice, cast to int32 in-kernel
  b) uint8 VMEM ref, full read + cast once, then dynamic row slices
  c) int32 VMEM ref produced by an XLA cast of a uint8 HBM array
     *outside* the kernel (fallback: 4x less resident HBM + upload,
     transient int32 copy at call time)

Run on the TPU backend; each variant prints OK or the compiler error.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


ROWS, LANES = 256, 128


def _kernel_a(t_ref, o_ref):
    def body(j, acc):
        sym = t_ref[pl.ds(j, 1), :].astype(jnp.int32)  # (1, LANES) u8->i32
        return acc + sym

    acc = jax.lax.fori_loop(
        0, ROWS, body, jnp.zeros((1, LANES), jnp.int32)
    )
    o_ref[:] = acc


def _kernel_b(t_ref, o_ref):
    t = t_ref[:].astype(jnp.int32)  # widen once

    def body(j, acc):
        sym = jax.lax.dynamic_slice(t, (j, 0), (1, LANES))
        return acc + sym

    acc = jax.lax.fori_loop(
        0, ROWS, body, jnp.zeros((1, LANES), jnp.int32)
    )
    o_ref[:] = acc


def _kernel_c(t_ref, o_ref):
    def body(j, acc):
        sym = t_ref[pl.ds(j, 1), :]
        return acc + sym

    acc = jax.lax.fori_loop(
        0, ROWS, body, jnp.zeros((1, LANES), jnp.int32)
    )
    o_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    tu8 = jnp.asarray(rng.integers(0, 32, (ROWS, LANES)), jnp.uint8)
    want = np.asarray(tu8, np.int64).sum(axis=0)

    def run(name, kernel, arg):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            )
            out = np.asarray(jax.jit(fn)(arg)).reshape(-1)
            ok = (out == want).all()
            print(f"{name}: {'OK' if ok else 'WRONG VALUES'}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")

    run("a_u8_dyn_slice_cast", _kernel_a, tu8)
    run("b_u8_widen_once", _kernel_b, tu8)

    def outer(tu8_arr):
        return pl.pallas_call(
            _kernel_c,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        )(tu8_arr.astype(jnp.int32))

    try:
        out = np.asarray(jax.jit(outer)(tu8)).reshape(-1)
        print(f"c_xla_cast_outside: {'OK' if (out == want).all() else 'WRONG VALUES'}")
    except Exception as e:  # noqa: BLE001
        print(f"c_xla_cast_outside: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
