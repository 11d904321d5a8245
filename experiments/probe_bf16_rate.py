"""Is bf16 (or int8-adjacent) VPU arithmetic faster than f32?

The narrow-dtype avenue (VERDICT r4 #1b) only pays if the VPU issues
packed narrow ops at a higher rate than f32.  This probe times an
elementwise add/max chain — the DP inner-loop op mix — at both dtypes
over the same logical element count.  If bf16 throughput == f32
throughput, the VPU ALUs are 32-bit and *no* narrow-dtype compute tier
can beat fp32 on this hardware, independent of Mosaic's int16 bugs.

Run on the TPU backend; one process at a time (DEVNOTES).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 512, 512
STEPS = 512  # serial op-chain length inside the kernel


CHAINS = 4  # independent dependency chains -> issue-bound, not latency


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        one = jnp.ones((), dtype)
        two = one + one

        def body(i, vs):
            # 3 vector ops per step per chain: add, sub(add), max
            return tuple(
                jnp.maximum(v + one, v - two) for v in vs
            )

        vs = tuple(x_ref[:] + jnp.array(k, dtype) for k in range(CHAINS))
        vs = jax.lax.fori_loop(0, STEPS, body, vs)
        acc = vs[0]
        for v in vs[1:]:
            acc = jnp.maximum(acc, v)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (R, L), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, L), dtype),
    )


def time_one(dtype, reps=8):
    fn = jax.jit(make_kernel(dtype))
    x = jnp.asarray(np.random.default_rng(0).integers(0, 50, (R, L)), dtype)
    np.asarray(fn(x))  # warm + sync
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(x)
    np.asarray(y)
    dt = time.perf_counter() - t0
    ops = 3 * STEPS * R * L * reps * CHAINS
    return dt, ops / dt / 1e9


def main():
    for dtype in (jnp.float32, jnp.bfloat16, jnp.float16, jnp.int32):
        try:
            dt, gops = time_one(dtype)
            print(f"{jnp.dtype(dtype).name:10s} {dt*1e3:8.1f} ms  {gops:8.1f} Gop/s")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:140]
            print(f"{jnp.dtype(dtype).name:10s} FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
