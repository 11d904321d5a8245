"""Round 2: isolate the failing int16 ops."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
R = 256


def probe(name, body):
    def kernel(x_ref, o_ref, s_ref):
        body(x_ref, o_ref, s_ref)

    try:
        x = jnp.zeros((R, L), jnp.int16)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int16),
            scratch_shapes=[pltpu.VMEM((R, L), jnp.int16)],
        )(x)
        np.asarray(out)
        print(f"OK    {name}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}", flush=True)


def main():
    probe("max_arrays", lambda x, o, s: o.__setitem__(
        slice(None), jnp.maximum(x[:], x[:])))
    probe("add_scalar", lambda x, o, s: o.__setitem__(
        slice(None), x[:] + jnp.int16(3)))
    probe("sub_scalar", lambda x, o, s: o.__setitem__(
        slice(None), x[:] - jnp.int16(1)))
    probe("add_np_scalar", lambda x, o, s: o.__setitem__(
        slice(None), x[:] + np.int16(3)))
    probe("max_add", lambda x, o, s: o.__setitem__(
        slice(None), jnp.maximum(x[:] + np.int16(3), x[:])))

    def where_i16(x, o, s):
        v = x[:]
        o[:] = jnp.where(v > 0, v, jnp.int16(-1))

    probe("where_i16", where_i16)

    def where_arrays(x, o, s):
        v = x[:]
        o[:] = jnp.where(v > 0, v, v + np.int16(1))

    probe("where_arrays", where_arrays)

    def scratch_rw(x, o, s):
        s[:] = x[:]
        o[:] = jnp.maximum(s[:], x[:])

    probe("scratch_rw", scratch_rw)

    def roll_i16(x, o, s):
        o[:] = pltpu.roll(x[:], 1, 0)

    probe("pltpu_roll_i16", roll_i16)

    def cummax_i16(x, o, s):
        v = x[:]
        d = 1
        while d < R:
            top = jnp.full((d, L), np.int16(-20000), jnp.int16)
            v = jnp.maximum(v, jnp.concatenate([top, v[:-d]], axis=0))
            d *= 2
        o[:] = v

    probe("cummax_i16", cummax_i16)


if __name__ == "__main__":
    main()
