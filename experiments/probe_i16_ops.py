"""Probe which int16 ops the Mosaic TPU compiler handles."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
R = 256


def probe(name, body, n_in=1, in_dtype=jnp.int16):
    def kernel(x_ref, o_ref, s_ref):
        body(x_ref, o_ref, s_ref)

    try:
        x = jnp.zeros((R, L), in_dtype)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int16),
            scratch_shapes=[pltpu.VMEM((R, L), jnp.int16)],
        )(x)
        np.asarray(out)
        print(f"OK    {name}")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")


def main():
    probe("copy", lambda x, o, s: o.__setitem__(slice(None), x[:]))
    probe("add_max", lambda x, o, s: o.__setitem__(
        slice(None), jnp.maximum(x[:] + jnp.int16(3), x[:] - jnp.int16(1))))
    probe("iota_mul", lambda x, o, s: o.__setitem__(
        slice(None),
        x[:] + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0).astype(jnp.int16)))

    def shift1(x, o, s):
        v = x[:]
        top = jnp.full((1, L), jnp.int16(-20000), jnp.int16)
        o[:] = jnp.concatenate([top, v[:-1]], axis=0)

    probe("shift1_concat", shift1)

    def shift8(x, o, s):
        v = x[:]
        top = jnp.full((8, L), jnp.int16(-20000), jnp.int16)
        o[:] = jnp.concatenate([top, v[:-8]], axis=0)

    probe("shift8_concat", shift8)

    def cast_f32_to_i16(x, o, s):
        v = x[:].astype(jnp.float32)
        o[:] = (v * 2.0).astype(jnp.int16)

    probe("cast_f32_i16", cast_f32_to_i16)

    def cast_i16_f32_reduce(x, o, s):
        v = x[:].astype(jnp.float32)
        m = jnp.max(v, axis=0, keepdims=True)
        o[:] = jnp.broadcast_to(m.astype(jnp.int16), (R, L))

    probe("i16->f32 reduce", cast_i16_f32_reduce)

    def where_i16(x, o, s):
        v = x[:]
        o[:] = jnp.where(v > 0, v, jnp.int16(-1))

    probe("where_i16", where_i16)

    def scratch_rw(x, o, s):
        s[:] = x[:]
        o[:] = jnp.maximum(s[:], x[:])

    probe("scratch_rw", scratch_rw)

    def full_like_init(x, o, s):
        s[:] = jnp.full((R, L), jnp.int16(-20000), jnp.int16)
        o[:] = s[:]

    probe("full_init", full_like_init)

    def cummax_i16(x, o, s):
        v = x[:]
        d = 1
        while d < R:
            top = jnp.full((d, L), jnp.int16(-20000), jnp.int16)
            v = jnp.maximum(v, jnp.concatenate([top, v[:-d]], axis=0))
            d *= 2
        o[:] = v

    probe("cummax_i16", cummax_i16)

    def roll_i16(x, o, s):
        o[:] = pltpu.roll(x[:], 1, 0)

    probe("pltpu_roll_i16", roll_i16)


if __name__ == "__main__":
    main()
