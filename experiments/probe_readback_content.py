"""Does readback time over the axon tunnel depend on data CONTENT?

DEVNOTES records ~30 ms base + ~32 ms/MB for int32 readbacks and that
int16 of the same MB is *slower* — consistent with a compressing relay.
If compression is real, reading back scores in packed (length-sorted)
order — where neighboring lanes correlate — and reordering on the host
could beat the device-side gather into global order.

Run on the TPU backend: PYTHONPATH must keep /root/.axon_site.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (64, 12288)  # bench-like: 64 queries x 12k targets, int32


def timed_readback(x, n=5):
    # jax.Array caches the host copy after the first conversion, so a
    # FRESH device-computed array is needed per trial; the +k add is
    # microseconds of device time against a ~100 ms transfer
    addk = jax.jit(lambda x, k: x + k)
    np.asarray(addk(x, 0))  # warm the add kernel + sync
    ts = []
    for k in range(1, n + 1):
        y = addk(x, k)
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    rng = np.random.default_rng(0)
    mb = np.prod(SHAPE) * 4 / 1e6

    cases = {
        "zeros": np.zeros(SHAPE, np.int32),
        "constant 1234": np.full(SHAPE, 1234, np.int32),
        "random [0,100)": rng.integers(0, 100, SHAPE).astype(np.int32),
        "random [0,2^15)": rng.integers(0, 2**15, SHAPE).astype(np.int32),
        "random full int32": rng.integers(
            -(2**31), 2**31 - 1, SHAPE
        ).astype(np.int32),
        "sorted rows [0,2^15)": np.sort(
            rng.integers(0, 2**15, SHAPE).astype(np.int32), axis=1
        ),
        "smooth walk": np.cumsum(
            rng.integers(-3, 4, SHAPE).astype(np.int32), axis=1
        ),
    }
    print(f"shape {SHAPE} = {mb:.2f} MB int32")
    for name, arr in cases.items():
        dt = timed_readback(jax.device_put(arr))
        print(f"{name:24s} {dt*1e3:8.1f} ms  ({mb/dt:6.1f} MB/s)")


if __name__ == "__main__":
    main()
