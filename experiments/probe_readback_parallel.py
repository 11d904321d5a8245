"""Can the ~32 ms/MB readback floor be beaten by splitting the
transfer across threads / slices, or by a different host API?

If the tunnel chunk-handshakes per transfer, K parallel readbacks of
1/K each may overlap handshakes; if it is truly bandwidth-serial, the
total stays flat.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (64, 12288)


def main():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 2**15, SHAPE).astype(np.int32)
    x = jax.device_put(arr)
    addk = jax.jit(lambda x, k: x + k)
    np.asarray(addk(x, 0))
    mb = arr.nbytes / 1e6

    def timed(fn, n=5):
        ts = []
        for k in range(n):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    dt = timed(lambda k: np.asarray(addk(x, k + 1)))
    print(f"single asarray {mb:.2f} MB: {dt*1e3:7.1f} ms ({mb/dt:5.1f} MB/s)")

    dt = timed(lambda k: jax.device_get(addk(x, k + 100)))
    print(f"device_get:               {dt*1e3:7.1f} ms")

    # pre-split on device into K parts, read back in K threads
    for K in (2, 4, 8):
        split = jax.jit(lambda x, k: [x[i::K] + k for i in range(K)])
        parts0 = split(x, 0)
        [np.asarray(p) for p in parts0]

        pool = ThreadPoolExecutor(K)

        def readback(k):
            parts = split(x, k + 200)
            list(pool.map(np.asarray, parts))

        dt = timed(readback)
        print(f"{K} threads x {mb/K:.2f} MB:      {dt*1e3:7.1f} ms ({mb/dt:5.1f} MB/s)")

    # size scaling: base vs per-MB
    for rows in (4, 16, 32):
        sl = jax.jit(lambda x, k, r=rows: x[:r] + k)
        y0 = sl(x, 0)
        np.asarray(y0)
        smb = y0.nbytes / 1e6
        dt = timed(lambda k: np.asarray(sl(x, k + 500)))
        print(f"size {smb:5.2f} MB:             {dt*1e3:7.1f} ms ({smb/dt:5.1f} MB/s)")


if __name__ == "__main__":
    main()
