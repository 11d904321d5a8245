"""Probe: does ``copy_to_host_async`` overlap D2H with later compute?

Round-3 question: the engine batch path enqueues K Pallas launches
asynchronously and then performs ONE blocking stacked readback — the
whole transfer (~0.75-1.5 MB at ~30 ms/MB + 28 ms base RTT on the
tunneled link) is serialized after the last kernel.  If the runtime can
stream launch k's result to the host while launch k+1 computes, only
the LAST launch's transfer is exposed.

Three variants over K sequential heavy kernels each producing a
``bytes_each`` result:
  stacked   — concatenate on device, one blocking ``np.asarray`` at end
  async_k   — ``copy_to_host_async()`` right after each launch,
              blocking gather at the end
  sync_k    — blocking ``np.asarray`` after each launch (worst case,
              serializes compute too)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 4
N = 2048
ITERS = 24  # heavy-ish compute per launch
ROWS = 16  # output rows
COLS = 12071


@jax.jit
def heavy(x, seed):
    def body(i, a):
        return jnp.tanh(a @ x) * 0.5 + a * 0.5

    a = jax.lax.fori_loop(0, ITERS, body, x + seed)
    # shrink to a (ROWS, COLS)-int32 result like an assembled score block
    r = jnp.cumsum(a[:ROWS, :1], axis=0) + jnp.arange(COLS)[None, :]
    return r.astype(jnp.int32)


def run(variant):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N)), jnp.float32)
    outs = []
    t0 = time.perf_counter()
    for k in range(K):
        r = heavy(x, float(k))
        if variant == "async_k":
            r.copy_to_host_async()
        elif variant == "sync_k":
            r = np.asarray(r)
        outs.append(r)
    if variant == "stacked":
        host = np.asarray(jnp.concatenate(outs, axis=0))
    else:
        host = np.concatenate([np.asarray(r) for r in outs], axis=0)
    dt = time.perf_counter() - t0
    return dt, host.sum()


def main():
    print("backend:", jax.default_backend())
    mb = K * ROWS * COLS * 4 / 1e6
    print(f"total result {mb:.2f} MB over {K} launches")
    for variant in ("stacked", "async_k", "sync_k"):
        run(variant)  # warm compile + cache
        times = [run(variant)[0] for _ in range(3)]
        print(f"{variant:8s}  {min(times)*1e3:7.1f} ms (best of 3)")


if __name__ == "__main__":
    main()
