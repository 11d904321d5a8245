"""Probe: repeat align_top_k_sharded calls must NOT recompile.

Times 4 consecutive calls after a warm call on a small database; with
the jit-wrapped memoized shard_map wrappers every post-warm call
should be ~device-pace milliseconds, not remote-compile seconds.
"""

import time

import numpy as np


def main():
    from pyopal_tpu.utils import cache

    cache.enable()
    import pyopal_tpu as po
    from pyopal_tpu.parallel import align_top_k_sharded

    rng = np.random.default_rng(2)
    letters = "ARNDCQEGHILKMFPSTWYV"
    seqs = [
        "".join(letters[c] for c in rng.integers(0, 20, int(L)))
        for L in rng.integers(20, 300, 2000)
    ]
    db = po.Database(seqs)
    q = "".join(letters[c] for c in rng.integers(0, 20, 200))

    t0 = time.perf_counter()
    out = align_top_k_sharded([q], db, k=50)[0]
    print(f"warm call: {time.perf_counter() - t0:.2f} s, {len(out)} hits")
    for i in range(4):
        t0 = time.perf_counter()
        align_top_k_sharded([q], db, k=50)
        print(f"call {i}: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    want = po.Aligner().align_top_k(q, db, k=50)
    assert out == want, "sharded != single-device"
    print("equality OK")


if __name__ == "__main__":
    main()
