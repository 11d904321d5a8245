"""Sweep the v2 kernel's strip height / unroll on the real TPU.

Bench-like workload (12k-seq DB, 256-aa queries, sw) plus end-mode and
hw score, A/B in one process (remote-compile timings vary run to run;
see DEVNOTES.md).  Usage:  PYTHONPATH=/root/repo python -u
experiments/bench_v2_sweep.py [n_seqs]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pyopal_tpu.matrices import ScoringMatrix
from pyopal_tpu.ops import packing, pallas_ragged as pr
from pyopal_tpu.utils import cache

cache.enable()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12071
rng = np.random.default_rng(12071)
lengths = np.clip(
    rng.lognormal(np.log(350), 0.45, N).astype(int), 30, 4000
)
seqs = [rng.integers(0, 20, L).astype(np.uint8) for L in lengths]
total = int(sum(lengths))
NQ = 32
queries = [rng.integers(0, 20, 256).astype(np.uint8) for _ in range(NQ)]

S = ScoringMatrix.from_name("BLOSUM50").int_data()
fp = packing.pack_sequences_flat(seqs)
flat_t = jnp.asarray(fp.flat_targets)
lens = jnp.asarray(fp.lengths)
bos = jnp.asarray(fp.block_of_step)
cos = jnp.asarray(fp.chunk_of_step)
los = jnp.asarray(fp.last_of_step)
profs = jnp.asarray(pr.make_profiles_host(queries, S), jnp.bfloat16)
qlens = jnp.asarray([len(q) for q in queries], jnp.int32)

cells = 256 * total * NQ
print(f"db residues {total}, cells/dispatch {cells/1e9:.1f} G", flush=True)


def run(algo, with_ends, strip, unroll, trials=3):
    def once():
        s, qe, te = pr.search_flat(
            profs, qlens, flat_t, lens, bos, cos, los,
            3, 1, algo, with_ends,
            chunk=fp.chunk, unroll=unroll, safe_pad=True, strip=strip,
        )
        return np.asarray(s)  # host readback = the only reliable sync

    t0 = time.perf_counter()
    ref = once()  # compile + warm
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        once()
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(
        f"{algo} ends={int(with_ends)} strip={strip:4d} unroll={unroll:2d}"
        f"  {dt*1e3:7.1f} ms  {cells/dt/1e9:7.1f} GCUPS"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )
    return ref, dt


baseline = None
for strip in (256, 64, 32, 16):
    ref, dt = run("sw", False, strip, 8)
    if baseline is None:
        baseline = ref
    else:
        assert np.array_equal(ref, baseline), f"strip={strip} mismatch"

# unroll interaction at the best strips
for strip in (32, 64):
    for unroll in (4, 16):
        ref, _ = run("sw", False, strip, unroll)
        assert np.array_equal(ref, baseline), (strip, unroll)

# end mode (previously ~4x slower than score)
for strip in (256, 32):
    run("sw", True, strip, 8)

# hw score (previously per-column masked reductions)
run("hw", False, 32, 8)
print("DONE", flush=True)
