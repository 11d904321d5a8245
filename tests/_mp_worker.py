"""Worker for the two-process sharded-search test.

Run as ``python _mp_worker.py <process_id> <port> <out_path>`` twice
(process_id 0 and 1).  Each process owns 2 virtual CPU devices of a
4-device global mesh.  Asserts, inside the worker:

- `align_arrays_sharded` over the 2-process mesh returns exactly the
  single-device engine's scores/ends (chunking never changes results,
  the reference's thread-pool invariant);
- the packed payload this process materialized covers only its own
  mesh shards (per-host memory O(database / n_hosts)).

Writes ``OK <local_bytes> <total_bytes>`` to ``out_path`` on success.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    out_path = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "PYOPAL_TPU_TEST_JAX_CACHE", "/tmp/pyopal_tpu_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pyopal_tpu.parallel import initialize_distributed

    initialize_distributed(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import random

    import numpy as np

    import pyopal_tpu as po
    from pyopal_tpu.parallel import align_arrays_sharded, device_mesh
    from pyopal_tpu.parallel import sharded_flat as sfm

    r = random.Random(42)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    targets = [
        "".join(r.choices(alphabet, k=r.randint(5, 120)))
        for _ in range(300)
    ]
    queries = [
        "".join(r.choices(alphabet, k=50)) for _ in range(3)
    ]

    db = po.Database(targets)
    mesh = device_mesh()

    # route 1 (CPU default): the int32-XLA-per-shard mesh route, incl.
    # its cross-process host gather
    got = align_arrays_sharded(queries, db, mode="end", algorithm="sw")

    # oracle: the single-device engine on this process's local backend
    aligner = po.Aligner()
    want = aligner.align_arrays(queries, db, mode="end", algorithm="sw")
    for k in ("scores", "query_ends", "target_ends"):
        if not np.array_equal(got[k], want[k]):
            raise AssertionError(f"{k} mismatch on process {pid}")

    # route 2: the Pallas flat-sharded path (interpret kernels on CPU)
    # with process-local packed payloads — forced via the test hook
    from pyopal_tpu.ops import engine

    engine._INTERPRET = True
    try:
        got = align_arrays_sharded(
            queries, db, mode="end", algorithm="sw"
        )
        for k in ("scores", "query_ends", "target_ends"):
            if not np.array_equal(got[k], want[k]):
                raise AssertionError(
                    f"pallas-route {k} mismatch on process {pid}"
                )

        # the O(k)-communication top-k pipeline under a real 2-process
        # mesh: candidates cross hosts via the all-gather collective
        from pyopal_tpu.parallel import align_top_k_sharded

        top_got = align_top_k_sharded([queries[0]], db, k=7)[0]
        top_want = aligner.align_top_k(queries[0], db, k=7)
        if top_got != top_want:
            raise AssertionError(f"top-k mismatch on process {pid}")
    finally:
        engine._INTERPRET = False

    # process-locality: the cached pack holds payloads only for this
    # process's shards, i.e. about half the database
    local = set(sfm.local_shards_of_mesh(mesh))
    packs = [
        v
        for v in db._pack_cache.values()
        if isinstance(v, sfm.ShardedFlat)
    ]
    assert packs, "no sharded pack was cached"
    local_bytes = 0
    total_bytes = 0
    for sf in packs:
        assert set(sf.payloads) == local, (
            f"process {pid} materialized shards "
            f"{sorted(sf.payloads)} != local {sorted(local)}"
        )
        local_bytes += sf.local_payload_bytes
        total_bytes += sf.rows_max * sf.lanes * sf.n_shards
    assert local_bytes * 2 <= total_bytes, (
        local_bytes,
        total_bytes,
    )

    with open(out_path, "w") as f:
        f.write(f"OK {local_bytes} {total_bytes}\n")


if __name__ == "__main__":
    main()
