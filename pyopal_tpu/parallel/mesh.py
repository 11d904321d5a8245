"""Device mesh helpers for sharded database search.

The reference's only parallel axis is database chunking over a thread
pool (``/root/reference/src/pyopal/_align.py:144-172``).  The TPU
analog is a 1-D device mesh with a single ``"db"`` axis: the encoded
database blocks are sharded across devices, the query profile is
replicated, and per-shard score arrays are gathered — the collectives
ride ICI inside a slice (SURVEY.md section 2, parallelism table).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

DB_AXIS = "db"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX for cross-host database sharding.

    Thin wrapper over `jax.distributed.initialize` (auto-detecting on
    TPU pods when called with no arguments).  After this,
    `device_mesh()` spans every chip in the pod, `pack_flat_sharded`
    distributes database blocks (LPT-balanced) across all of them, and
    the ``shard_map`` search + top-k merge collectives in
    `pyopal_tpu.parallel.sharded_flat` ride ICI within a slice and DCN
    across slices — the multi-host analog of the reference's
    thread-pool chunking (``_align.py:144-172``), with the same
    invariant: chunking never changes scores and ``target_index``
    stays global.

    Call once per process, before any other JAX API.  No-op if the
    distributed runtime is already initialized.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def device_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all) with axis ``"db"``."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DB_AXIS,))
