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
