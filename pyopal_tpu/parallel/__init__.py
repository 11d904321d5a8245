"""Multi-device / multi-host database sharding.

TPU-native replacement for the reference's thread-pool chunking
(``/root/reference/src/pyopal/_align.py:144-172``): the encoded
database is sharded over a 1-D device mesh, query profiles are
replicated, and per-shard results are merged with XLA collectives.
"""

from .api import align_arrays_sharded, align_top_k_sharded
from .mesh import DB_AXIS, device_mesh, initialize_distributed
from .sharded_flat import (
    ShardedFlat,
    local_shards_of_mesh,
    pack_flat_sharded,
    sharded_search_flat,
)

__all__ = [
    "align_arrays_sharded",
    "align_top_k_sharded",
    "DB_AXIS",
    "device_mesh",
    "initialize_distributed",
    "ShardedFlat",
    "local_shards_of_mesh",
    "pack_flat_sharded",
    "sharded_search_flat",
]
