from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from .. import BaseDatabase, FullResult, ScoringMatrix

DB_AXIS: str

SequenceLike = Union[str, bytes, bytearray, memoryview]

def align_arrays_sharded(
    queries: Iterable[SequenceLike],
    database: BaseDatabase,
    *,
    scoring_matrix: Union[ScoringMatrix, str, None] = ...,
    gap_open: int = ...,
    gap_extend: int = ...,
    mode: str = ...,
    algorithm: str = ...,
    start: int = ...,
    end: int = ...,
    mesh: Any = ...,
) -> Dict[str, np.ndarray]: ...
def align_top_k_sharded(
    queries: Iterable[SequenceLike],
    database: BaseDatabase,
    *,
    k: int = ...,
    scoring_matrix: Union[ScoringMatrix, str, None] = ...,
    gap_open: int = ...,
    gap_extend: int = ...,
    algorithm: str = ...,
    start: int = ...,
    end: int = ...,
    mesh: Any = ...,
) -> List[List[FullResult]]: ...
def device_mesh(n_devices: Optional[int] = ...) -> Any: ...
def initialize_distributed(
    coordinator_address: Optional[str] = ...,
    num_processes: Optional[int] = ...,
    process_id: Optional[int] = ...,
) -> None: ...

class ShardedFlat:
    n_targets: int
    n_shards: int
    rows_max: int
    lanes: int
    payloads: Dict[int, np.ndarray]
    inv_shard: np.ndarray
    inv_pos: np.ndarray
    @property
    def local_payload_bytes(self) -> int: ...

def local_shards_of_mesh(mesh: Any) -> Tuple[int, ...]: ...
def pack_flat_sharded(
    sequences: Sequence[np.ndarray],
    n_shards: int,
    lanes: int = ...,
    local_shards: Optional[Iterable[int]] = ...,
) -> ShardedFlat: ...
def sharded_search_flat(
    mesh: Any,
    profs: Any,
    qlens: Any,
    sf: ShardedFlat,
    go: int,
    ge: int,
    algorithm: str,
    with_ends: bool = ...,
    interpret: bool = ...,
    safe_pad: bool = ...,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]: ...
