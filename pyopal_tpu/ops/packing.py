"""Length-bucketed padded device layout for target databases.

The reference kernel chases per-sequence pointers
(``/root/reference/src/pyopal/lib.pxd:95-98``); a TPU kernel instead
wants dense HBM arrays with static shapes.  This module converts a list
of encoded sequences into *blocks*: groups of ``LANES`` length-sorted
targets padded to a shared power-of-two-quantized length, so

- padding waste is bounded (similar-length targets share a block),
- the number of distinct compiled kernel shapes is O(log max_len),
- each block maps one target per VPU lane (the TPU analog of Opal's
  one-sequence-per-SIMD-lane layout, ``README.md:26-28``).

Blocks with the same padded length are stacked into a single 3D array so
one kernel dispatch covers them all.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

#: Number of database sequences processed per block (one per VPU lane).
LANES = 128

#: Column padding quantum — padded lengths are multiples of this.
COL_QUANTUM = 16


def _quantize_length(n: int) -> int:
    """Round ``n`` up to a padded length (pow2-ish buckets, >= 16)."""
    n = max(n, 1)
    q = COL_QUANTUM
    while q < n:
        q *= 2
    return q


@dataclass
class PackedGroup:
    """All blocks sharing one padded target length.

    Attributes:
        targets: ``(n_blocks, t_pad, LANES)`` uint8 encoded symbols
            (padding symbol is 0 — masked out by per-lane lengths).
        lengths: ``(n_blocks, LANES)`` int32 true target lengths
            (0 for padding lanes).
        indices: ``(n_blocks, LANES)`` int32 global target indices
            (-1 for padding lanes).
    """

    t_pad: int
    targets: np.ndarray
    lengths: np.ndarray
    indices: np.ndarray


@dataclass
class PackedDatabase:
    """A database slice packed into padded blocks."""

    n_targets: int
    groups: List[PackedGroup] = field(default_factory=list)

    @property
    def total_cells_padded(self) -> int:
        return sum(
            g.targets.shape[0] * g.t_pad * LANES for g in self.groups
        )

    @property
    def total_cells(self) -> int:
        return int(sum(int(g.lengths.sum()) for g in self.groups))


def pack_sequences(sequences, lanes: int = LANES) -> PackedDatabase:
    """Pack encoded sequences (list of uint8 arrays) into blocks.

    Targets are sorted by length, grouped into blocks of ``lanes``, each
    block padded to the quantized maximum length of its members, and
    blocks of identical padded length are stacked.
    """
    n = len(sequences)
    packed = PackedDatabase(n_targets=n)
    if n == 0:
        return packed

    order = sorted(range(n), key=lambda i: len(sequences[i]))
    by_tpad: Dict[int, list] = {}

    for start in range(0, n, lanes):
        chunk = order[start : start + lanes]
        max_len = max(len(sequences[i]) for i in chunk)
        t_pad = _quantize_length(max_len)
        tgt = np.zeros((t_pad, lanes), dtype=np.uint8)
        lens = np.zeros(lanes, dtype=np.int32)
        idx = np.full(lanes, -1, dtype=np.int32)
        for lane, i in enumerate(chunk):
            seq = sequences[i]
            tgt[: seq.shape[0], lane] = seq
            lens[lane] = seq.shape[0]
            idx[lane] = i
        by_tpad.setdefault(t_pad, []).append((tgt, lens, idx))

    for t_pad in sorted(by_tpad):
        blocks = by_tpad[t_pad]
        packed.groups.append(
            PackedGroup(
                t_pad=t_pad,
                targets=np.stack([b[0] for b in blocks]),
                lengths=np.stack([b[1] for b in blocks]),
                indices=np.stack([b[2] for b in blocks]),
            )
        )
    return packed


def pack_database_slice(database, start: int, end: int) -> PackedDatabase:
    """Pack ``database[start:end]`` (already under the caller's read lock).

    Results are memoized on the database's mutation version when the
    database exposes a ``_pack_cache`` dict (see
    `pyopal_tpu.database.Database`).
    """
    cache = getattr(database, "_pack_cache", None)
    key = (database.get_version(), start, end)
    if cache is not None and key in cache:
        return cache[key]
    seqs = [database.get_encoded(i) for i in range(start, end)]
    packed = pack_sequences(seqs)
    if cache is not None:
        cache[key] = packed
    return packed
