"""Sharded ragged search: the flat single-launch kernel over a mesh.

Production multi-chip path: the length-sorted blocks of the flat layout
(`pyopal_tpu.ops.packing.pack_sequences_flat`) are dealt round-robin to
mesh shards (balanced because blocks are length-sorted), each shard is
padded to common shapes, and one ``shard_map`` launch runs the ragged
Pallas kernel on every device's local shard — zero communication in the
hot loop, profile replicated, per-shard outputs reassembled to global
target order by a host-precomputed gather permutation.

Multi-host: the same code runs under ``jax.distributed.initialize``
with a mesh spanning hosts; each host materializes only its
process-local shards of the stacked arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import packing
from .mesh import DB_AXIS

LANES = 128


@dataclass
class ShardedFlat:
    """Flat-packed database distributed over ``n_shards``.

    All per-shard arrays are stacked on a leading shard axis and padded
    to common shapes; ``inv_shard``/``inv_pos`` map each global target
    index to (shard, block*LANES+lane).
    """

    n_targets: int
    n_shards: int
    flat_targets: np.ndarray  # (n_shards, rows_max, LANES) int32
    lengths: np.ndarray  # (n_shards, nblk_max, 1, LANES) int32
    block_of_step: np.ndarray  # (n_shards, steps_max) int32
    chunk_of_step: np.ndarray  # (n_shards, steps_max) int32
    last_of_step: np.ndarray  # (n_shards, steps_max) int32
    inv_shard: np.ndarray  # (n_targets,) int32
    inv_pos: np.ndarray  # (n_targets,) int32
    chunk: int = 64  # column-chunk quantum of the per-shard layouts


def pack_flat_sharded(
    sequences, n_shards: int, lanes: int = LANES
) -> ShardedFlat:
    """Distribute encoded sequences over ``n_shards`` flat layouts.

    ``lanes`` selects the per-shard block width (128 for the
    row-vectorized ragged kernels, 512/256 for the query-packed q8
    kernel — see `pyopal_tpu.ops.pallas_q8`).
    """
    n = len(sequences)
    order = sorted(range(n), key=lambda i: len(sequences[i]))
    # deal length-sorted blocks round-robin for load balance
    shard_ids: List[List[int]] = [[] for _ in range(n_shards)]
    for b, start in enumerate(range(0, n, lanes)):
        shard_ids[b % n_shards].extend(order[start : start + lanes])

    packs = [
        packing.pack_sequences_flat([sequences[i] for i in ids], lanes=lanes)
        for ids in shard_ids
    ]

    rows_max = max(max(p.flat_targets.shape[0] for p in packs), 128)
    nblk_max = max(max(p.n_blocks for p in packs), 1)
    steps_max = max(max(p.block_of_step.shape[0] for p in packs), 1)

    flat = np.zeros((n_shards, rows_max, lanes), np.int32)
    lengths = np.zeros((n_shards, nblk_max, 1, lanes), np.int32)
    bos = np.zeros((n_shards, steps_max), np.int32)
    cos = np.zeros((n_shards, steps_max), np.int32)
    los = np.ones((n_shards, steps_max), np.int32)
    inv_shard = np.zeros(n, np.int32)
    inv_pos = np.zeros(n, np.int32)

    for s, (p, ids) in enumerate(zip(packs, shard_ids)):
        r = p.flat_targets.shape[0]
        flat[s, :r] = p.flat_targets
        lengths[s, : p.n_blocks] = p.lengths
        k = p.block_of_step.shape[0]
        bos[s, :k] = p.block_of_step
        cos[s, :k] = p.chunk_of_step
        los[s, :k] = p.last_of_step
        # padding steps: point at the last block, flagged "last" with
        # chunk 0 so they only re-run an idle init/finalize on zero
        # lengths (indices of that block are unaffected: finalize
        # rewrites the same values)
        if k < steps_max:
            bos[s, k:] = p.block_of_step[-1] if k else 0
            cos[s, k:] = 0
            los[s, k:] = 0
        # local->global index map
        for local_i, global_i in enumerate(ids):
            inv_shard[global_i] = s
            inv_pos[global_i] = p.inv_pos[local_i]
    return ShardedFlat(
        n,
        n_shards,
        flat,
        lengths,
        bos,
        cos,
        los,
        inv_shard,
        inv_pos,
        chunk=packs[0].chunk if packs else 64,
    )



def _device_arrays(sf: ShardedFlat, mesh):
    """Mesh-sharded device copies of a pack's arrays, cached on the
    object (the mesh analog of ``engine._flat_device``): repeat
    searches against an unchanged database must not re-cross the host
    link with the full packed payload on every call."""
    cache = getattr(sf, "_dev", None)
    if cache is None:
        cache = {}
        sf._dev = cache
    key = (tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat))
    hit = cache.get(key)
    if hit is None:

        def put(x, spec):
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

        hit = (
            put(sf.flat_targets, P(DB_AXIS, None, None)),
            put(sf.lengths, P(DB_AXIS, None, None, None)),
            put(sf.block_of_step, P(DB_AXIS, None)),
            put(sf.chunk_of_step, P(DB_AXIS, None)),
            put(sf.last_of_step, P(DB_AXIS, None)),
        )
        cache.clear()  # one mesh at a time; avoid pinning stale HBM
        cache[key] = hit
    return hit


def sharded_search_flat(
    mesh,
    profs,
    qlens,
    sf: ShardedFlat,
    go: int,
    ge: int,
    algorithm: str,
    with_ends: bool = True,
    interpret: bool = False,
    safe_pad: bool = False,
):
    """One ``shard_map`` launch of the ragged kernel over the mesh.

    Pass ``safe_pad=True`` when the scoring matrix leaves profile
    column 31 unused (every bundled matrix) to engage the unified v2
    strip kernel on each shard.  Returns ``(scores, q_ends, t_ends)``
    numpy arrays of shape ``(n_q, n_targets)`` in global target order.
    """
    from ..ops import pallas_ragged as pr

    n_q = profs.shape[0]
    nblk_max = sf.lengths.shape[1]

    def local(profs, qlens, flat_t, lengths, bos, cos, los):
        s, qe, te = pr.search_flat(
            profs,
            qlens,
            flat_t[0],
            lengths[0],
            bos[0],
            cos[0],
            los[0],
            int(go),
            int(ge),
            algorithm,
            with_ends,
            interpret=interpret,
            # the kernel's column-chunk size MUST match the packing
            # quantum: block row offsets are step_index * chunk
            chunk=sf.chunk,
            safe_pad=safe_pad,
        )
        return s[None], qe[None], te[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None),
            P(None),
            P(DB_AXIS, None, None),
            P(DB_AXIS, None, None, None),
            P(DB_AXIS, None),
            P(DB_AXIS, None),
            P(DB_AXIS, None),
        ),
        out_specs=(
            P(DB_AXIS, None, None, None),
            P(DB_AXIS, None, None, None),
            P(DB_AXIS, None, None, None),
        ),
        check_vma=False,
    )

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    flat_t, lengths, bos, cos, los = _device_arrays(sf, mesh)
    profs_r = put(profs, P(None, None, None))
    qlens_r = put(qlens, P(None))

    s, qe, te = fn(profs_r, qlens_r, flat_t, lengths, bos, cos, los)
    # (n_shards, n_q, nblk_max, lanes) -> global target order; one
    # gathered readback for all three planes (separate np.asarray
    # calls pay the host-link base RTT three times).  The lane width
    # comes from the pack itself (q8 packs are 256/512 wide).
    stacked = np.asarray(jnp.stack([s, qe, te], axis=0))
    lanes = sf.flat_targets.shape[2]
    flatpos = sf.inv_shard * (nblk_max * lanes) + sf.inv_pos
    out = stacked.transpose(0, 2, 1, 3, 4).reshape(3, n_q, -1)[
        :, :, flatpos
    ]
    return out[0], out[1], out[2]


def sharded_search_flat_q8(
    mesh,
    profs,
    qv,
    maxq,
    sf: ShardedFlat,
    go: int,
    ge: int,
    algorithm: str,
    with_ends: bool = True,
    interpret: bool = False,
):
    """One ``shard_map`` launch of the query-packed q8 kernel.

    The batch fast path over a mesh: ``sf`` must be packed at the q8
    lane width (`pack_flat_sharded(..., lanes=512)` for tiers <= 256),
    ``profs``/``qv``/``maxq`` come from
    `pyopal_tpu.ops.pallas_q8.make_profiles_q8_host` and are replicated;
    the database shards ride the ``"db"`` axis with zero communication
    in the hot loop (merge happens host-side by gather permutation,
    exactly as `sharded_search_flat`).  Returns ``(scores, q_ends,
    t_ends)`` of shape ``(n_groups * QB, n_targets)`` in global target
    order, row ``g * QB + qb`` = group g's qb-th query slot.
    """
    from ..ops import pallas_q8 as q8

    n_g = profs.shape[0]
    nblk_max = sf.lengths.shape[1]
    lanes = sf.flat_targets.shape[2]

    def local(profs, qv, maxq, flat_t, lengths, bos, cos, los):
        s, qe, te = q8.search_flat_q8(
            profs,
            qv,
            maxq,
            flat_t[0],
            lengths[0],
            bos[0],
            cos[0],
            los[0],
            int(go),
            int(ge),
            algorithm,
            with_ends,
            interpret=interpret,
            chunk=sf.chunk,
        )
        return s[None], qe[None], te[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None),
            P(None, None, None),
            P(None),
            P(DB_AXIS, None, None),
            P(DB_AXIS, None, None, None),
            P(DB_AXIS, None),
            P(DB_AXIS, None),
            P(DB_AXIS, None),
        ),
        out_specs=(
            P(DB_AXIS, None, None, None, None),
            P(DB_AXIS, None, None, None, None),
            P(DB_AXIS, None, None, None, None),
        ),
        check_vma=False,
    )

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    flat_t, lengths, bos, cos, los = _device_arrays(sf, mesh)
    profs_r = put(profs, P(None, None, None))
    qv_r = put(qv, P(None, None, None))
    maxq_r = put(maxq, P(None))

    s, qe, te = fn(profs_r, qv_r, maxq_r, flat_t, lengths, bos, cos, los)
    # (n_shards, n_g, nblk_max, QB, lanes) -> (n_g*QB, global target);
    # one gathered readback for all three planes
    stacked = np.asarray(jnp.stack([s, qe, te], axis=0))
    flatpos = sf.inv_shard * (nblk_max * lanes) + sf.inv_pos
    out = stacked.transpose(0, 2, 4, 1, 3, 5).reshape(
        3, n_g * q8.QB, -1
    )[:, :, flatpos]
    return out[0], out[1], out[2]
