"""Sharded database search over a device mesh (``shard_map``).

Design (SURVEY.md section 5, "distributed communication backend"):

- the packed target blocks are sharded along the block axis over the
  ``"db"`` mesh axis (each device holds a contiguous run of blocks in
  its local HBM);
- the query profile is replicated (it is tiny: ``Q_pad x 32`` bf16);
- each device runs the single-chip engine (Pallas kernel on TPU, the
  vectorized XLA engine elsewhere) over its local blocks — zero
  communication in the hot loop;
- per-shard score/end arrays are reassembled by the output sharding
  (an all-gather of ``n_targets`` int32 triples — negligible bytes),
  preserving the global ``target_index`` invariant of the reference
  (``pyx.in:67-69``).

Multi-host extension: ``jax.distributed.initialize`` + the same mesh
spanning all hosts; each host feeds its process-local shard of the
packed database, which is exactly how `pack_sequences` blocks are laid
out.  A global top-k merge (`top_k_merge`) avoids gathering full score
arrays for very large databases.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import xla
from .mesh import DB_AXIS


def _local_search(prof_t, targets, lengths, go, ge, algorithm, use_pallas, with_ends):
    """Per-device search over the local stack of blocks."""
    if use_pallas:
        from ..ops import pallas_kernel as pk

        # prof_t here is the (profile, Q) pair packed as bf16 profile +
        # static Q threaded by the caller
        prof, Q = prof_t
        return pk._search_group_impl(
            prof, targets, lengths, go, ge, algorithm, Q, with_ends
        )
    fn = jax.vmap(
        lambda t, l: xla.search_block(prof_t, t, l, go, ge, algorithm)
    )
    return fn(targets, lengths)


def pad_blocks(targets: np.ndarray, lengths: np.ndarray, n_devices: int):
    """Pad the block axis to a multiple of ``n_devices``.

    Padding blocks have length 0 in every lane, so they contribute no
    results (their packed indices are absent).
    """
    nblk = targets.shape[0]
    pad = (-nblk) % n_devices
    if pad:
        targets = np.concatenate(
            [targets, np.zeros((pad,) + targets.shape[1:], targets.dtype)]
        )
        lengths = np.concatenate(
            [lengths, np.zeros((pad,) + lengths.shape[1:], lengths.dtype)]
        )
    return targets, lengths


def sharded_search_group(
    mesh,
    prof,
    targets,
    lengths,
    go: int,
    ge: int,
    algorithm: str,
    with_ends: bool = True,
    use_pallas: bool | None = None,
):
    """Search one packed group with blocks sharded over ``mesh``.

    ``targets``: ``(n_blocks, t_pad, lanes)`` with ``n_blocks`` a
    multiple of the mesh size (see `pad_blocks`).  Returns
    ``(scores, query_ends, target_ends)`` of shape
    ``(n_blocks, lanes)``, fully addressable.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    # stable callable identity: shard_map compilations cache on the
    # function object, so the wrapper must not be rebuilt per call
    # (see sharded_flat._flat_fn); the 2-D profile array is passed as
    # a replicated argument, the static query length (pallas variant)
    # through the cache key
    if use_pallas:
        prof_arr, Q = prof
    else:
        prof_arr, Q = prof, -1
    sharded = _group_fn(
        mesh, int(go), int(ge), algorithm, bool(use_pallas),
        bool(with_ends), int(Q),
    )
    t_sharding = NamedSharding(mesh, P(DB_AXIS, None, None))
    l_sharding = NamedSharding(mesh, P(DB_AXIS, None))
    targets = jax.device_put(jnp.asarray(targets), t_sharding)
    lengths = jax.device_put(jnp.asarray(lengths), l_sharding)
    return sharded(prof_arr, targets, lengths)


@lru_cache(maxsize=256)
def _group_fn(mesh, go, ge, algorithm, use_pallas, with_ends, Q):
    fn = partial(
        _local_search,
        go=go,
        ge=ge,
        algorithm=algorithm,
        use_pallas=use_pallas,
        with_ends=with_ends,
    )

    def local(prof_arr, t, l):
        prof_t = (prof_arr, Q) if use_pallas else prof_arr
        return fn(prof_t, t, l)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None), P(DB_AXIS, None, None), P(DB_AXIS, None)
            ),
            out_specs=(
                P(DB_AXIS, None), P(DB_AXIS, None), P(DB_AXIS, None)
            ),
            check_vma=False,
        )
    )


def top_k_merge(mesh, scores, indices, k: int):
    """Global top-k hits from sharded per-target scores.

    ``scores``/``indices``: ``(n,)`` arrays sharded over ``DB_AXIS``.
    Per-shard top-k runs locally, then the tiny candidate set is
    all-gathered and reduced — the communication volume is
    ``O(k * n_devices)`` instead of ``O(n_targets)``.
    """

    fn = _topk_merge_fn(mesh, int(k))
    s_shard = NamedSharding(mesh, P(DB_AXIS))
    scores = jax.device_put(jnp.asarray(scores), s_shard)
    indices = jax.device_put(jnp.asarray(indices), s_shard)
    return fn(scores, indices)


@lru_cache(maxsize=256)
def _topk_merge_fn(mesh, k):
    def local_topk(s, i):
        kk = min(k, s.shape[0])
        v, pos = jax.lax.top_k(s, kk)
        cand_i = i[pos]
        v = jax.lax.all_gather(v, DB_AXIS, tiled=True)
        cand_i = jax.lax.all_gather(cand_i, DB_AXIS, tiled=True)
        vv, p2 = jax.lax.top_k(v, min(k, v.shape[0]))
        return vv, cand_i[p2]

    return jax.jit(
        shard_map(
            local_topk,
            mesh=mesh,
            in_specs=(P(DB_AXIS), P(DB_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
