"""Model-parallel embedding lookup & update over a device mesh.

The classic DLRM hybrid (SURVEY.md §2.4/P2): embedding tables are sharded
across devices (each owns whole tables, placed by ``plan_placement``) while
the batch is data-parallel over the SAME devices.  The lookup is a
``shard_map`` with explicit ICI collectives:

    ids (B/N, T)  ──all_gather──►  ids (B, T)  [ints: cheap]
    local gather of owned tables ──► pooled (B, K, D)   [K = slots/shard]
    ──all_to_all (batch-split / slot-concat)──► (B/N, N·K, D)
    static column permutation ──► pooled (B/N, T, D)    [batch-sharded]

and the sparse SGD update routes gradients back with the inverse
``all_to_all`` and applies them with a local scatter-add — embedding
gradients are never densified and never psum'd (the key DLRM win: per-device
comm volume is B·T·D/N instead of the full B·T·D of a data-parallel psum).

The reference's counterpart is shared-memory: EmbeddingTables.jl lookup
strategies + multithreaded compressed update (train.jl:283-290).  There, the
"exchange" was cache coherence; here it is explicit all-to-all riding ICI.

Static-shape discipline: device-dependent metadata (slot→table map, local
row offsets, validity mask) enters the shard_map as (N, K) arrays sharded on
the same axis, so the traced program is SPMD-uniform.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.parallel.placement import TablePlacement


# -- host-side shard/unshard ---------------------------------------------------

def shard_tables(stacked: np.ndarray, placement: TablePlacement,
                 config: DLRMConfig) -> np.ndarray:
    """Re-layout the stacked table into (N, local_rows, D) per-shard stacks
    (trash row zeroed).  Accepts either storage layout — a lane-packed
    (packed_total_rows, 128) stack is unpacked first (the sharded engine
    currently uses the logical layout internally)."""
    from dlrm_tpu.ops import embedding as emb_ops

    if isinstance(stacked, (tuple, list)):
        stacked = emb_ops.unpack_tables(
            tuple(np.asarray(c) for c in stacked), config)
    stacked = np.asarray(stacked)
    n, r = placement.num_shards, placement.local_rows
    d = stacked.shape[1]
    out = np.zeros((n, r, d), dtype=stacked.dtype)
    for t, rows in enumerate(placement.table_sizes):
        shard = placement.table_shard[t]
        lo = placement.table_local_offsets[t]
        go = config.table_offsets[t]
        out[shard, lo:lo + rows] = stacked[go:go + rows]
    return out


def unshard_tables(sharded: np.ndarray, placement: TablePlacement,
                   config: DLRMConfig) -> np.ndarray:
    """Inverse of :func:`shard_tables`."""
    sharded = np.asarray(sharded)
    total = sum(placement.table_sizes)
    out = np.zeros((total, sharded.shape[-1]), dtype=sharded.dtype)
    for t, rows in enumerate(placement.table_sizes):
        shard = placement.table_shard[t]
        lo = placement.table_local_offsets[t]
        go = config.table_offsets[t]
        out[go:go + rows] = sharded[shard, lo:lo + rows]
    return out


def placement_arrays(placement: TablePlacement):
    """Device-dependent metadata as arrays to shard over the table axis."""
    return {
        "slot_tables": jnp.asarray(placement.slot_tables, jnp.int32),
        "slot_valid": jnp.asarray(placement.slot_valid, jnp.int32),
        "slot_offsets": jnp.asarray(placement.slot_local_offsets, jnp.int32),
    }


# -- shard_map bodies ----------------------------------------------------------

def _local_rows_for_slots(ids_all, meta):
    """Per-device local row indices for the slots this shard owns.

    ids_all: (B, T[, H]) global ids, identical on every device.
    Returns (B, K[, H]) local row indices into this shard's stack; padding
    slots resolve to the trash row.
    """
    tbl = meta["slot_tables"][0]      # (K,)
    valid = meta["slot_valid"][0]     # (K,)
    offs = meta["slot_offsets"][0]    # (K,)
    own = jnp.take(ids_all, tbl, axis=1)  # (B, K[, H])
    if own.ndim == 3:
        own = own * valid[None, :, None]
        local = own + offs[None, :, None]
    else:
        own = own * valid[None, :]
        local = own + offs[None, :]
    return local


def _lookup_body(emb, ids, meta, *, axis: str, out_column: np.ndarray):
    """SPMD body: emb (1, R, D), ids (B/N, T[,H]) -> pooled (B/N, T, D)."""
    ids_all = jax.lax.all_gather(ids, axis, axis=0, tiled=True)
    local = _local_rows_for_slots(ids_all, meta)
    rows = jnp.take(emb[0], local, axis=0)   # (B, K[, H], D)
    if rows.ndim == 4:
        with jax.named_scope("pool"):
            rows = jnp.sum(rows, axis=2)     # pool before the exchange
    with jax.named_scope("a2a_fwd"):
        ex = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=1,
                                tiled=True)  # (B/N, N*K, D)
    return jnp.take(ex, jnp.asarray(out_column), axis=1)  # (B/N, T, D)


def _update_body(emb, ids, d_pooled, lr, meta, *, axis: str,
                 out_column: np.ndarray, num_slots: int):
    """SPMD body of the sparse SGD update.

    emb (1, R, D), ids (B/N, T[,H]), d_pooled (B/N, T, D) -> new emb.
    """
    b_local = d_pooled.shape[0]
    dim = d_pooled.shape[-1]
    scat = jnp.zeros((b_local, num_slots, dim), d_pooled.dtype)
    scat = scat.at[:, jnp.asarray(out_column), :].set(d_pooled)
    with jax.named_scope("a2a_bwd"):
        back = jax.lax.all_to_all(scat, axis, split_axis=1, concat_axis=0,
                                  tiled=True)  # (B, K, D)
    ids_all = jax.lax.all_gather(ids, axis, axis=0, tiled=True)
    local = _local_rows_for_slots(ids_all, meta)  # (B, K[, H])
    if local.ndim == 3:
        # sum-pooled multi-hot: every hot row receives the pooled gradient
        back = jnp.broadcast_to(back[:, :, None, :],
                                local.shape + (dim,))
    upd = (-lr * back).astype(emb.dtype)
    new = emb[0].at[local.reshape(-1)].add(
        upd.reshape(-1, dim), mode="drop")
    return new[None]


# -- public API ----------------------------------------------------------------

def sharded_lookup(emb: jax.Array, ids: jax.Array, *, mesh: Mesh,
                   placement: TablePlacement, axis: str = "d") -> jax.Array:
    """Pooled lookup: emb (N, R, D) sharded on ``axis``; ids (B, T[,H])
    batch-sharded on ``axis``.  Returns (B, T, D) batch-sharded."""
    meta = placement_arrays(placement)
    body = functools.partial(_lookup_body, axis=axis,
                             out_column=placement.out_column())
    id_spec = P(axis) if ids.ndim >= 2 else P(axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), id_spec, {k: P(axis) for k in meta}),
        out_specs=P(axis),
    )(emb, ids, meta)


def sharded_update_sgd(emb: jax.Array, ids: jax.Array, d_pooled: jax.Array,
                       lr, *, mesh: Mesh, placement: TablePlacement,
                       axis: str = "d") -> jax.Array:
    """Apply the compressed embedding gradient (d loss / d pooled, shape
    (B, T, D) batch-sharded) to the sharded tables with SGD."""
    meta = placement_arrays(placement)
    body = functools.partial(
        _update_body, axis=axis, out_column=placement.out_column(),
        num_slots=placement.num_shards * placement.slots_per_shard)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(),
                  {k: P(axis) for k in meta}),
        out_specs=P(axis),
    )(emb, ids, d_pooled, jnp.asarray(lr, jnp.float32), meta)
