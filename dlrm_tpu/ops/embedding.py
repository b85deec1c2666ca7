"""Embedding lookup with compressed sparse gradients.

Replaces the reference's EmbeddingTables.jl (SIMD gather/scatter kernels,
``maplookup`` strategies, ``SparseEmbeddingUpdate`` compressed gradients,
``SparseIndexer`` dedup — see SURVEY.md §2.2).  The TPU-native design:

* All tables share one embedding dimension (as in the reference) and are
  **stacked row-wise into a single array** ``(total_rows, D)``.  A whole
  batch's lookups across all 26 tables become ONE ``take`` — one fused XLA
  gather instead of 26 small ones.  Per-table ids are translated by static
  row offsets.
* Multi-hot lookups are gathered as ``(B, T, H, D)`` and sum-pooled over H,
  matching EmbeddingTables' pooled lookup (verified bit-exact against
  ref/pytorch_reference_multi.hdf5: sum pooling, ids grouped per-sample).
* Gradients are never densified.  ``sparse_value_and_grad`` splits the
  gather out of the differentiated function, so autodiff produces the
  gradient w.r.t. the *gathered rows* — the exact analog of the reference's
  ``SparseEmbeddingUpdate{(grads, ids)}`` (train/train.jl:283-290) — and the
  optimizer applies it with a scatter-add.
* For plain SGD, scatter-add of per-hit contributions equals dedup-then-apply
  (the ``SparseIndexer`` path, train.jl:276-290): a row hit k times receives
  the summed gradient once.  ``dedup_sparse_grad`` provides explicit
  deduplication for optimizers that need per-unique-row semantics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SparseGrad(NamedTuple):
    """Compressed embedding gradient: ``rows[i]`` is the gradient w.r.t. the
    table row indexed by ``ids[i]`` (into the stacked table).  Duplicate ids
    mean contributions to be summed (scatter-add semantics)."""

    ids: jax.Array  # (n,) int32, indices into the stacked table
    rows: jax.Array  # (n, D)


def translate_ids(ids: jax.Array, offsets) -> jax.Array:
    """Translate per-table ids to stacked-table row indices.

    ``ids``: (..., T) or (..., T, H) int32, 0-based per-table row ids.
    ``offsets``: static per-table row offsets (config.table_offsets).
    """
    offs = jnp.asarray(offsets, dtype=ids.dtype)
    if ids.ndim >= 1 and ids.shape[-1] == len(offsets):
        return ids + offs
    # (..., T, H): broadcast offsets over the hot dimension.
    assert ids.shape[-2] == len(offsets), (ids.shape, len(offsets))
    return ids + offs[:, None]


def gather_rows(emb: jax.Array, flat_ids: jax.Array) -> jax.Array:
    """One fused gather of all lookups: ``(R, D)[ids] -> ids.shape + (D,)``."""
    return jnp.take(emb, flat_ids, axis=0)


def pool(rows: jax.Array) -> jax.Array:
    """Sum-pool the hot dimension: (B, T, H, D) -> (B, T, D); identity for
    one-hot (B, T, D) input."""
    if rows.ndim == 4:
        return jnp.sum(rows, axis=2)
    return rows


def lookup(emb: jax.Array, ids: jax.Array, offsets) -> jax.Array:
    """Full lookup: per-table ids -> pooled per-table embedding vectors.

    Differentiating through this produces a *dense* table gradient; use
    ``sparse_value_and_grad`` in training code.
    """
    return pool(gather_rows(emb, translate_ids(ids, offsets)))


def sparse_value_and_grad(
    loss_fn: Callable, *, has_aux: bool = False
) -> Callable:
    """Like ``jax.value_and_grad`` but with compressed embedding gradients.

    ``loss_fn(dense_params, pooled, *args)`` must consume the pooled lookup
    result ``(B, T, D)``.  The returned function has signature

        f(dense_params, emb, ids, offsets, *args) ->
            (value, (dense_grads, SparseGrad))

    The gather happens *outside* the differentiated region, so autodiff
    computes d(loss)/d(gathered rows) — shape (B, T[, H], D) — which is
    returned compressed as (flat_ids, rows).  This is the TPU-native
    equivalent of Zygote's pullback returning ``SparseEmbeddingUpdate``
    (reference train.jl:220-226, never densified).
    """

    def wrapped(dense_params, emb, ids, offsets, *args):
        flat = translate_ids(ids, offsets)
        rows = gather_rows(emb, flat)

        def inner(dp, r):
            return loss_fn(dp, pool(r), *args)

        out, (dgrads, drows) = jax.value_and_grad(
            inner, argnums=(0, 1), has_aux=has_aux
        )(dense_params, rows)
        sparse = SparseGrad(
            ids=flat.reshape(-1), rows=drows.reshape(-1, drows.shape[-1])
        )
        return out, (dgrads, sparse)

    return wrapped


def apply_sparse_sgd(emb: jax.Array, grad: SparseGrad, lr) -> jax.Array:
    """SGD step on the stacked table: ``emb[ids] -= lr * rows`` with duplicate
    ids accumulating (scatter-add).  Matches the reference's dedup-then-apply
    SGD exactly (sum of per-hit gradients applied once, train.jl:283-290)."""
    return emb.at[grad.ids].add(
        (-lr * grad.rows).astype(emb.dtype), mode="drop"
    )


def dedup_sparse_grad(grad: SparseGrad, *, max_unique: int | None = None
                      ) -> SparseGrad:
    """Combine duplicate ids by summation (the ``SparseIndexer`` analog).

    Returns a SparseGrad with ``max_unique`` entries (default: same length),
    where surplus slots carry id ``-1`` and zero rows (dropped by
    ``.at[].add(mode='drop')``).  Static output shape: sort ids, segment-sum
    runs of equal ids into the position of each run head.
    """
    n = grad.ids.shape[0]
    if max_unique is None:
        max_unique = n
    order = jnp.argsort(grad.ids)
    sids = grad.ids[order]
    srows = grad.rows[order]
    # Run heads: first occurrence of each unique id in the sorted order.
    heads = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sids[1:] != sids[:-1]]
    )
    # Position of each element's run head.
    seg = jnp.cumsum(heads.astype(jnp.int32)) - 1  # (n,), values in [0, n)
    summed = jax.ops.segment_sum(srows, seg, num_segments=max_unique)
    uniq = jax.ops.segment_max(
        jnp.where(heads, sids, -1), seg, num_segments=max_unique
    )
    n_uniq = seg[-1] + 1
    slot = jnp.arange(max_unique)
    uniq = jnp.where(slot < n_uniq, uniq, -1)
    return SparseGrad(ids=uniq, rows=summed)


def partition_tables(table_sizes, threshold: int):
    """Split tables into (small, big) index lists by row count.

    Strategy selection for the mixed embedding engine: on TPU v5e, XLA's
    gather/scatter run at ~22/~105 ns *per row* (latency-bound, measured),
    while a one-hot matmul lookup costs ~4*B*R bytes of HBM traffic — so for
    tables below a few tens of thousands of rows the MXU path wins, sums
    duplicate-id gradients exactly, and needs no scatter at all.  This is
    the TPU analog of the reference's pluggable lookup strategies
    (EmbeddingTables maplookup strategies, SURVEY.md §2.2).
    """
    small = [i for i, s in enumerate(table_sizes) if s <= threshold]
    big = [i for i, s in enumerate(table_sizes) if s > threshold]
    return tuple(small), tuple(big)


def onehot_lookup(table: jax.Array, ids: jax.Array,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Lookup via one-hot matmul on the MXU: (B[,H], R) @ (R, D) -> (B, D).

    Differentiable: the table cotangent is the transpose matmul
    onehot^T @ d_pooled — a DENSE (R, D) gradient, which is fine (and
    faster than scatter) precisely because R is small.  Multi-hot ids sum
    via the matmul itself.
    """
    r = table.shape[0]
    oh = jax.nn.one_hot(ids, r, dtype=compute_dtype)
    if oh.ndim == 3:  # (B, H, R) multi-hot: pool by summing the count matrix
        oh = jnp.sum(oh, axis=1)
    return jnp.dot(oh, table.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def table_order_permutation(small, big) -> Tuple[int, ...]:
    """Permutation restoring global table order from [big..., small...]
    column blocks."""
    order = list(big) + list(small)
    inv = [0] * len(order)
    for pos, t in enumerate(order):
        inv[t] = pos
    return tuple(inv)


def mixed_lookup(emb: jax.Array, ids: jax.Array, config,
                 onehot_dtype=None) -> jax.Array:
    """Pooled lookup using the per-table strategy split: gather for big
    tables (one fused take), one-hot MXU matmul for small ones.
    Differentiable end-to-end (big-table grads densify under plain
    jax.grad — training uses mixed_train machinery in train/train.py to
    keep them compressed)."""
    small, big = partition_tables(config.table_sizes,
                                  config.small_table_threshold)
    if not small:
        return lookup(emb, ids, config.table_offsets)
    if onehot_dtype is None:
        onehot_dtype = config.compute_dtype
    offsets = config.table_offsets
    parts = []
    if big:
        ids_big = ids[:, big] if ids.ndim == 2 else ids[:, big, :]
        off_big = tuple(offsets[t] for t in big)
        parts.append(pool(gather_rows(emb, translate_ids(ids_big, off_big))))
    for t in small:
        tab = emb[offsets[t]:offsets[t] + config.table_sizes[t]]
        idt = ids[:, t] if ids.ndim == 2 else ids[:, t, :]
        parts.append(onehot_lookup(tab, idt, onehot_dtype)[:, None, :])
    stacked = jnp.concatenate(parts, axis=1).astype(emb.dtype)
    return stacked[:, table_order_permutation(small, big), :]


def uncompress(grad: SparseGrad, total_rows: int, dim: int) -> jax.Array:
    """Densify a SparseGrad (test oracle; mirrors EmbeddingTables.uncompress
    used by reference test/train/backprop.jl:156)."""
    dense = jnp.zeros((total_rows, dim), grad.rows.dtype)
    return dense.at[grad.ids].add(grad.rows, mode="drop")
