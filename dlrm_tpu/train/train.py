"""Training step and loop.

The reference's training loop (/root/reference/src/train/train.jl:189-293)
is: Zygote pullback → gather grads → work-stealing dense SGD update →
multithreaded compressed sparse embedding update.  The TPU-native shape of
all of that is ONE jitted train step — forward, backward, dense update, and
sparse scatter-add update fused into a single XLA program with donated
parameter buffers — plus a host-side loop that feeds device-resident batches.

The embedding gradient is computed compressed (d(loss)/d(gathered rows)) via
``sparse_value_and_grad`` and applied as a scatter-add; table gradients are
never densified (reference train.jl:283-290 semantics: per-row contributions
summed, applied once).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.models import dlrm as model_lib
from dlrm_tpu.ops import embedding as emb_ops
from dlrm_tpu.ops.loss import bce_loss


class TrainState(NamedTuple):
    params: dict
    step: jax.Array


def init_train_state(key: jax.Array, config: DLRMConfig) -> TrainState:
    return TrainState(
        params=model_lib.init_params(key, config),
        step=jnp.zeros((), jnp.int32),
    )


def _loss_from_pooled(dense_params, pooled, dense, labels, config):
    out = model_lib.forward_from_pooled(dense_params, pooled, dense, config)
    return bce_loss(out, labels)


def train_step(params: dict, dense: jax.Array, sparse: jax.Array,
               labels: jax.Array, *, config: DLRMConfig, lr: float):
    """One SGD step; returns (new_params, loss).

    Jit with ``static_argnames=('config', 'lr')`` and donate ``params``.
    """
    dense_params, emb = model_lib.split_params(params)
    grad_fn = emb_ops.sparse_value_and_grad(
        functools.partial(_loss_from_pooled, dense=dense, labels=labels,
                          config=config))
    loss, (dgrads, sgrad) = grad_fn(dense_params, emb, sparse,
                                    config.table_offsets)
    with jax.named_scope("dense_update"):
        new_dense = jax.tree.map(
            lambda p, g: (p - lr * g).astype(p.dtype), dense_params, dgrads)
    with jax.named_scope("sparse_update"):
        new_emb = emb_ops.apply_sparse_sgd(emb, sgrad, lr)
    return model_lib.merge_params(new_dense, new_emb), loss


def make_jit_train_step(config: DLRMConfig, lr: float) -> Callable:
    step = functools.partial(train_step, config=config, lr=lr)
    return jax.jit(step, donate_argnums=(0,))


def sharded_train_step(params: dict, dense: jax.Array, sparse: jax.Array,
                       labels: jax.Array, *, config: DLRMConfig, lr: float,
                       mesh, placement, axis: str = "d"):
    """One hybrid-parallel SGD step (the multi-chip path).

    ``params['emb']`` is the (N, local_rows, D) sharded table stack
    (parallel/embedding.shard_tables); dense/sparse/labels are batch-sharded
    over ``axis``.  Embedding exchange is explicit shard_map all-to-all;
    everything else (MLP compute, psum of data-parallel dense grads) is
    GSPMD-automatic from the input shardings.
    """
    from dlrm_tpu.parallel import embedding as pemb  # local import: no cycle

    dense_params = {"bottom": params["bottom"], "top": params["top"]}
    with jax.named_scope("lookup"):
        pooled = pemb.sharded_lookup(params["emb"], sparse, mesh=mesh,
                                     placement=placement, axis=axis)

    def inner(dp, p):
        return _loss_from_pooled(dp, p, dense, labels, config)

    loss, (dgrads, d_pooled) = jax.value_and_grad(
        inner, argnums=(0, 1))(dense_params, pooled)
    with jax.named_scope("dense_update"):
        new_dense = jax.tree.map(
            lambda p, g: (p - lr * g).astype(p.dtype), dense_params, dgrads)
    with jax.named_scope("sparse_update"):
        new_emb = pemb.sharded_update_sgd(
            params["emb"], sparse, d_pooled, lr, mesh=mesh,
            placement=placement, axis=axis)
    new_params = {"bottom": new_dense["bottom"], "emb": new_emb,
                  "top": new_dense["top"]}
    return new_params, loss


def make_sharded_train_step(config: DLRMConfig, lr: float, mesh, placement,
                            axis: str = "d") -> Callable:
    """Jitted hybrid train step with explicit in/out shardings."""
    from dlrm_tpu.parallel.mesh import batch_sharding, param_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = functools.partial(sharded_train_step, config=config, lr=lr,
                             mesh=mesh, placement=placement, axis=axis)
    bs = batch_sharding(mesh, axis)
    repl = NamedSharding(mesh, P())
    pshard = {
        "bottom": None, "top": None,
        "emb": NamedSharding(mesh, P(axis)),
    }

    def shardings_for(params):
        return param_shardings(mesh, params, axis)

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(params, dense, sparse, labels):
        return jitted(params, dense, sparse, labels)

    run.shardings_for = shardings_for
    run.batch_sharding = bs
    return run


def train(params: dict, data: Iterable, *, config: DLRMConfig,
          lr: float, maxiters: Optional[int] = None,
          callback: Optional[Callable[[int, float], None]] = None,
          ) -> Dict[str, Any]:
    """Host loop over batches; the analog of ``train!`` (train.jl:189-240).

    Returns per-iteration wall-clock times (ns) and losses, like the
    reference.  ``data`` yields dicts with keys dense/sparse/labels.
    """
    step_fn = make_jit_train_step(config, lr)
    losses = []
    iteration_times = []
    count = 0
    for batch in data:
        start = time.perf_counter_ns()
        params, loss = step_fn(params, batch["dense"], batch["sparse"],
                               batch["labels"])
        loss = float(loss)  # syncs; per-iteration timing like the reference
        iteration_times.append(time.perf_counter_ns() - start)
        losses.append(loss)
        if callback is not None:
            callback(count, loss)
        count += 1
        if maxiters is not None and count >= maxiters:
            break
    return {"params": params, "losses": losses,
            "iteration_times": iteration_times}
