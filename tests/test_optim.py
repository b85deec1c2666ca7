"""Optimizer tests: the pluggable-optimizer step vs oracles.

- sgd: train_step_opt must equal the fast SGD step bit-for-bit.
- adagrad: the sparse chunked Adagrad (dedup + accumulator in table
  storage) must match optax.adagrad applied to a DENSE table gradient —
  including duplicate ids, whose contributions must be summed before the
  nonlinear accumulator update (the reference's dedup-then-apply contract).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import dlrm_tpu
from dlrm_tpu.data import synthetic
from dlrm_tpu.models import dlrm as model_lib
from dlrm_tpu.ops import embedding as emb_ops
from dlrm_tpu.ops.loss import bce_loss
from dlrm_tpu.train.train import (init_opt_state, make_jit_train_step,
                                  make_jit_train_step_opt)


def _setup(n_hot=1, seed=0):
    c = dlrm_tpu.tiny_config(num_tables=5, rows=32, feature_size=8,
                             n_hot=n_hot)
    c = dataclasses.replace(c, table_sizes=(33, 7, 64, 129, 40),
                            chunk_budget_bytes=4096,
                            small_table_threshold=16)
    params = dlrm_tpu.init_params(jax.random.key(seed), c)
    rng = np.random.default_rng(seed)
    batch = synthetic.random_batch(rng, c, 64)
    # force duplicate ids (same row twice) — the adagrad-critical case
    sparse = np.asarray(batch["sparse"]).copy()
    sparse[1] = sparse[0]
    sparse[2] = sparse[0]
    batch["sparse"] = sparse
    args = (jnp.asarray(batch["dense"]), jnp.asarray(batch["sparse"]),
            jnp.asarray(batch["labels"]))
    return c, params, args


def _logical(emb, c):
    return emb_ops.unpack_tables(jax.tree.map(np.asarray, emb), c)


def test_sgd_opt_step_matches_fast_path():
    c, params, args = _setup()
    p2 = jax.tree.map(jnp.copy, params)
    fast = make_jit_train_step(c, 0.1)
    want_params, want_loss = fast(params, *args)

    step = make_jit_train_step_opt(c, optimizer="sgd", lr=0.1)
    opt_state = init_opt_state(p2, config=c, optimizer="sgd", lr=0.1)
    (got_params, _), got_loss = step(p2, opt_state, *args)
    np.testing.assert_allclose(float(got_loss), float(want_loss), atol=1e-7)
    np.testing.assert_allclose(_logical(got_params["emb"], c),
                               _logical(want_params["emb"], c), atol=1e-6)
    for side in ("bottom", "top"):
        for a, b in zip(got_params[side], want_params[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=1e-6)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_adagrad_matches_dense_oracle(n_hot):
    c, params, args = _setup(n_hot=n_hot)
    dense, sparse, labels = args
    lr = 0.3

    # --- oracle: optax.adagrad on (dense params + dense logical table) ---
    logical0 = jnp.asarray(_logical(params["emb"], c))
    cp = dataclasses.replace(c, packed_tables=False)
    oracle_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": logical0,
        "top": jax.tree.map(jnp.copy, params["top"]),
    }

    def loss_fn(p):
        out = model_lib.forward(p, dense, sparse, cp)
        return bce_loss(out, labels)

    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    opt = tx.init(oracle_params)
    for _ in range(3):  # several steps: accumulator state must persist
        grads = jax.grad(loss_fn)(oracle_params)
        updates, opt = tx.update(grads, opt, oracle_params)
        oracle_params = optax.apply_updates(oracle_params, updates)

    # --- ours: chunked sparse adagrad ---
    step = make_jit_train_step_opt(c, optimizer="adagrad", lr=lr)
    opt_state = init_opt_state(params, config=c, optimizer="adagrad", lr=lr)
    state = (jax.tree.map(jnp.copy, params), opt_state)
    for _ in range(3):
        state, loss = step(state[0], state[1], *args)

    got_params = state[0]
    np.testing.assert_allclose(_logical(got_params["emb"], c),
                               np.asarray(oracle_params["emb"]),
                               atol=5e-5, rtol=5e-5)
    for side in ("bottom", "top"):
        for a, b in zip(got_params[side], oracle_params[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=5e-5, rtol=5e-5)


def test_adagrad_trains():
    """Loss decreases on learnable synthetic data under adagrad."""
    c = dlrm_tpu.tiny_config(num_tables=4, rows=64, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(0), c)
    step = make_jit_train_step_opt(c, optimizer="adagrad", lr=0.05)
    opt_state = init_opt_state(params, config=c, optimizer="adagrad",
                               lr=0.05)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(60):
        b = 256
        dns = rng.normal(size=(b, 13)).astype(np.float32)
        sp = rng.integers(0, 64, size=(b, 4)).astype(np.int32)
        lbl = ((sp[:, 0] % 2) * 2.0 - 1.0 + dns[:, 0]
               + rng.normal(size=b) > 0).astype(np.float32)
        (params, opt_state), loss = step(
            params, opt_state, jnp.asarray(dns), jnp.asarray(sp),
            jnp.asarray(lbl))
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.03


def test_lr_schedule_warmup_decay():
    from dlrm_tpu.train.optim import make_schedule

    sched = make_schedule(1.0, schedule="warmup_poly_decay",
                          warmup_steps=10, decay_start=20, decay_steps=10,
                          end_lr_scale=0.0)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 1.0, atol=1e-6)
    assert float(sched(25)) < 1.0
    np.testing.assert_allclose(float(sched(30)), 0.0, atol=1e-6)


def test_scheduled_sgd_step_matches_manual():
    """make_jit_train_step with a schedule applies schedule(step) each call."""
    from dlrm_tpu.train.optim import make_schedule

    c = dlrm_tpu.tiny_config()
    params = dlrm_tpu.init_params(jax.random.key(0), c)
    rng = np.random.default_rng(0)
    batch = synthetic.random_batch(rng, c, 16)
    args = (jnp.asarray(batch["dense"]), jnp.asarray(batch["sparse"]),
            jnp.asarray(batch["labels"]))

    sched = make_schedule(0.5, schedule="warmup_poly_decay",
                          warmup_steps=2, decay_start=2, decay_steps=10)
    step_s = dlrm_tpu.make_jit_train_step(c, sched)
    p1 = jax.tree.map(jnp.copy, params)
    for _ in range(3):
        p1, _ = step_s(p1, *args)

    p2 = jax.tree.map(jnp.copy, params)
    for i in range(3):
        fixed = dlrm_tpu.make_jit_train_step(c, float(sched(i)))
        p2, _ = fixed(p2, *args)
    np.testing.assert_allclose(
        _logical(p1["emb"], c), _logical(p2["emb"], c), atol=1e-6)


@pytest.mark.parametrize("n_hot,row_sharded", [(1, False), (2, True)])
def test_sharded_adagrad_matches_single_device(n_hot, row_sharded):
    """Sharded adagrad (accumulator sharded like the tables, per-shard
    exact dedup) == the single-device chunked adagrad step."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)

    c, params, args = _setup(n_hot=n_hot)
    lr = 0.3

    # single-device oracle (already validated against optax.adagrad)
    ref_step = make_jit_train_step_opt(c, optimizer="adagrad", lr=lr)
    ref_opt = init_opt_state(params, config=c, optimizer="adagrad", lr=lr)
    ref_state = (jax.tree.map(jnp.copy, params), ref_opt)
    for _ in range(3):
        ref_state, ref_loss = ref_step(ref_state[0], ref_state[1], *args)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=c.pack,
                       max_rows_per_shard=100 if row_sharded else None)
    if row_sharded:
        assert p.row_sharded
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(params["emb"], p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c, optimizer="adagrad",
                                 lr=lr, mesh=mesh)
    step = make_sharded_train_step_opt(c, optimizer="adagrad", lr=lr,
                                       mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    state, _ = step(state[0], state[1], *sh_args)
    # strict after ONE step (before rsqrt amplifies rounding divergence)
    ref1 = (jax.tree.map(jnp.copy, params),
            init_opt_state(params, config=c, optimizer="adagrad", lr=lr))
    ref1, _ = ref_step(ref1[0], ref1[1], *args)
    np.testing.assert_allclose(
        pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c),
        _logical(ref1[0]["emb"], c), atol=2e-5, rtol=2e-5)
    for _ in range(2):
        state, loss = step(state[0], state[1], *sh_args)

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               atol=1e-5, rtol=1e-5)
    # looser after 3: adagrad's rsqrt compounds float noise across steps
    got_emb = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c)
    np.testing.assert_allclose(got_emb, _logical(ref_state[0]["emb"], c),
                               atol=5e-4, rtol=5e-4)
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], ref_state[0][side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_sharded_adagrad_col_sharded_matches_dense_oracle(n_hot):
    """Adagrad with column-sharded (+ row-sharded + slot) tables: Adagrad
    is elementwise, so each lane slice keeps an independent accumulator;
    two sharded steps must match a dense-gradient Adagrad oracle."""
    from dlrm_tpu.models import dlrm as model_lib
    from dlrm_tpu.ops.loss import bce_loss
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.optim import apply_adagrad_dense_table
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)
    import optax

    c = dlrm_tpu.tiny_config(num_tables=6, rows=64, feature_size=8,
                             n_hot=n_hot)
    c = dataclasses.replace(c, table_sizes=(64, 400, 12, 300, 64, 50),
                            packed_tables=False)
    params = dlrm_tpu.init_params(jax.random.key(7), c)
    rng = np.random.default_rng(3)
    batch = synthetic.random_batch(rng, c, 32)
    sparse = np.asarray(batch["sparse"]).copy()
    sparse[1] = sparse[0]  # duplicate ids: the adagrad-critical case
    args = (jnp.asarray(batch["dense"]), jnp.asarray(sparse),
            jnp.asarray(batch["labels"]))
    lr, steps = 0.3, 2

    # dense-gradient oracle: full-table autodiff grad (duplicates already
    # summed), elementwise adagrad per table; optax for the MLPs
    def loss_fn(p):
        return bce_loss(model_lib.forward(p, args[0], args[1], c), args[2])

    ref = jax.tree.map(jnp.copy, params)
    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    dense_ref = {"bottom": ref["bottom"], "top": ref["top"]}
    dstate = tx.init(dense_ref)
    acc = jnp.zeros(ref["emb"].shape, jnp.float32)
    for _ in range(steps):
        ref_full = {"bottom": dense_ref["bottom"], "emb": ref["emb"],
                    "top": dense_ref["top"]}
        g = jax.grad(loss_fn)(ref_full)
        upd, dstate = tx.update({"bottom": g["bottom"], "top": g["top"]},
                                dstate, dense_ref)
        dense_ref = optax.apply_updates(dense_ref, upd)
        new_emb, acc = apply_adagrad_dense_table(ref["emb"], acc,
                                                 g["emb"], lr)
        ref = {"bottom": dense_ref["bottom"], "emb": new_emb,
               "top": dense_ref["top"]}

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=1, max_rows_per_shard=350,
                       col_sharded_tables=(3, 5))
    assert p.col_sharded == (3, 5) and p.row_sharded == (1,)
    emb_np = np.asarray(params["emb"])
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, c),
        "emb_cs": pemb.shard_col_tables(emb_np, p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c, optimizer="adagrad",
                                 lr=lr, mesh=mesh)
    assert len(opt["emb_acc_cs"]) == 2
    step = make_sharded_train_step_opt(c, optimizer="adagrad", lr=lr,
                                       mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    for _ in range(steps):
        state, loss = step(state[0], state[1], *sh_args)

    want_emb = np.asarray(ref["emb"])
    got_emb = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c)
    for t in range(c.num_tables):
        off, rows = c.table_offsets[t], c.table_sizes[t]
        if t in p.col_sharded:
            continue
        np.testing.assert_allclose(got_emb[off:off + rows],
                                   want_emb[off:off + rows],
                                   atol=1e-4, rtol=1e-4, err_msg=f"t={t}")
    got_cs = pemb.unshard_col_tables(
        [np.asarray(a) for a in state[0]["emb_cs"]], p)
    for k, t in enumerate(p.col_sharded):
        off, rows = c.table_offsets[t], c.table_sizes[t]
        np.testing.assert_allclose(got_cs[k], want_emb[off:off + rows],
                                   atol=1e-4, rtol=1e-4, err_msg=f"cs t={t}")
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], ref[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_sharded_adagrad_host_tables_matches_dense_oracle(n_hot):
    """Adagrad on host-resident row-sharded tables (pinned-host
    accumulator slab, dedup on device, host-side gather/scatter) plus
    slot + device row-sharded tables, vs the dense-gradient oracle."""
    from dlrm_tpu.models import dlrm as model_lib
    from dlrm_tpu.ops import embedding as emb_ops
    from dlrm_tpu.ops.loss import bce_loss
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel import host_tier as ht
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.optim import apply_adagrad_dense_table
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)
    import optax

    if not ht.host_memory_supported():
        pytest.skip("no pinned_host memory space")
    c = dlrm_tpu.tiny_config(num_tables=6, rows=64, feature_size=8,
                             n_hot=n_hot)
    c = dataclasses.replace(c, table_sizes=(64, 1000, 16, 2048, 128, 512))
    params = dlrm_tpu.init_params(jax.random.key(9), c)
    rng = np.random.default_rng(9)
    batch = synthetic.random_batch(rng, c, 32)
    sparse = np.asarray(batch["sparse"]).copy()
    sparse[1] = sparse[0]
    args = (jnp.asarray(batch["dense"]), jnp.asarray(sparse),
            jnp.asarray(batch["labels"]))
    lr, steps = 0.3, 2

    logical = jnp.asarray(emb_ops.unpack_tables(
        jax.tree.map(np.asarray, params["emb"]), c))

    def loss_fn(p):
        pooled = emb_ops.pool(emb_ops.gather_rows(
            p["emb"], emb_ops.translate_ids(args[1], c.table_offsets)))
        dp = {"bottom": p["bottom"], "top": p["top"]}
        out = model_lib.forward_from_pooled(dp, pooled, args[0], c)
        return bce_loss(out, args[2])

    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    dense_ref = {"bottom": jax.tree.map(jnp.copy, params["bottom"]),
                 "top": jax.tree.map(jnp.copy, params["top"])}
    dstate = tx.init(dense_ref)
    emb_ref = jnp.copy(logical)
    acc = jnp.zeros(logical.shape, jnp.float32)
    for _ in range(steps):
        g = jax.grad(loss_fn)({"bottom": dense_ref["bottom"],
                               "emb": emb_ref,
                               "top": dense_ref["top"]})
        upd, dstate = tx.update({"bottom": g["bottom"], "top": g["top"]},
                                dstate, dense_ref)
        dense_ref = optax.apply_updates(dense_ref, upd)
        emb_ref, acc = apply_adagrad_dense_table(emb_ref, acc, g["emb"],
                                                 lr)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=c.pack,
                       max_rows_per_shard=1500, host_tables=(1, 3))
    assert set(p.host_row_sharded) == {1, 3}
    emb_np = np.asarray(logical)
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, c),
        "emb_h": pemb.shard_host_tables(emb_np, p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c, optimizer="adagrad",
                                 lr=lr, mesh=mesh)
    assert opt["emb_acc_h"].sharding.memory_kind == "pinned_host"
    step = make_sharded_train_step_opt(c, optimizer="adagrad", lr=lr,
                                       mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    for _ in range(steps):
        state, loss = step(state[0], state[1], *sh_args)

    got = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c,
                              host=np.asarray(state[0]["emb_h"]))
    np.testing.assert_allclose(got, np.asarray(emb_ref),
                               atol=1e-4, rtol=1e-4)
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], dense_ref[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_rowwise_adagrad_matches_dense_oracle(n_hot):
    """Row-wise Adagrad (one accumulator scalar per row, the torchrec
    ROWWISE_ADAGRAD analog): multi-step parity against a dense oracle
    applying acc[r] += mean_D(g_r^2); w[r] -= lr*g_r*rsqrt(acc[r]+eps)
    on the logical stack (dense params via optax elementwise adagrad,
    matching the implementation's split)."""
    c, params, args = _setup(n_hot=n_hot)
    dense, sparse, labels = args
    lr = 0.3

    logical0 = jnp.asarray(_logical(params["emb"], c))
    cp = dataclasses.replace(c, packed_tables=False)
    oracle_dense = {"bottom": jax.tree.map(jnp.copy, params["bottom"]),
                    "top": jax.tree.map(jnp.copy, params["top"])}
    oracle_emb = logical0
    acc = jnp.zeros((logical0.shape[0],), jnp.float32)
    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    opt = tx.init(oracle_dense)
    for _ in range(3):
        full = {"bottom": oracle_dense["bottom"], "emb": oracle_emb,
                "top": oracle_dense["top"]}

        def loss_fn(p):
            out = model_lib.forward(p, dense, sparse, cp)
            return bce_loss(out, labels)

        grads = jax.grad(loss_fn)(full)
        g_emb = grads.pop("emb")
        updates, opt = tx.update(
            {"bottom": grads["bottom"], "top": grads["top"]}, opt,
            oracle_dense)
        oracle_dense = optax.apply_updates(oracle_dense, updates)
        acc_new = acc + jnp.mean(g_emb * g_emb, axis=-1)
        rs = jnp.where(acc_new > 0, jax.lax.rsqrt(acc_new + 1e-10), 0.0)
        oracle_emb = oracle_emb - lr * g_emb * rs[:, None]
        acc = acc_new

    step = make_jit_train_step_opt(c, optimizer="rowwise_adagrad", lr=lr)
    opt_state = init_opt_state(params, config=c,
                               optimizer="rowwise_adagrad", lr=lr)
    state = (jax.tree.map(jnp.copy, params), opt_state)
    for _ in range(3):
        state, loss = step(state[0], state[1], *args)
    got_params, got_opt = state
    # accumulator stores exactly 1 scalar per logical row
    total_acc = sum(int(np.prod(a.shape)) for a in got_opt["emb"].acc)
    assert total_acc == sum(
        -(-s // c.pack) * c.pack for s in c.table_sizes)
    np.testing.assert_allclose(_logical(got_params["emb"], c),
                               np.asarray(oracle_emb),
                               atol=5e-5, rtol=5e-5)
    for side in ("bottom", "top"):
        for a, b in zip(got_params[side], oracle_dense[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("impl,unroll", [("dense_g", True),
                                         ("dedup", True),
                                         ("dense_g", False)])
def test_rowwise_adagrad_block_matches_sequential(impl, unroll):
    """Row-wise blocks: with disjoint ids across micro-batches, a K-block
    equals K sequential rowwise steps (both impls + the scan variant)."""
    from dlrm_tpu.train.train import make_jit_train_block_opt

    c = dataclasses.replace(
        dlrm_tpu.tiny_config(num_tables=4, rows=256, feature_size=8),
        small_table_threshold=16, table_sizes=(16, 256, 8, 256))
    params = dlrm_tpu.init_params(jax.random.key(5), c)
    rng = np.random.default_rng(5)
    k, b = 3, 32
    dense = jnp.asarray(rng.normal(size=(k, b, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack([np.stack(
        [rng.integers(i * (s // k), (i + 1) * (s // k), size=b)
         for s in c.table_sizes], axis=1)
        for i in range(k)]).astype(np.int32))
    labels = jnp.asarray((rng.random((k, b)) > 0.5).astype(np.float32))
    lr = 0.1

    step = make_jit_train_step_opt(c, optimizer="rowwise_adagrad", lr=lr)
    p_ref = jax.tree.map(jnp.copy, params)
    o_ref = init_opt_state(p_ref, config=c, optimizer="rowwise_adagrad",
                           lr=lr)
    for i in range(k):
        (p_ref, o_ref), _ = step(p_ref, o_ref, dense[i], sparse[i],
                                 labels[i])

    blk = make_jit_train_block_opt(c, optimizer="rowwise_adagrad", lr=lr,
                                   block=k, adagrad_impl=impl,
                                   unroll=unroll)
    p_blk = jax.tree.map(jnp.copy, params)
    o_blk = init_opt_state(p_blk, config=c, optimizer="rowwise_adagrad",
                           lr=lr)
    (p_blk, o_blk), losses = blk(p_blk, o_blk, dense, sparse, labels)
    assert losses.shape == (k,)
    np.testing.assert_allclose(_logical(p_blk["emb"], c),
                               _logical(p_ref["emb"], c),
                               atol=1e-5, rtol=1e-5)
    for a, b_ in zip(o_ref["emb"].acc, o_blk["emb"].acc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("n_hot,row_sharded", [(1, False), (2, False),
                                               (1, True)])
def test_sharded_rowwise_adagrad_matches_single_device(n_hot, row_sharded):
    """Sharded ROW-WISE adagrad (one accumulator scalar per logical row,
    sharded (N, local_rows, pack)) == the single-device rowwise step."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)

    c, params, args = _setup(n_hot=n_hot)
    lr = 0.3

    ref_step = make_jit_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr)
    ref_opt = init_opt_state(params, config=c, optimizer="rowwise_adagrad",
                             lr=lr)
    ref_state = (jax.tree.map(jnp.copy, params), ref_opt)
    for _ in range(3):
        ref_state, ref_loss = ref_step(ref_state[0], ref_state[1], *args)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=c.pack,
                       max_rows_per_shard=100 if row_sharded else None)
    if row_sharded:  # the parametrization must really exercise rs
        assert p.row_sharded, p
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(params["emb"], p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c,
                                 optimizer="rowwise_adagrad", lr=lr,
                                 mesh=mesh)
    assert opt["emb_acc"].shape == sh_params["emb"].shape[:2] + (c.pack,)
    step = make_sharded_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    for _ in range(3):
        state, loss = step(state[0], state[1], *sh_args)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               atol=1e-5, rtol=1e-5)
    got_emb = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c)
    np.testing.assert_allclose(got_emb, _logical(ref_state[0]["emb"], c),
                               atol=5e-4, rtol=5e-4)
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], ref_state[0][side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_sharded_rowwise_col_sharded_matches_dense_oracle(n_hot):
    """Row-wise Adagrad with column-sharded (+ row-sharded + slot) tables:
    the cs accumulator is ONE replicated (R,) vector per table and the
    full-D mean of g^2 is completed with a cross-shard psum of the lane
    sums (parallel/embedding._cs_rowwise_local); two sharded steps must
    match a dense-gradient row-wise oracle."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.optim import apply_rowwise_adagrad_dense_table
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)

    c = dlrm_tpu.tiny_config(num_tables=6, rows=64, feature_size=8,
                             n_hot=n_hot)
    c = dataclasses.replace(c, table_sizes=(64, 400, 12, 300, 64, 50),
                            packed_tables=False)
    params = dlrm_tpu.init_params(jax.random.key(7), c)
    rng = np.random.default_rng(3)
    batch = synthetic.random_batch(rng, c, 32)
    sparse = np.asarray(batch["sparse"]).copy()
    sparse[1] = sparse[0]  # duplicate ids: the dedup-then-apply case
    args = (jnp.asarray(batch["dense"]), jnp.asarray(sparse),
            jnp.asarray(batch["labels"]))
    lr, steps = 0.3, 2

    def loss_fn(p):
        return bce_loss(model_lib.forward(p, args[0], args[1], c), args[2])

    ref = jax.tree.map(jnp.copy, params)
    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    dense_ref = {"bottom": ref["bottom"], "top": ref["top"]}
    dstate = tx.init(dense_ref)
    acc = jnp.zeros((ref["emb"].shape[0],), jnp.float32)
    for _ in range(steps):
        ref_full = {"bottom": dense_ref["bottom"], "emb": ref["emb"],
                    "top": dense_ref["top"]}
        g = jax.grad(loss_fn)(ref_full)
        upd, dstate = tx.update({"bottom": g["bottom"], "top": g["top"]},
                                dstate, dense_ref)
        dense_ref = optax.apply_updates(dense_ref, upd)
        new_emb, acc = apply_rowwise_adagrad_dense_table(
            ref["emb"], acc, g["emb"], lr)
        ref = {"bottom": dense_ref["bottom"], "emb": new_emb,
               "top": dense_ref["top"]}

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=1, max_rows_per_shard=350,
                       col_sharded_tables=(3, 5))
    assert p.col_sharded == (3, 5) and p.row_sharded == (1,)
    emb_np = np.asarray(params["emb"])
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, c),
        "emb_cs": pemb.shard_col_tables(emb_np, p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c,
                                 optimizer="rowwise_adagrad", lr=lr,
                                 mesh=mesh)
    assert len(opt["emb_acc_cs"]) == 2
    assert all(a.ndim == 1 for a in opt["emb_acc_cs"])  # replicated (R,)
    step = make_sharded_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    for _ in range(steps):
        state, loss = step(state[0], state[1], *sh_args)

    want_emb = np.asarray(ref["emb"])
    got_emb = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c)
    for t in range(c.num_tables):
        off, rows = c.table_offsets[t], c.table_sizes[t]
        if t in p.col_sharded:
            continue
        np.testing.assert_allclose(got_emb[off:off + rows],
                                   want_emb[off:off + rows],
                                   atol=1e-4, rtol=1e-4, err_msg=f"t={t}")
    got_cs = pemb.unshard_col_tables(
        [np.asarray(a) for a in state[0]["emb_cs"]], p)
    for k, t in enumerate(p.col_sharded):
        off, rows = c.table_offsets[t], c.table_sizes[t]
        np.testing.assert_allclose(got_cs[k], want_emb[off:off + rows],
                                   atol=1e-4, rtol=1e-4, err_msg=f"cs t={t}")
        # the replicated accumulator must equal the oracle's row accs
        np.testing.assert_allclose(
            np.asarray(state[1]["emb_acc_cs"][k]),
            np.asarray(acc[off:off + rows]), atol=1e-5, rtol=1e-5)
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], ref[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_hot", [1, 2])
def test_sharded_rowwise_host_tables_matches_dense_oracle(n_hot):
    """Row-wise Adagrad on host-resident row-sharded tables: the
    scalar-per-row accumulator is a (N, host_rows, pack) slab pinned next
    to the table slab (1/D the slow-tier optimizer bytes AND PCIe
    accumulator traffic), plus slot + device row-sharded tables, vs the
    dense-gradient row-wise oracle."""
    from dlrm_tpu.parallel import host_tier as ht
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.optim import apply_rowwise_adagrad_dense_table
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt)

    if not ht.host_memory_supported():
        pytest.skip("no pinned_host memory space")
    c = dlrm_tpu.tiny_config(num_tables=6, rows=64, feature_size=8,
                             n_hot=n_hot)
    c = dataclasses.replace(c, table_sizes=(64, 1000, 16, 2048, 128, 512))
    params = dlrm_tpu.init_params(jax.random.key(9), c)
    rng = np.random.default_rng(9)
    batch = synthetic.random_batch(rng, c, 32)
    sparse = np.asarray(batch["sparse"]).copy()
    sparse[1] = sparse[0]
    args = (jnp.asarray(batch["dense"]), jnp.asarray(sparse),
            jnp.asarray(batch["labels"]))
    lr, steps = 0.3, 2

    logical = jnp.asarray(emb_ops.unpack_tables(
        jax.tree.map(np.asarray, params["emb"]), c))

    def loss_fn(p):
        pooled = emb_ops.pool(emb_ops.gather_rows(
            p["emb"], emb_ops.translate_ids(args[1], c.table_offsets)))
        dp = {"bottom": p["bottom"], "top": p["top"]}
        out = model_lib.forward_from_pooled(dp, pooled, args[0], c)
        return bce_loss(out, args[2])

    tx = optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    dense_ref = {"bottom": jax.tree.map(jnp.copy, params["bottom"]),
                 "top": jax.tree.map(jnp.copy, params["top"])}
    dstate = tx.init(dense_ref)
    emb_ref = jnp.copy(logical)
    acc = jnp.zeros((logical.shape[0],), jnp.float32)
    for _ in range(steps):
        g = jax.grad(loss_fn)({"bottom": dense_ref["bottom"],
                               "emb": emb_ref,
                               "top": dense_ref["top"]})
        upd, dstate = tx.update({"bottom": g["bottom"], "top": g["top"]},
                                dstate, dense_ref)
        dense_ref = optax.apply_updates(dense_ref, upd)
        emb_ref, acc = apply_rowwise_adagrad_dense_table(emb_ref, acc,
                                                         g["emb"], lr)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=c.pack,
                       max_rows_per_shard=1500, host_tables=(1, 3))
    assert set(p.host_row_sharded) == {1, 3}
    emb_np = np.asarray(logical)
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, c),
        "emb_h": pemb.shard_host_tables(emb_np, p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt = init_sharded_opt_state(sh_params, config=c,
                                 optimizer="rowwise_adagrad", lr=lr,
                                 mesh=mesh)
    assert opt["emb_acc_h"].sharding.memory_kind == "pinned_host"
    assert opt["emb_acc_h"].shape[-1] == p.pack  # scalar-per-row slab
    step = make_sharded_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p)
    bs = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bs) for a in args)
    state = (sh_params, opt)
    for _ in range(steps):
        state, loss = step(state[0], state[1], *sh_args)

    got = pemb.unshard_tables(np.asarray(state[0]["emb"]), p, c,
                              host=np.asarray(state[0]["emb_h"]))
    np.testing.assert_allclose(got, np.asarray(emb_ref),
                               atol=1e-4, rtol=1e-4)
    for side in ("bottom", "top"):
        for a, b in zip(state[0][side], dense_ref[side]):
            for _k in ("w", "b"):
                np.testing.assert_allclose(np.asarray(a[_k]),
                                           np.asarray(b[_k]),
                                           atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("scheduled,unroll", [(False, True),
                                              (True, False)])
def test_sharded_rowwise_block_matches_sequential(scheduled, unroll):
    """Sharded rowwise blocks (incl. the twin scheduled payload) == K
    sequential sharded rowwise steps on disjoint ids."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding,
                                        block_batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_block_opt,
                                      make_sharded_train_step_opt)
    from dlrm_tpu.train.optim import make_schedule

    c = dataclasses.replace(
        dlrm_tpu.tiny_config(num_tables=4, rows=256, feature_size=8),
        table_sizes=(64, 256, 32, 256))
    params = dlrm_tpu.init_params(jax.random.key(21), c)
    rng = np.random.default_rng(21)
    k, b = 2, 32
    dense = jnp.asarray(rng.normal(size=(k, b, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack([np.stack(
        [rng.integers(i * (s // k), (i + 1) * (s // k), size=b)
         for s in c.table_sizes], axis=1)
        for i in range(k)]).astype(np.int32))
    labels = jnp.asarray((rng.random((k, b)) > 0.5).astype(np.float32))
    lr = (make_schedule(0.2, schedule="warmup_poly_decay", warmup_steps=1,
                        decay_start=1, decay_steps=6)
          if scheduled else 0.1)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=c.pack)
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": jnp.asarray(pemb.shard_tables(params["emb"], p, c)),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    shardings = param_shardings(mesh, sh_params)
    sh_params = jax.device_put(sh_params, shardings)
    bs = batch_sharding(mesh)
    bbs = block_batch_sharding(mesh)

    step = make_sharded_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p)
    p_ref = jax.device_put(jax.tree.map(jnp.copy, sh_params), shardings)
    o_ref = init_sharded_opt_state(p_ref, config=c,
                                   optimizer="rowwise_adagrad", lr=lr,
                                   mesh=mesh)
    for i in range(k):
        (p_ref, o_ref), _ = step(p_ref, o_ref,
                                 jax.device_put(dense[i], bs),
                                 jax.device_put(sparse[i], bs),
                                 jax.device_put(labels[i], bs))

    blk = make_sharded_train_block_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p,
                                       block=k, unroll=unroll)
    p_blk = jax.device_put(jax.tree.map(jnp.copy, sh_params), shardings)
    o_blk = init_sharded_opt_state(p_blk, config=c,
                                   optimizer="rowwise_adagrad", lr=lr,
                                   mesh=mesh)
    (p_blk, o_blk), losses = blk(p_blk, o_blk,
                                 jax.device_put(dense, bbs),
                                 jax.device_put(sparse, bbs),
                                 jax.device_put(labels, bbs))
    assert losses.shape == (k,)
    np.testing.assert_allclose(
        pemb.unshard_tables(np.asarray(p_blk["emb"]), p, c),
        pemb.unshard_tables(np.asarray(p_ref["emb"]), p, c),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_blk["emb_acc"]),
                               np.asarray(o_ref["emb_acc"]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("scheduled", [False, True])
def test_sharded_rowwise_block_cs_host_matches_sequential(scheduled):
    """Rowwise blocks (incl. the twin scheduled payload) on a placement
    with column-sharded + host-resident + row-sharded + slot tables == K
    sequential sharded rowwise steps on disjoint ids."""
    from dlrm_tpu.parallel import host_tier as ht
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding,
                                        block_batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_block_opt,
                                      make_sharded_train_step_opt)
    from dlrm_tpu.train.optim import make_schedule

    if not ht.host_memory_supported():
        pytest.skip("no pinned_host memory space")
    c = dataclasses.replace(
        dlrm_tpu.tiny_config(num_tables=5, rows=256, feature_size=8),
        table_sizes=(64, 512, 32, 300, 1024), packed_tables=False)
    params = dlrm_tpu.init_params(jax.random.key(31), c)
    rng = np.random.default_rng(31)
    k, b = 2, 32
    dense = jnp.asarray(rng.normal(size=(k, b, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack([np.stack(
        [rng.integers(i * (s // k), (i + 1) * (s // k), size=b)
         for s in c.table_sizes], axis=1)
        for i in range(k)]).astype(np.int32))
    labels = jnp.asarray((rng.random((k, b)) > 0.5).astype(np.float32))
    lr = (make_schedule(0.2, schedule="warmup_poly_decay", warmup_steps=1,
                        decay_start=1, decay_steps=6)
          if scheduled else 0.1)

    mesh = make_mesh(8)
    p = plan_placement(c.table_sizes, 8, pack=1, max_rows_per_shard=400,
                       col_sharded_tables=(3,), host_tables=(4,))
    assert p.col_sharded == (3,) and 4 in p.host_row_sharded \
        and 1 in p.row_sharded
    emb_np = np.asarray(params["emb"])
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, c),
        "emb_cs": pemb.shard_col_tables(emb_np, p, c),
        "emb_h": pemb.shard_host_tables(emb_np, p, c),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    shardings = param_shardings(mesh, sh_params)
    sh_params = jax.device_put(sh_params, shardings)
    bs = batch_sharding(mesh)
    bbs = block_batch_sharding(mesh)

    step = make_sharded_train_step_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p)
    p_ref = jax.device_put(jax.tree.map(jnp.copy, sh_params), shardings)
    o_ref = init_sharded_opt_state(p_ref, config=c,
                                   optimizer="rowwise_adagrad", lr=lr,
                                   mesh=mesh)
    for i in range(k):
        (p_ref, o_ref), _ = step(p_ref, o_ref,
                                 jax.device_put(dense[i], bs),
                                 jax.device_put(sparse[i], bs),
                                 jax.device_put(labels[i], bs))

    blk = make_sharded_train_block_opt(c, optimizer="rowwise_adagrad",
                                       lr=lr, mesh=mesh, placement=p,
                                       block=k)
    p_blk = jax.device_put(jax.tree.map(jnp.copy, sh_params), shardings)
    o_blk = init_sharded_opt_state(p_blk, config=c,
                                   optimizer="rowwise_adagrad", lr=lr,
                                   mesh=mesh)
    (p_blk, o_blk), losses = blk(p_blk, o_blk,
                                 jax.device_put(dense, bbs),
                                 jax.device_put(sparse, bbs),
                                 jax.device_put(labels, bbs))
    assert losses.shape == (k,)
    np.testing.assert_allclose(
        pemb.unshard_tables(np.asarray(p_blk["emb"]), p, c,
                            host=np.asarray(p_blk["emb_h"])),
        pemb.unshard_tables(np.asarray(p_ref["emb"]), p, c,
                            host=np.asarray(p_ref["emb_h"])),
        atol=1e-5, rtol=1e-5)
    for a, bk in zip(o_blk["emb_acc_cs"], o_ref["emb_acc_cs"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bk),
                                   atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        pemb.unshard_col_tables([np.asarray(x) for x in p_blk["emb_cs"]],
                                p)[0],
        pemb.unshard_col_tables([np.asarray(x) for x in p_ref["emb_cs"]],
                                p)[0],
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_blk["emb_acc_h"]),
                               np.asarray(o_ref["emb_acc_h"]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("optimizer", ["adagrad", "rowwise_adagrad"])
@pytest.mark.parametrize("threshold", [0, 1 << 12, 1 << 30])
def test_adagrad_hybrid_impl_matches_dedup(optimizer, threshold):
    """Per-chunk hybrid implementation selection (dense-G for small
    chunks, dedup for big ones) is a pure performance choice: the result
    must equal the dedup implementation bit-for-tolerance at EVERY
    threshold (0 = all dedup, huge = all dense-G, mid = genuine mix)."""
    from dlrm_tpu.train.optim import (apply_adagrad_chunked,
                                      apply_adagrad_hybrid,
                                      apply_rowwise_adagrad_chunked,
                                      split_tables_by_chunk_bytes,
                                      init_emb_state)

    c, params, args = _setup(n_hot=1, seed=6)
    big = [t for t in range(c.num_tables)
           if c.table_sizes[t] > c.small_table_threshold]
    ids = jnp.asarray(np.asarray(args[1])[:, big])
    rng = np.random.default_rng(8)
    d_rows = jnp.asarray(rng.normal(
        size=(ids.shape[0], len(big), c.feature_size)).astype(np.float32))
    rowwise = optimizer == "rowwise_adagrad"
    dedup_fn = (apply_rowwise_adagrad_chunked if rowwise
                else apply_adagrad_chunked)

    emb0 = params["emb"]
    st0 = init_emb_state(c, optimizer, emb0)
    want_emb, want_st = jax.jit(lambda e, s: dedup_fn(
        e, s, ids, d_rows, 0.3, c, tuple(big)))(emb0, st0)
    got_emb, got_st = jax.jit(lambda e, s: apply_adagrad_hybrid(
        e, s, ids, d_rows, 0.3, c, tuple(big),
        dense_g_max_bytes=threshold, rowwise=rowwise))(
            jax.tree.map(jnp.copy, emb0), init_emb_state(c, optimizer,
                                                         emb0))
    if threshold == 1 << 12:  # make sure the mid threshold really mixes
        sm, bg = split_tables_by_chunk_bytes(c, tuple(big), threshold)
        assert sm and bg
    for a, b in zip(got_emb, want_emb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(got_st.acc, want_st.acc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_train_step_opt_emb_impl_parity():
    """make_jit_train_step_opt(emb_impl=...) — full steps agree across
    dedup / dense_g / hybrid."""
    c, params, args = _setup(n_hot=1, seed=12)
    results = {}
    for impl in ("dedup", "dense_g", "hybrid", "hybrid:0", "hybrid:4096"):
        p = jax.tree.map(jnp.copy, params)
        o = init_opt_state(p, config=c, optimizer="adagrad", lr=0.3)
        step = make_jit_train_step_opt(c, optimizer="adagrad", lr=0.3,
                                       emb_impl=impl)
        for _ in range(2):
            (p, o), loss = step(p, o, *args)
        results[impl] = (p, float(loss))
    for impl in ("dense_g", "hybrid", "hybrid:0", "hybrid:4096"):
        np.testing.assert_allclose(results[impl][1], results["dedup"][1],
                                   rtol=1e-6)
        for a, b in zip(_logical(results[impl][0]["emb"], c),
                        _logical(results["dedup"][0]["emb"], c)):
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
