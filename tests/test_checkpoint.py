"""Checkpoint/resume: round-trip, sharded restore, resume-parity.

The reference has no checkpoint writer (SURVEY.md §5); these tests define the
new capability's contract: (1) save/restore is exact, (2) restore can place
arrays into a different sharding than they were saved with, (3) training
resumed from a checkpoint is bit-identical to uninterrupted training.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import dlrm_tpu
from dlrm_tpu.io import checkpoint as ckpt
from dlrm_tpu.parallel.mesh import make_mesh


def _tree_equal(a, b):
    """Leaf-wise equality; tolerant of tuple-vs-list container drift
    (orbax restores tuples as lists when no template is given)."""
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def _tiny_setup(seed=0):
    config = dlrm_tpu.tiny_config()
    params = dlrm_tpu.init_params(jax.random.key(seed), config)
    rng = np.random.default_rng(seed)
    b = 16
    batch = {
        "dense": jnp.asarray(rng.normal(size=(b, 13)).astype(np.float32)),
        "sparse": jnp.asarray(np.stack(
            [rng.integers(0, s, size=b) for s in config.table_sizes],
            axis=1).astype(np.int32)),
        "labels": jnp.asarray((rng.random(b) > 0.5).astype(np.float32)),
    }
    return config, params, batch


def test_save_restore_roundtrip(tmp_path):
    config, params, _ = _tiny_setup()
    path = ckpt.save_checkpoint(tmp_path / "ck", 7, params)
    assert path.endswith("/7")
    restored, step = ckpt.restore_checkpoint(tmp_path / "ck")
    assert step == 7
    assert _tree_equal(params, restored)


def test_latest_step_selection(tmp_path):
    config, params, _ = _tiny_setup()
    for s in (3, 10, 5):
        ckpt.save_checkpoint(tmp_path / "ck", s, params)
    assert ckpt.latest_step(tmp_path / "ck") == 10
    _, step = ckpt.restore_checkpoint(tmp_path / "ck")
    assert step == 10
    _, step = ckpt.restore_checkpoint(tmp_path / "ck", step=3)
    assert step == 3


def test_restore_with_resharding(tmp_path):
    """Save replicated, restore sharded over the 8-device mesh."""
    config, params, _ = _tiny_setup()
    ckpt.save_checkpoint(tmp_path / "ck", 0, params)
    mesh = make_mesh(8)
    shardings = jax.tree.map(lambda x: NamedSharding(mesh, P()), params)
    # shard each embedding chunk's physical-row axis across devices
    assert all(c.shape[0] % 8 == 0 for c in params["emb"])
    shardings["emb"] = tuple(
        NamedSharding(mesh, P("d")) for _ in params["emb"])
    restored, _ = ckpt.restore_checkpoint(
        tmp_path / "ck", template=params, shardings=shardings)
    for got, want in zip(restored["emb"], shardings["emb"]):
        assert got.sharding == want
    assert _tree_equal(params, restored)


def test_resume_parity(tmp_path):
    """train 4 steps == train 2, checkpoint, restore, train 2 more."""
    config, params, batch = _tiny_setup()
    step_fn = dlrm_tpu.make_jit_train_step(config, lr=0.1)

    p = jax.tree.map(jnp.copy, params)
    for _ in range(4):
        p, _ = step_fn(p, batch["dense"], batch["sparse"], batch["labels"])
    straight = jax.tree.map(np.asarray, p)

    p = jax.tree.map(jnp.copy, params)
    for _ in range(2):
        p, _ = step_fn(p, batch["dense"], batch["sparse"], batch["labels"])
    ckpt.save_checkpoint(tmp_path / "ck", 2, p)
    restored, step = ckpt.restore_checkpoint(tmp_path / "ck",
                                             template=params)
    assert step == 2
    restored = jax.tree.map(jnp.asarray, restored)
    for _ in range(2):
        restored, _ = step_fn(restored, batch["dense"], batch["sparse"],
                              batch["labels"])
    assert _tree_equal(straight, restored)


def test_checkpoint_manager_retention(tmp_path):
    config, params, _ = _tiny_setup()
    with ckpt.CheckpointManager(tmp_path / "ck", save_interval=2,
                                max_to_keep=2) as mgr:
        assert mgr.restore_latest(template=params) is None
        for step in range(7):
            saved = mgr.maybe_save(step, params)
            assert saved == (step % 2 == 0)
        mgr.wait_until_finished()
        assert mgr.latest_step() == 6
        out = mgr.restore_latest(template=params)
        assert out is not None
        restored, step = out
        assert step == 6
        assert _tree_equal(params, restored)
        # retention: only 2 newest kept
        import os
        kept = sorted(int(d) for d in os.listdir(tmp_path / "ck")
                      if d.isdigit())
        assert kept == [4, 6]


def test_sharded_table_checkpoint_roundtrip(tmp_path):
    """The multi-chip layout (N, local_rows, D) checkpoints and restores
    sharded without gathering."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.placement import plan_placement

    config, params, _ = _tiny_setup()
    mesh = make_mesh(8)
    placement = plan_placement(config.table_sizes, 8)
    sharded = pemb.shard_tables(params["emb"], placement, config)
    sh = NamedSharding(mesh, P("d"))
    emb = jax.device_put(jnp.asarray(sharded), sh)
    ckpt.save_checkpoint(tmp_path / "ck", 1, {"emb": emb})
    restored, _ = ckpt.restore_checkpoint(
        tmp_path / "ck", template={"emb": emb}, shardings={"emb": sh})
    assert restored["emb"].sharding == sh
    np.testing.assert_array_equal(np.asarray(restored["emb"]), sharded)
    back = pemb.unshard_tables(np.asarray(restored["emb"]), placement, config)
    from dlrm_tpu.ops import embedding as emb_ops
    np.testing.assert_array_equal(
        back, emb_ops.unpack_tables(jax.tree.map(np.asarray, params["emb"]), config))


def test_sharded_adagrad_resume_parity(tmp_path):
    """Resuming the sharded-adagrad step (params + sharded accumulator +
    schedule count via CheckpointManager) is bit-identical to uninterrupted
    training — the accumulator must not reset (run.py ckpt_payload)."""
    from dlrm_tpu.parallel import embedding as pemb
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import (init_sharded_opt_state,
                                      make_sharded_train_step_opt,
                                      sharded_opt_shardings)

    config, params, batch = _tiny_setup()
    mesh = make_mesh(8)
    placement = plan_placement(config.table_sizes, 8, pack=config.pack)
    sh_params = {
        "bottom": params["bottom"],
        "emb": jnp.asarray(pemb.shard_tables(params["emb"], placement,
                                             config)),
        "top": params["top"],
    }
    shardings = param_shardings(mesh, sh_params)
    sh_params = jax.device_put(sh_params, shardings)
    bs = batch_sharding(mesh)
    args = tuple(jax.device_put(batch[k], bs)
                 for k in ("dense", "sparse", "labels"))
    step = make_sharded_train_step_opt(config, optimizer="adagrad", lr=0.2,
                                       mesh=mesh, placement=placement)

    def fresh():
        p = jax.device_put(jax.tree.map(jnp.copy, sh_params), shardings)
        o = init_sharded_opt_state(p, config=config, optimizer="adagrad",
                                   lr=0.2, mesh=mesh)
        return p, o

    p, o = fresh()
    for _ in range(4):
        (p, o), _ = step(p, o, *args)
    straight = jax.tree.map(np.asarray, p)

    p, o = fresh()
    for _ in range(2):
        (p, o), _ = step(p, o, *args)
    with ckpt.CheckpointManager(tmp_path / "ck") as mgr:
        mgr.save(2, {"params": p, "opt": o}, force=True)
        mgr.wait_until_finished()
    tpl_p, tpl_o = fresh()
    with ckpt.CheckpointManager(tmp_path / "ck") as mgr:
        full, step_no = mgr.restore_latest(
            template={"params": tpl_p, "opt": tpl_o},
            shardings={"params": shardings,
                       "opt": sharded_opt_shardings(tpl_o, mesh)})
    assert step_no == 2
    p, o = full["params"], full["opt"]
    assert o["emb_acc"].sharding.spec == P("d")
    assert np.asarray(o["emb_acc"]).max() > 0  # accumulator survived
    for _ in range(2):
        (p, o), _ = step(p, o, *args)
    assert _tree_equal(straight, p)
