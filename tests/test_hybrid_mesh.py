"""2-D (DCN x ICI) hybrid-mesh parity: the multi-host scaling path.

SURVEY.md §2.4's final row maps multi-host DLRM onto a ``(h, d)`` mesh:
batch data-parallelism over BOTH axes, table model-parallelism (and the
embedding all-to-all) over the ICI axis ``d`` only, dense gradients psum'd
over both (GSPMD), and the compressed sparse gradients all-gathered over
the DCN axis ``h`` so every DCN replica applies one identical update.

The invariant tested here is the strongest one available without real
multi-host hardware: a step on the (2, 4) virtual mesh must match the
single-device step bit-for-tolerance AND leave the table stack identical
on every DCN replica (shard_map's replication checker enforces the latter
structurally; we also check it numerically).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dlrm_tpu
from dlrm_tpu.ops import embedding as emb_ops
from dlrm_tpu.parallel import embedding as pemb
from dlrm_tpu.parallel.mesh import (batch_sharding, block_batch_sharding,
                                    dcn_axis_of, make_mesh, make_mesh_2d,
                                    param_shardings)
from dlrm_tpu.parallel.placement import plan_placement
from dlrm_tpu.train.train import (init_opt_state, init_sharded_opt_state,
                                  make_sharded_train_block,
                                  make_sharded_train_step,
                                  make_sharded_train_step_opt,
                                  make_jit_train_step_opt, train_step)


def _random_batch(rng, config, b):
    dense = rng.normal(size=(b, config.num_dense)).astype(np.float32)
    if config.n_hot == 1:
        sparse = np.stack(
            [rng.integers(0, s, size=b) for s in config.table_sizes],
            axis=1).astype(np.int32)
    else:
        sparse = np.stack(
            [rng.integers(0, s, size=(b, config.n_hot))
             for s in config.table_sizes], axis=1).astype(np.int32)
    labels = (rng.random(b) > 0.5).astype(np.float32)
    return dense, sparse, labels


def test_mesh_2d_axes():
    mesh = make_mesh_2d(2, 4)
    assert mesh.axis_names == ("h", "d")
    assert mesh.devices.shape == (2, 4)
    assert dcn_axis_of(mesh) == "h"
    assert dcn_axis_of(make_mesh(8)) is None
    # batch spans both axes; tables span d only
    assert batch_sharding(mesh).spec == jax.P(("h", "d"))
    assert block_batch_sharding(mesh).spec == jax.P(None, ("h", "d"))


@pytest.mark.parametrize("n_hot,packed", [(1, True), (2, True), (1, False)])
def test_hybrid_lookup_matches_single_device(n_hot, packed, rng):
    config = dlrm_tpu.tiny_config(num_tables=7, rows=64, feature_size=8,
                                  n_hot=n_hot)
    mesh = make_mesh_2d(2, 4)
    p = plan_placement(config.table_sizes, 4,
                       pack=config.pack if packed else 1)
    stacked = rng.normal(size=(config.total_rows,
                               config.feature_size)).astype(np.float32)
    _, sparse, _ = _random_batch(rng, config, 32)

    expected = emb_ops.lookup(jnp.asarray(stacked), jnp.asarray(sparse),
                              config.table_offsets)
    emb_sh = jax.device_put(pemb.shard_tables(stacked, p, config),
                            jax.NamedSharding(mesh, jax.P("d")))
    ids = jax.device_put(jnp.asarray(sparse), batch_sharding(mesh))
    got = jax.jit(lambda e, i: pemb.sharded_lookup(
        e, i, mesh=mesh, placement=p, axis="d"))(emb_sh, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6, rtol=1e-6)


def _emb_replicas_equal(arr):
    """All DCN replicas of a table-axis-sharded array hold identical data
    (addressable shards with the same 'd' coordinate must agree)."""
    # P("d") over a (h, d) mesh: jax keeps one logical array; fetching it
    # already asserts replica consistency, but check shard-by-shard too.
    by_d = {}
    for s in arr.addressable_shards:
        key = s.index  # identical slice => must be identical data
        got = np.asarray(s.data)
        if key in by_d:
            np.testing.assert_array_equal(got, by_d[key])
        else:
            by_d[key] = got


@pytest.mark.parametrize("n_hot,packed", [(1, True), (2, True), (1, False)])
def test_hybrid_train_step_matches_single_device(n_hot, packed, rng):
    config = dlrm_tpu.tiny_config(num_tables=7, rows=50, feature_size=8,
                                  n_hot=n_hot)
    config = dataclasses.replace(config, packed_tables=packed)
    params = dlrm_tpu.init_params(jax.random.key(7), config)
    dense, sparse, labels = _random_batch(rng, config, 32)
    sparse[1] = sparse[0]  # duplicate ids stress the folded scatter
    lr = 0.5

    ref_params, ref_loss = jax.jit(
        lambda p, d, s, l: train_step(p, d, s, l, config=config, lr=lr)
    )(params, jnp.asarray(dense), jnp.asarray(sparse), jnp.asarray(labels))

    mesh = make_mesh_2d(2, 4)
    p = plan_placement(config.table_sizes, 4,
                       pack=config.pack if packed else 1)
    sh_params = {
        "bottom": params["bottom"],
        "emb": pemb.shard_tables(params["emb"], p, config),
        "top": params["top"],
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    bs = batch_sharding(mesh)
    step = make_sharded_train_step(config, lr, mesh, p)
    new_params, loss = step(sh_params,
                            jax.device_put(jnp.asarray(dense), bs),
                            jax.device_put(jnp.asarray(sparse), bs),
                            jax.device_put(jnp.asarray(labels), bs))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    _emb_replicas_equal(new_params["emb"])
    got_emb = pemb.unshard_tables(np.asarray(new_params["emb"]), p, config)
    np.testing.assert_allclose(
        got_emb,
        emb_ops.unpack_tables(
            jax.tree.map(np.asarray, ref_params["emb"]), config),
        atol=1e-5, rtol=1e-5)
    for side in ("bottom", "top"):
        for i, layer in enumerate(new_params[side]):
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(layer[k]),
                    np.asarray(ref_params[side][i][k]),
                    atol=1e-5, rtol=1e-5, err_msg=f"{side}[{i}].{k}")


@pytest.mark.parametrize("n_hot", [1, 2])
def test_hybrid_all_placement_kinds(n_hot, rng):
    """slot + device row-sharded + host-resident row-sharded +
    column-sharded tables in ONE hybrid step on the (2, 4) mesh."""
    from dlrm_tpu.parallel import host_tier as ht
    from dlrm_tpu.train.metrics import evaluate, sharded_evaluate

    if not ht.host_memory_supported():
        pytest.skip("no pinned_host memory space")
    config = dlrm_tpu.tiny_config(num_tables=7, rows=64, feature_size=8,
                                  n_hot=n_hot)
    config = dataclasses.replace(
        config, table_sizes=(64, 400, 12, 300, 64, 50, 500),
        packed_tables=False)
    params = dlrm_tpu.init_params(jax.random.key(11), config)
    dense, sparse, labels = _random_batch(rng, config, 32)
    sparse[1] = sparse[0]
    lr = 0.5

    ref_params, ref_loss = jax.jit(
        lambda p, d, s, l: train_step(p, d, s, l, config=config, lr=lr)
    )(jax.tree.map(jnp.copy, params), jnp.asarray(dense),
      jnp.asarray(sparse), jnp.asarray(labels))

    mesh = make_mesh_2d(2, 4)
    p = plan_placement(config.table_sizes, 4, pack=1,
                       max_rows_per_shard=350,
                       col_sharded_tables=(3, 5), host_tables=(6,))
    assert p.row_sharded == (1, 6) and p.host_row_sharded == (6,)
    emb_np = np.asarray(params["emb"])
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(emb_np, p, config),
        "emb_h": pemb.shard_host_tables(emb_np, p, config),
        "emb_cs": pemb.shard_col_tables(emb_np, p, config),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    bs = batch_sharding(mesh)
    step = make_sharded_train_step(config, lr, mesh, p)
    new_params, loss = step(sh_params,
                            jax.device_put(jnp.asarray(dense), bs),
                            jax.device_put(jnp.asarray(sparse), bs),
                            jax.device_put(jnp.asarray(labels), bs))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)

    got = pemb.unshard_tables(np.asarray(new_params["emb"]), p, config,
                              host=np.asarray(new_params["emb_h"]))
    cs_tabs = pemb.unshard_col_tables(
        [np.asarray(a) for a in new_params["emb_cs"]], p)
    for k, t in enumerate(p.col_sharded):
        off = config.table_offsets[t]
        got[off:off + config.table_sizes[t]] = cs_tabs[k]
    np.testing.assert_allclose(got, np.asarray(ref_params["emb"]),
                               atol=1e-5, rtol=1e-5)

    # on-mesh eval on the 2-D mesh
    batch = {"dense": dense, "sparse": sparse, "labels": labels}
    m_sh = sharded_evaluate(new_params, [batch], config, mesh=mesh,
                            placement=p)
    host_params = {"bottom": jax.tree.map(jnp.asarray,
                                          new_params["bottom"]),
                   "emb": jnp.asarray(got),
                   "top": jax.tree.map(jnp.asarray, new_params["top"])}
    m_ref = evaluate(host_params, [batch], config)
    np.testing.assert_allclose(m_sh["loss"], m_ref["loss"], rtol=1e-5)
    assert m_sh["accuracy"] == m_ref["accuracy"]


@pytest.mark.parametrize("n_hot", [1, 2])
def test_hybrid_adagrad_step_matches_single_device(n_hot, rng):
    """Exact sparse Adagrad on the (2, 4) mesh: the DCN fold must sum a
    key's gradient across DCN replicas BEFORE the nonlinear accumulator
    update (dedup-then-apply, reference train.jl:276-290 contract)."""
    config = dlrm_tpu.tiny_config(num_tables=7, rows=50, feature_size=8,
                                  n_hot=n_hot)
    params = dlrm_tpu.init_params(jax.random.key(7), config)
    dense, sparse, labels = _random_batch(rng, config, 32)
    # cross-DCN-replica duplicates: same id in the first and second half
    # of the batch lands on different h-groups
    sparse[16] = sparse[0]
    lr = 0.5

    opt_step = make_jit_train_step_opt(config, optimizer="adagrad", lr=lr)
    opt0 = init_opt_state(params, config=config, optimizer="adagrad",
                          lr=lr)
    (ref_params, _), ref_loss = opt_step(
        jax.tree.map(jnp.copy, params), opt0, jnp.asarray(dense),
        jnp.asarray(sparse), jnp.asarray(labels))

    mesh = make_mesh_2d(2, 4)
    p = plan_placement(config.table_sizes, 4, pack=config.pack)
    sh_params = {
        "bottom": jax.tree.map(jnp.copy, params["bottom"]),
        "emb": pemb.shard_tables(params["emb"], p, config),
        "top": jax.tree.map(jnp.copy, params["top"]),
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    opt_sh = init_sharded_opt_state(sh_params, config=config,
                                    optimizer="adagrad", lr=lr, mesh=mesh)
    bs = batch_sharding(mesh)
    step = make_sharded_train_step_opt(config, optimizer="adagrad", lr=lr,
                                       mesh=mesh, placement=p)
    (new_params, _), loss = step(sh_params, opt_sh,
                                 jax.device_put(jnp.asarray(dense), bs),
                                 jax.device_put(jnp.asarray(sparse), bs),
                                 jax.device_put(jnp.asarray(labels), bs))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    got_emb = pemb.unshard_tables(np.asarray(new_params["emb"]), p, config)
    np.testing.assert_allclose(
        got_emb,
        emb_ops.unpack_tables(
            jax.tree.map(np.asarray, ref_params["emb"]), config),
        atol=1e-5, rtol=1e-5)


def test_hybrid_block_step_matches_sequential(rng):
    """Coalesced K-step block on the (2, 4) mesh: with no id repeats
    across micro-batches the block equals K sequential single-device
    steps exactly (the train_block contract, now DCN-folded)."""
    config = dlrm_tpu.tiny_config(num_tables=4, rows=128, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(3), config)
    K, b = 3, 32
    rngl = np.random.default_rng(99)
    dense = rngl.normal(size=(K, b, 13)).astype(np.float32)
    # one permutation of the 128 rows per table, sliced into K disjoint
    # b-sized micro-batches: no id repeats anywhere -> block is EXACT
    perms = [rngl.permutation(128) for _ in config.table_sizes]
    sparse = np.stack([
        np.stack([perm[k * b:(k + 1) * b] for perm in perms], axis=1)
        for k in range(K)]).astype(np.int32)
    labels = (rngl.random((K, b)) > 0.5).astype(np.float32)
    lr = 0.5

    # sequential oracle
    seq = jax.tree.map(jnp.copy, params)
    for k in range(K):
        seq, _ = jax.jit(
            lambda p, d, s, l: train_step(p, d, s, l, config=config, lr=lr)
        )(seq, jnp.asarray(dense[k]), jnp.asarray(sparse[k]),
          jnp.asarray(labels[k]))

    mesh = make_mesh_2d(2, 4)
    p = plan_placement(config.table_sizes, 4, pack=config.pack)
    sh_params = {
        "bottom": params["bottom"],
        "emb": pemb.shard_tables(params["emb"], p, config),
        "top": params["top"],
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    bbs = block_batch_sharding(mesh)
    blk = make_sharded_train_block(config, lr, mesh, p)
    new_params, losses = blk(sh_params,
                             jax.device_put(jnp.asarray(dense), bbs),
                             jax.device_put(jnp.asarray(sparse), bbs),
                             jax.device_put(jnp.asarray(labels), bbs))
    assert losses.shape == (K,)
    got_emb = pemb.unshard_tables(np.asarray(new_params["emb"]), p, config)
    want_emb = emb_ops.unpack_tables(
        jax.tree.map(np.asarray, seq["emb"]), config)
    np.testing.assert_allclose(got_emb, want_emb, atol=1e-5, rtol=1e-5)
    # dense params are carried (never stale) through the block
    for side in ("bottom", "top"):
        for i, layer in enumerate(new_params[side]):
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(layer[k]), np.asarray(seq[side][i][k]),
                    atol=1e-5, rtol=1e-5, err_msg=f"{side}[{i}].{k}")


def test_hybrid_mesh_ckpt_eval_roundtrip(tmp_path, capsys):
    """A --mesh-shape run's checkpoint records num_shards = the ICI axis
    size, so eval/predict rebuild the placement correctly (the DCN axis
    only replicated — the checkpointed emb stack is (ici, local, W))."""
    import json as _json
    import os
    from dlrm_tpu import run as cli
    from dlrm_tpu.data import synthetic
    from dlrm_tpu.data.criteo import DAC_DTYPE
    import numpy as _np

    lines = synthetic.criteo_text_lines(120, seed=7)
    src = tmp_path / "day.txt"
    src.write_text("".join(lines))
    out = str(tmp_path / "data.bin")
    rc = cli.main(["preprocess", str(src), "--out", out])
    capsys.readouterr()
    sizes = ",".join("1000" for _ in range(26))
    ckpt = str(tmp_path / "ck")
    common = ["--config", "tiny", "--table-sizes", sizes,
              "--batch-size", "16"]
    rc = cli.main([
        "train", *common, "--data", out, "--sharded", "true",
        "--mesh-shape", "2x4", "--log-every", "2", "--ckpt-dir", ckpt,
        "--save-interval", "100", "--eval-after"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and res["steps"] == 7
    meta = _json.load(open(os.path.join(ckpt, "run_meta.json")))
    assert meta["num_shards"] == 4 and meta["mesh_shape"] == [2, 4]

    rc = cli.main(["eval", *common, "--data", out, "--ckpt-dir", ckpt])
    ev = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    np.testing.assert_allclose(ev["loss"], res["eval"]["loss"],
                               rtol=1e-5, atol=1e-6)


def test_train_cli_hybrid_mesh(capsys):
    """--mesh-shape 2x4 end-to-end via the CLI (train + eval-after +
    block mode on the hybrid mesh)."""
    import json
    from dlrm_tpu import run as cli

    for extra in (["--paranoid", "2"], ["--update-interval", "2"],
                  ["--optimizer", "adagrad"]):
        rc = cli.main([
            "train", "--config", "tiny", "--batch-size", "32",
            "--steps", "4", "--sharded", "true", "--mesh-shape", "2x4",
            "--log-every", "2", "--eval-after", "--eval-steps", "2",
            *extra])
        out = capsys.readouterr().out.strip().splitlines()
        res = json.loads(out[-1])
        assert rc == 0 and res["steps"] == 4
        assert np.isfinite(res["final_loss"])
        assert 0.0 <= res["eval"]["accuracy"] <= 1.0


def test_dcn_replica_check_detects_divergence(rng):
    """--paranoid's runtime guard (make_dcn_replica_check): passes on a
    genuinely replicated table stack AFTER real folded updates, and
    catches a single-ULP divergence injected on one DCN replica — the
    exact bug class the check_vma=False disable on the update bodies
    could otherwise let ship silently."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = dlrm_tpu.tiny_config(num_tables=4, rows=64, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(11), c)
    mesh = make_mesh_2d(2, 4)
    p = plan_placement(c.table_sizes, 4, pack=c.pack)
    sh_params = {
        "bottom": params["bottom"],
        "emb": jnp.asarray(pemb.shard_tables(params["emb"], p, c)),
        "top": params["top"],
    }
    sh_params = jax.device_put(sh_params, param_shardings(mesh, sh_params))
    step = make_sharded_train_step(c, 0.1, mesh, p)
    bs = batch_sharding(mesh)
    dense, sparse, labels = _random_batch(rng, c, 32)
    sh_params, _ = step(sh_params, jax.device_put(jnp.asarray(dense), bs),
                        jax.device_put(jnp.asarray(sparse), bs),
                        jax.device_put(jnp.asarray(labels), bs))

    check = pemb.make_dcn_replica_check(mesh)
    assert check is not None
    assert bool(np.asarray(check(sh_params)).all())
    assert pemb.make_dcn_replica_check(make_mesh(8)) is None

    # inject a one-ULP divergence on DCN replica h=1 only, via a body
    # that CLAIMS replication (check_vma off) — the paranoid check must
    # catch what the static checker cannot
    def poison(emb):
        h = jax.lax.axis_index("h")
        bump = jnp.where(h == 1, jnp.float32(1e-7), 0.0)
        return emb.at[0, 0, 0].add(bump)

    poisoned = jax.shard_map(
        poison, mesh=mesh, in_specs=P("d"), out_specs=P("d"),
        check_vma=False)(sh_params["emb"])
    bad = dict(sh_params)
    bad["emb"] = poisoned
    assert not bool(np.asarray(check(bad)).all())
