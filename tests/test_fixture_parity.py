"""Cross-framework golden tests against the PyTorch HDF5 fixtures.

Mirrors the reference's test/integration.jl + src/validation.jl protocol:
stage-by-stage inference parity, then full one-SGD-step parity (grads,
updated weights, updated embeddings) at lr=10.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import FIXTURE_MULTI, FIXTURE_SINGLE, requires_fixtures

from dlrm_tpu.io import hdf5 as h5io
from dlrm_tpu.models import dlrm as model_lib
from dlrm_tpu.ops import embedding as emb_ops
from dlrm_tpu.ops.interaction import dot_interaction
from dlrm_tpu.ops.loss import bce_loss
from dlrm_tpu.ops.mlp import mlp_apply
from dlrm_tpu import validation

FIXTURES = [FIXTURE_SINGLE, FIXTURE_MULTI]


@requires_fixtures
@pytest.mark.parametrize("path", FIXTURES)
def test_stagewise_inference_parity(path):
    params, config = h5io.load_params(path)
    inputs = h5io.load_inputs(path)
    ref = h5io.load_reference_outputs(path)
    params = jax.tree.map(jnp.asarray, params)

    x = mlp_apply(params["bottom"], jnp.asarray(inputs["dense"]),
                  final="relu")
    np.testing.assert_allclose(np.asarray(x), ref["mlp_bottom"],
                               atol=1e-5, rtol=1e-5)

    pooled = emb_ops.pool(emb_ops.gather_tables(
        params["emb"], jnp.asarray(inputs["sparse"]), config))
    # concatenated_result is (B, 1+T, D) with slot 0 = bottom MLP output.
    np.testing.assert_allclose(np.asarray(pooled),
                               ref["concatenated_result"][:, 1:, :],
                               atol=1e-5, rtol=1e-5)

    z = dot_interaction(x, pooled, pad_to=config.interaction_pad_to)
    np.testing.assert_allclose(np.asarray(z), ref["output_interaction"],
                               atol=1e-4, rtol=1e-4)

    out = mlp_apply(params["top"], z, final="sigmoid")
    np.testing.assert_allclose(np.asarray(out), ref["mlp_top"],
                               atol=1e-5, rtol=1e-5)

    loss = bce_loss(out[:, 0], jnp.asarray(inputs["labels"]))
    np.testing.assert_allclose(float(loss), float(ref["loss"]),
                               atol=1e-5, rtol=1e-5)


@requires_fixtures
@pytest.mark.parametrize("path", FIXTURES)
def test_packaged_forward_matches_stagewise(path):
    """Invariance test protecting the comparison methodology
    (reference test/model/model.jl:39-75)."""
    params, config = h5io.load_params(path)
    inputs = h5io.load_inputs(path)
    params = jax.tree.map(jnp.asarray, params)
    packaged = model_lib.forward(params, jnp.asarray(inputs["dense"]),
                                 jnp.asarray(inputs["sparse"]), config)
    x = mlp_apply(params["bottom"], jnp.asarray(inputs["dense"]),
                  final="relu")
    # same lookup op as the packaged forward (mixed strategy engine)
    pooled = emb_ops.mixed_lookup(params["emb"],
                                  jnp.asarray(inputs["sparse"]), config)
    z = dot_interaction(x, pooled, pad_to=config.interaction_pad_to)
    manual = mlp_apply(params["top"], z, final="sigmoid")[:, 0]
    np.testing.assert_array_equal(np.asarray(packaged), np.asarray(manual))


@requires_fixtures
@pytest.mark.parametrize("path", FIXTURES)
def test_one_step_training_parity(path):
    """Full validate() protocol: grads + post-SGD-step weights vs PyTorch."""
    report = validation.validate(path, learning_rate=10.0)
    assert all(v["ok"] for v in report.values()), report


def test_model_zoo_constants_and_size_math():
    """Pin the model-zoo constants and derived size math to the reference
    spec (criteo.jl:350-433, model.jl:220-229): a drive-by edit to a
    table size or MLP shape must fail a test, not silently change the
    model."""
    import dlrm_tpu

    assert len(dlrm_tpu.KAGGLE_TABLE_SIZES) == 26
    assert sum(dlrm_tpu.KAGGLE_TABLE_SIZES) == 33_762_577  # ~33.76M rows
    assert len(dlrm_tpu.TERABYTE_TABLE_SIZES) == 26
    assert sum(dlrm_tpu.TERABYTE_TABLE_SIZES) == 882_774_559

    k = dlrm_tpu.kaggle_config()
    # bottom [13,512,256,fs]; top input = fs + F(F-1)/2 with F = 27
    # (26 tables + the dense feature row), criteo.jl:408-433
    assert k.feature_size == 16 and k.top_input == 16 + 27 * 26 // 2
    assert k.bottom_mlp_sizes == (13, 512, 256, 16)
    assert k.top_mlp_sizes == (1024, 1024, 512, 256, 1)
    assert k.total_rows == 33_762_577

    t = dlrm_tpu.terabyte_config()
    assert t.feature_size == 128 and t.top_input == 128 + 27 * 26 // 2
    assert t.pack == 1 and t.is_packed  # chunked storage stays on

    f = dlrm_tpu.fixture_config()
    m = dlrm_tpu.multi_fixture_config()
    assert f.table_sizes == (1000,) * 7 and f.n_hot == 1 and m.n_hot == 10


def test_hdf5_roundtrip_preserves_interaction_padding(tmp_path):
    """A model exported from a --pad-to run must reload with the same
    (padded) topology: load_params infers the padding from the top MLP's
    input width, so forward() reproduces the original outputs exactly."""
    import dataclasses
    import dlrm_tpu

    config = dataclasses.replace(
        dlrm_tpu.tiny_config(num_tables=4, rows=32, feature_size=8),
        interaction_pad_to=64)
    params = dlrm_tpu.init_params(jax.random.key(4), config)
    path = str(tmp_path / "m.h5")
    h5io.save_params(path, params, config)
    params2, config2 = h5io.load_params(path)
    # raw width 8 + 5*4/2 = 18 -> padded to 64; reloaded config must
    # reproduce the padded width (the multiple itself is not recoverable
    # and does not matter — only the width does)
    assert config2.top_input == config.top_input == 64
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(16, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack(
        [rng.integers(0, s, size=16) for s in config.table_sizes],
        axis=1).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(model_lib.forward(params, dense, sparse, config)),
        np.asarray(model_lib.forward(
            jax.tree.map(jnp.asarray, params2), dense, sparse, config2)),
        atol=1e-6)


def test_checkpoint_layout_interop(tmp_path):
    """save_checkpoint's flat <dir>/<step> layout and CheckpointManager's
    <step>/default nesting restore through BOTH entry points, and
    shardings-without-template is rejected loudly."""
    import dlrm_tpu
    from dlrm_tpu.io.checkpoint import (CheckpointManager,
                                        restore_checkpoint,
                                        save_checkpoint)

    config = dlrm_tpu.tiny_config(num_tables=3, rows=16, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    flat = str(tmp_path / "flat")
    save_checkpoint(flat, 5, params)
    # module-level restore (already supported)
    p1, step1 = restore_checkpoint(flat)
    assert step1 == 5
    # manager restore over the flat layout (the interop fix)
    mgr = CheckpointManager(flat, save_interval=1)
    p2, step2 = mgr.restore_latest()
    mgr.close()
    assert step2 == 5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="shardings requires template"):
        restore_checkpoint(flat, shardings={"x": None})
