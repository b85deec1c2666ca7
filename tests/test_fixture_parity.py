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
