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
