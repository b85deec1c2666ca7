"""Metrics (AUC/accuracy/Every) and telemetry (instrumented step) tests."""

import numpy as np
import jax
import jax.numpy as jnp

import dlrm_tpu
from dlrm_tpu.data.synthetic import random_batch
from dlrm_tpu.train import metrics
from dlrm_tpu.train.train import train_step
from dlrm_tpu.utils.telemetry import InstrumentedTrainer, Recorder


def test_auc_exact_known_values():
    # hand-computable: perfect ranking -> 1.0; inverted -> 0.0; random ties
    assert metrics.auc_roc([0.1, 0.2, 0.8, 0.9], [0, 0, 1, 1]) == 1.0
    assert metrics.auc_roc([0.9, 0.8, 0.2, 0.1], [0, 0, 1, 1]) == 0.0
    # all-tied predictions -> 0.5
    assert metrics.auc_roc([0.5, 0.5, 0.5, 0.5], [0, 1, 0, 1]) == 0.5
    # degenerate labels -> nan
    assert np.isnan(metrics.auc_roc([0.5, 0.6], [1, 1]))


def test_streaming_auc_matches_exact(rng):
    preds = rng.random(5000).astype(np.float32)
    labels = (rng.random(5000) < preds).astype(np.float32)  # informative
    exact = metrics.auc_roc(preds, labels)
    s = metrics.StreamingAUC(num_buckets=1 << 14)
    for i in range(0, 5000, 1250):
        s.update(jnp.asarray(preds[i:i + 1250]),
                 jnp.asarray(labels[i:i + 1250]))
    assert abs(s.compute() - exact) < 2e-3
    s.reset()
    assert np.isnan(s.compute())


def test_every_combinator():
    calls = []
    e = metrics.Every(lambda: calls.append(1), 3)
    for _ in range(10):
        e()
    assert len(calls) == 3  # fired at 3, 6, 9


def test_evaluate_end_to_end(rng):
    config = dlrm_tpu.tiny_config(num_tables=3, rows=32, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    batches = [random_batch(rng, config, 128) for _ in range(4)]
    record = []
    out = metrics.evaluate(params, batches, config, record=record)
    assert out["examples"] == 512
    assert 0.0 <= out["accuracy"] <= 1.0
    assert record == [out["accuracy"]]
    assert np.isfinite(out["loss"])


def test_instrumented_step_matches_train_step(rng):
    """The telemetry path must be numerically identical to the fused step."""
    config = dlrm_tpu.tiny_config(num_tables=4, rows=40, feature_size=8)
    params = dlrm_tpu.init_params(jax.random.key(3), config)
    batch = random_batch(rng, config, 64)
    ref_params, ref_loss = jax.jit(
        lambda p, d, s, l: train_step(p, d, s, l, config=config, lr=0.3)
    )(params, jnp.asarray(batch["dense"]), jnp.asarray(batch["sparse"]),
      jnp.asarray(batch["labels"]))

    rec = Recorder()
    trainer = InstrumentedTrainer(config, lr=0.3)
    got_params, got_loss = trainer.step(params, batch, cb=rec)

    np.testing.assert_allclose(got_loss, float(ref_loss), rtol=1e-6)
    flat_ref = jax.tree.leaves(ref_params)
    flat_got = jax.tree.leaves(got_params)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    # all reference phase symbols fired, in order
    syms = [s for s, _ in rec.events]
    expected = ["start", "lookup", "bottom_mlp", "interaction", "top_mlp",
                "loss", "loss_back", "top_mlp_back", "interaction_back",
                "bottom_mlp_back", "lookup_back", "grads_done",
                "weight_update_done", "embedding_update_done", "update_done"]
    assert syms == expected
    assert set(trainer and rec.summary()) >= {"lookup", "loss_back"}


def test_instrumented_multihot(rng):
    config = dlrm_tpu.tiny_config(num_tables=3, rows=30, feature_size=8,
                                  n_hot=2)
    params = dlrm_tpu.init_params(jax.random.key(4), config)
    batch = random_batch(rng, config, 32)
    ref_params, ref_loss = jax.jit(
        lambda p, d, s, l: train_step(p, d, s, l, config=config, lr=0.3)
    )(params, jnp.asarray(batch["dense"]), jnp.asarray(batch["sparse"]),
      jnp.asarray(batch["labels"]))
    got_params, got_loss = InstrumentedTrainer(config, lr=0.3).step(
        params, batch)
    np.testing.assert_allclose(got_loss, float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_params["emb"]),
                               np.asarray(ref_params["emb"]),
                               atol=1e-6, rtol=1e-6)
