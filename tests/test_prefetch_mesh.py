"""Input prefetch pipeline and mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dlrm_tpu
from dlrm_tpu.data import synthetic
from dlrm_tpu.data.prefetch import device_prefetch
from dlrm_tpu.parallel.mesh import (batch_sharding, make_hybrid_mesh,
                                    make_mesh)


def test_prefetch_preserves_order_and_content():
    config = dlrm_tpu.tiny_config()
    src = list(synthetic.batch_stream(config, 16, steps=7))
    got = list(device_prefetch(iter(src), size=3))
    assert len(got) == 7
    for want, have in zip(src, got):
        for k in want:
            assert isinstance(have[k], jax.Array)
            np.testing.assert_array_equal(np.asarray(have[k]), want[k])


def test_prefetch_propagates_source_exception():
    def bad():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom")

    it = device_prefetch(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_sharded_placement():
    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    config = dlrm_tpu.tiny_config()
    src = synthetic.batch_stream(config, 32, steps=3)
    for b in device_prefetch(src, sharding=bs):
        assert b["dense"].sharding == bs
        assert b["dense"].shape == (32, 13)


def test_prefetch_trains_end_to_end():
    """The training loop consumes a prefetched stream unchanged."""
    config = dlrm_tpu.tiny_config()
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    stream = device_prefetch(
        synthetic.batch_stream(config, 32, steps=5), size=2)
    out = dlrm_tpu.train(params, stream, config=config, lr=0.1)
    assert len(out["losses"]) == 5
    assert all(np.isfinite(l) for l in out["losses"])


def test_hybrid_mesh_single_host():
    """On one host the hybrid mesh degenerates to (1, n_local) and shards
    compose with the batch axis."""
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("h", "d")
    assert mesh.devices.shape == (1, jax.local_device_count())
    x = jnp.arange(16.0).reshape(16, 1)
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(("h", "d")))
    y = jax.device_put(x, sh)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
