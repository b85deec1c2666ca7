"""fs=128 operating-point tuning sweeps (VERDICT r3 item 2).

At the MLPerf/Terabyte feature size (criteo.jl:379-406) lane packing
disables (pack = 128/128 = 1) and every constant tuned at fs=16 is on
different footing:

* the 16 MB chunk budget (per-chunk scatter fixed costs vs the >1 GiB
  density cliff trade differently at 256 B/row),
* the 8192-row small-table threshold (the one-hot MXU path costs 8x the
  FLOPs per row at fs=128, while scatter cost per row also grows 8x),
* the gram-vs-pallas interaction choice (bench.py measures that one
  end-to-end already).

Tables are bf16 (f32 Kaggle tables at fs=128 are 17.3 GB > one v5e's
16 GB HBM; bf16 = 8.6 GB — the reference's BF16-embeddings experiment).

Run on the real chip:
    python bench_fs128_tune.py budgets 16 64 256
    python bench_fs128_tune.py thresholds 0 2048 8192 32768
Prints one JSON line per point and a summary; feed winners into
config.py defaults keyed off ``config.pack``.
"""

import json
import sys
import time

import numpy as np

B = 32768


def _init_devices(timeout_s: float = 300.0):
    from bench_util import init_devices

    return init_devices("fs128_tune", timeout_s=timeout_s)


def measure_step(config, rng, n1=3, n2=9):
    import jax
    import jax.numpy as jnp
    import dlrm_tpu

    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))
    sparse = jnp.asarray(np.stack(
        [rng.integers(0, s, size=B) for s in config.table_sizes],
        axis=1).astype(np.int32))
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    step = dlrm_tpu.make_jit_train_step(config, lr=0.1)
    for _ in range(3):
        params, loss = step(params, dense, sparse, labels)
    _ = float(loss)
    totals = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(n):
            params, loss = step(params, dense, sparse, labels)
        _ = float(loss)
        totals.append(time.perf_counter() - t0)
    del params, step
    return (totals[1] - totals[0]) / (n2 - n1)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "budgets"
    defaults = {
        "budgets": [16, 64, 256, 1024],
        "thresholds": [0, 2048, 8192, 32768],
    }
    if mode not in defaults:
        raise SystemExit(f"mode must be one of {sorted(defaults)}, "
                         f"got {mode!r}")
    points = [int(a) for a in sys.argv[2:]] or defaults[mode]
    _init_devices()
    import jax
    import jax.numpy as jnp
    import dlrm_tpu

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    results = {}
    for p in points:
        kw = {"feature_size": 128, "embedding_dtype": jnp.bfloat16}
        if mode == "budgets":
            kw["chunk_budget_bytes"] = p << 20
            kw["deep_chunk_budget_bytes"] = p << 20
        else:
            kw["small_table_threshold"] = p
        config = dlrm_tpu.kaggle_config(**kw)
        t0 = time.time()
        t = measure_step(config, rng)
        results[p] = t * 1e3
        print(json.dumps({mode[:-1]: p,
                          "ms_per_step": round(t * 1e3, 3),
                          "examples_per_s": round(B / t, 1),
                          "num_chunks": config.num_chunks,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    best = min(results, key=results.get)
    print(json.dumps({"metric": f"fs128_tune_{mode}",
                      "best": best,
                      "best_ms_per_step": round(results[best], 3),
                      "value": round(B / (results[best] / 1e3), 1),
                      "unit": "examples/s/chip"}))


if __name__ == "__main__":
    main()
