"""B=2048 (reference experiment batch, script.jl:13) chunk-budget sweep.

The 16 MB chunk budget was tuned at B=32768, where per-chunk scatter
fixed costs amortize over 32k ids.  At B=2048 each chunk sees ~2k ids;
the round-3 floors re-validation showed scatter marginal cost ~0 into
<= 16 MB operands but per-op dispatch still costs something — this sweep
probes whether fewer/bigger chunks (or one giant chunk) win at small
batch.  Feed the winner into config.auto_chunk_budget_bytes.

Run on the real chip: ``python bench_b2048.py [budgets_mb...]``.
Prints one JSON line per budget and a final summary line.
"""

import json
import os
import sys
import time

import numpy as np

# override to sweep another batch size (e.g. to place the threshold in
# config.auto_chunk_budget_bytes from data): SWEEP_BATCH=8192 python ...
B = int(os.environ.get("SWEEP_BATCH", "2048"))
DEFAULT_BUDGETS_MB = (16, 64, 256, 1024, 4096)


def _init_devices(timeout_s: float = 300.0):
    from bench_util import init_devices

    return init_devices(f"b{B}_chunk_sweep", timeout_s=timeout_s)


def slope(fn, state, n1=10, n2=40):
    """Two-window marginal timing (axon-safe: one float() sync per window,
    state chained through the step so no call is memoizable)."""
    for _ in range(3):
        state = fn(state)
    _ = float(__import__("jax").tree.leaves(state)[0].ravel()[0])
    ts = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(n):
            state = fn(state)
        _ = float(__import__("jax").tree.leaves(state)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (n2 - n1), state


def main():
    budgets = ([int(a) for a in sys.argv[1:]]
               or list(DEFAULT_BUDGETS_MB))
    devices = _init_devices()
    import jax
    import jax.numpy as jnp
    import dlrm_tpu

    print(f"device: {devices[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))

    results = {}
    for mb in budgets:
        config = dlrm_tpu.kaggle_config(feature_size=16,
                                        chunk_budget_bytes=mb << 20,
                                        deep_chunk_budget_bytes=mb << 20)
        sparse = jnp.asarray(np.stack(
            [rng.integers(0, s, size=B) for s in config.table_sizes],
            axis=1).astype(np.int32))
        params = dlrm_tpu.init_params(jax.random.key(0), config)
        step = dlrm_tpu.make_jit_train_step(config, lr=0.1)

        def fn(p):
            p, _loss = step(p, dense, sparse, labels)
            return p

        t0 = time.time()
        t, params = slope(fn, params)
        results[mb] = t * 1e3
        print(json.dumps({"budget_mb": mb, "ms_per_step": round(t * 1e3, 3),
                          "examples_per_s": round(B / t, 1),
                          "num_chunks": config.num_chunks,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
        del params, step

    best = min(results, key=results.get)
    print(json.dumps({"metric": f"b{B}_chunk_sweep",
                      "best_budget_mb": best,
                      "best_ms_per_step": round(results[best], 3),
                      "value": round(B / (results[best] / 1e3), 1),
                      "unit": "examples/s/chip"}))


if __name__ == "__main__":
    main()
