"""Host-tier layout probe: (N, D) vs flattened 1-D pinned-host stack.

The round-4 profiler trace of the tiered step (artifacts/r4_tpu) showed
the updated host stack being staged through the DEVICE every step:
the host scatter's result carries linear host layout {1,0:T(1)L(1024)}
while the jit-boundary pinned_host buffer is device-tiled
{0,1:T(8,128)S(5)}, so XLA inserts full-stack layout conversions
(reshape + copy on device + 44 ms copy back to S(5) for a 620 MB stack)
in BOTH directions.  A 1-D buffer has the same layout in host-linear and
device-tiled form, so carrying the stack flattened across the jit
boundary (reshaping to (N, D) inside the compute_on("device_host")
region, where a reshape of a linear buffer is a bitcast) should remove
both conversions; with donation the host scatter may alias in-place too.

This probe times one gather+scatter "step" both ways on a stack big
enough for the conversion to dominate.  Run on the real chip:
``python bench_hosttier_layout.py [rows]``.
"""

import sys
import time

import numpy as np

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
D = 16
B = 8192
ITERS = (4, 12)


def main():
    from bench_util import init_devices
    devices = init_devices("hosttier_layout_probe", timeout_s=300.0)
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import compute_on

    dev = devices[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)
    sh_host = jax.sharding.SingleDeviceSharding(dev,
                                                memory_kind="pinned_host")

    def raw_gather(table, flat_ids):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return lax.gather(table, flat_ids[:, None], dn,
                          slice_sizes=(1, table.shape[1]),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def raw_scatter_add(table, flat_ids, updates):
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        return lax.scatter_add(table, flat_ids[:, None], updates, dn,
                               mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    # -- variant A: (N, D) stack across the jit boundary (current design)
    def step_2d(stack, ids, k):
        ids = (ids + k) % ROWS
        ids_h = jax.device_put(ids, jax.memory.Space.Host)
        stack = jax.device_put(stack, jax.memory.Space.Host)
        with compute_on.compute_on("device_host"):
            rows = raw_gather(stack, ids_h)
        rows_d = jax.device_put(rows, jax.memory.Space.Device)
        upd = -0.01 * rows_d
        upd_h = jax.device_put(upd, jax.memory.Space.Host)
        with compute_on.compute_on("device_host"):
            new = raw_scatter_add(stack, ids_h, upd_h)
        return new, jnp.sum(rows_d), k + 1

    # -- variant B: 1-D stack across the boundary, bitcast-reshaped on host
    def step_1d(flat, ids, k):
        ids = (ids + k) % ROWS
        ids_h = jax.device_put(ids, jax.memory.Space.Host)
        flat = jax.device_put(flat, jax.memory.Space.Host)
        with compute_on.compute_on("device_host"):
            stack = flat.reshape(ROWS, D)
            rows = raw_gather(stack, ids_h)
        rows_d = jax.device_put(rows, jax.memory.Space.Device)
        upd = -0.01 * rows_d
        upd_h = jax.device_put(upd, jax.memory.Space.Host)
        with compute_on.compute_on("device_host"):
            new = raw_scatter_add(flat.reshape(ROWS, D), ids_h,
                                  upd_h).reshape(ROWS * D)
        return new, jnp.sum(rows_d), k + 1

    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, ROWS, size=B).astype(np.int32))

    results = {}
    for name, step, shape in (("2d", step_2d, (ROWS, D)),
                              ("1d", step_1d, (ROWS * D,))):
        stack = jax.device_put(
            jnp.zeros(shape, jnp.float32) + 0.5, sh_host)
        jit_step = jax.jit(step, donate_argnums=(0,),
                           out_shardings=(sh_host, None, None))
        k = jnp.int32(0)
        t0 = time.time()
        for _ in range(2):
            stack, s, k = jit_step(stack, ids0, k)
        _ = float(s)
        compile_s = time.time() - t0
        ts = []
        for n in ITERS:
            t0 = time.perf_counter()
            for _ in range(n):
                stack, s, k = jit_step(stack, ids0, k)
            _ = float(s)
            ts.append(time.perf_counter() - t0)
        ms = (ts[1] - ts[0]) / (ITERS[1] - ITERS[0]) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/step (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
        del stack, jit_step

    import json
    print(json.dumps({"metric": "hosttier_layout_probe", "rows": ROWS,
                      "ms_2d": round(results["2d"], 2),
                      "ms_1d": round(results["1d"], 2),
                      "value": round(results["2d"] / results["1d"], 2),
                      "unit": "speedup_1d_over_2d"}))


if __name__ == "__main__":
    main()
