"""Host-tier follow-up probe (round 5): where do the remaining ms go
after the flat-1-D carry (bench_hosttier_layout.py: 89.75 -> 67.25 ms)?

Decomposes the 1-D-layout tiered step into gather-only / scatter-only /
both, across stack sizes.  If scatter-only time scales ~linearly with
ROWS, the functional host scatter still copies the whole stack (donation
did not alias in place) and the next lever is an aliasing-friendly
formulation; if it is flat, the cost is per-row and we are at the floor.

Run on the real chip: ``python bench_hosttier_scatter.py``.
"""

import json
import sys
import time

import numpy as np

D = 16
B = 8192
ITERS = (4, 12)


def main():
    from bench_util import init_devices
    devices = init_devices("hosttier_scatter_probe", timeout_s=300.0)
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

    results = {}
    rng = np.random.default_rng(0)

    for rows in (1_000_000, 4_000_000, 8_000_000):
        ids0 = jnp.asarray(rng.integers(0, rows, size=B).astype(np.int32))
        upd0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def step_gather(flat, ids, k):
            ids = (ids + k) % rows
            ids_h = jax.device_put(ids, jax.memory.Space.Host)
            flat = jax.device_put(flat, jax.memory.Space.Host)
            with compute_on.compute_on("device_host"):
                rows_g = raw_gather(flat.reshape(rows, D), ids_h)
            rows_d = jax.device_put(rows_g, jax.memory.Space.Device)
            return flat, jnp.sum(rows_d), k + 1

        def step_scatter(flat, ids, k):
            ids = (ids + k) % rows
            ids_h = jax.device_put(ids, jax.memory.Space.Host)
            upd_h = jax.device_put(upd0 * (1.0 + k), jax.memory.Space.Host)
            flat = jax.device_put(flat, jax.memory.Space.Host)
            with compute_on.compute_on("device_host"):
                new = raw_scatter_add(flat.reshape(rows, D), ids_h,
                                      upd_h).reshape(rows * D)
            return new, jnp.float32(0), k + 1

        def step_both(flat, ids, k):
            ids = (ids + k) % rows
            ids_h = jax.device_put(ids, jax.memory.Space.Host)
            flat = jax.device_put(flat, jax.memory.Space.Host)
            with compute_on.compute_on("device_host"):
                rows_g = raw_gather(flat.reshape(rows, D), ids_h)
            rows_d = jax.device_put(rows_g, jax.memory.Space.Device)
            upd = -0.01 * rows_d
            upd_h = jax.device_put(upd, jax.memory.Space.Host)
            with compute_on.compute_on("device_host"):
                new = raw_scatter_add(flat.reshape(rows, D), ids_h,
                                      upd_h).reshape(rows * D)
            return new, jnp.sum(rows_d), k + 1

        for name, fn in (("gather", step_gather), ("scatter", step_scatter),
                         ("both", step_both)):
            stack = jax.device_put(
                jnp.zeros((rows * D,), jnp.float32) + 0.5, sh_host)
            jit_step = jax.jit(fn, donate_argnums=(0,),
                               out_shardings=(sh_host, None, None))
            k = jnp.int32(0)
            for _ in range(2):
                stack, s, k = jit_step(stack, ids0, k)
            _ = float(s)
            ts = []
            for n in ITERS:
                t0 = time.perf_counter()
                for _ in range(n):
                    stack, s, k = jit_step(stack, ids0, k)
                _ = float(s)
                ts.append(time.perf_counter() - t0)
            ms = (ts[1] - ts[0]) / (ITERS[1] - ITERS[0]) * 1e3
            results[f"{name}_{rows}"] = round(ms, 2)
            print(f"rows={rows:>9,} {name:>7}: {ms:7.2f} ms/step",
                  file=sys.stderr, flush=True)
            del stack, jit_step

    print(json.dumps({"metric": "hosttier_scatter_probe", **results}))


if __name__ == "__main__":
    main()
