"""Does splitting the pinned-host stack into S segments parallelize the
functional host scatter?

The tiered step's dominant cost is ONE compute_on("device_host") scatter
whose output copies the whole stack (~11 GB/s, bench_hosttier_scatter).
If XLA schedules independent host computations concurrently (separate
host threads), carrying the stack as S row-range segments and issuing S
masked scatters (each sees all B ids, clamped to a trash row with
zeroed updates when not owned) would cut the serial copy to ~1/S.
If host calls serialize, the split only adds per-call overhead.

Run on the chip: ``python bench_hosttier_split.py [rows]``.
"""

import json
import sys
import time

import numpy as np

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
D = 16
B = 8192
ITERS = (3, 9)


def main():
    from bench_util import init_devices
    devices = init_devices("hosttier_split_probe", timeout_s=300.0)
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import compute_on

    dev = devices[0]
    sh_host = jax.sharding.SingleDeviceSharding(dev,
                                                memory_kind="pinned_host")

    def raw_scatter_add(table, flat_ids, updates):
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        return lax.scatter_add(table, flat_ids[:, None], updates, dn,
                               mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, ROWS, size=B).astype(np.int32))
    upd0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    out = {"metric": "hosttier_split_probe", "rows": ROWS}

    for S in (1, 2, 4, 8):
        seg_rows = (ROWS + S - 1) // S
        # each segment gets seg_rows + 1 rows; the last row is the trash
        # slot for ids it does not own
        def step(segs, ids, k):
            ids = (ids + k) % ROWS
            ids_h = jax.device_put(ids, jax.memory.Space.Host)
            upd_h = jax.device_put(upd0 * (1.0 + k),
                                   jax.memory.Space.Host)
            new = []
            for j, seg in enumerate(segs):
                seg = jax.device_put(seg, jax.memory.Space.Host)
                with compute_on.compute_on("device_host"):
                    local = ids_h - j * seg_rows
                    own = ((local >= 0) & (local < seg_rows)
                           ).astype(jnp.int32)
                    # integer blend instead of jnp.where: the where
                    # wrapper materializes its scalar branch in default
                    # memory and poisons host-space type checking
                    loc = local * own + seg_rows * (1 - own)
                    u = upd_h * own.astype(upd_h.dtype)[:, None]
                    new.append(raw_scatter_add(
                        seg.reshape(seg_rows + 1, D), loc,
                        u).reshape(seg.shape))
            return tuple(new), jnp.float32(0), k + 1

        segs = tuple(
            jax.device_put(jnp.zeros(((seg_rows + 1) * D,), jnp.float32),
                           sh_host) for _ in range(S))
        jit_step = jax.jit(step, donate_argnums=(0,),
                           out_shardings=(tuple(sh_host for _ in range(S)),
                                          None, None))
        k = jnp.int32(0)
        s = None
        for _ in range(2):
            segs, s, k = jit_step(segs, ids0, k)
        _ = float(s)
        jax.block_until_ready(segs)
        ts = []
        for n in ITERS:
            t0 = time.perf_counter()
            for _ in range(n):
                segs, s, k = jit_step(segs, ids0, k)
            _ = float(s)
            jax.block_until_ready(segs)
            ts.append(time.perf_counter() - t0)
        ms = (ts[1] - ts[0]) / (ITERS[1] - ITERS[0]) * 1e3
        out[f"scatter_ms_split{S}"] = round(ms, 2)
        print(f"split S={S}: {ms:7.2f} ms/step", file=sys.stderr,
              flush=True)
        del segs, jit_step

    print(json.dumps(out))


if __name__ == "__main__":
    main()
