"""Sharded host-resident (host-rs) step probe on a 1-device mesh.

The two-tier path's (N, D) pinned carry was shown to force full-stack
layout conversions every step (TRACE_ANALYSIS.md; fixed round 5 with the
flat 1-D carry).  The SHARDED host placement (`--host-tables`,
parallel/embedding.py) carries its pinned stack as (N, host_local_rows,
W) through shard_map — this probe measures whether it pays the same tax
on the real chip (mesh of 1 device; big host table, Kaggle-like shapes)
before any rework.  Compares against the same placement with the table
device-resident.

Run: ``python bench_hostrs.py [host_rows]``.

Caveat (measured): the mesh-1 sharded step's XLA compile time grows
pathologically with the deep table's row count through the tunnel
(~115 s at 100 k rows; >15 min at 2 M — killed).  Run this probe at
small host_rows; the fixed per-host-call overhead it measures is
size-independent (SCALING.md).
"""

import dataclasses
import json
import sys
import time

import numpy as np

B = 8192
HOST_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_131_227
ITERS = (3, 9)


def main():
    from bench_util import init_devices
    init_devices("hostrs_probe", timeout_s=300.0)
    import jax
    import jax.numpy as jnp
    import dlrm_tpu
    from dlrm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        param_shardings)
    from dlrm_tpu.parallel.placement import plan_placement
    from dlrm_tpu.train.train import make_sharded_train_step

    # kaggle-shaped: 25 small tables + one deep table (index 25)
    sizes = tuple([2000] * 25 + [HOST_ROWS])
    config = dataclasses.replace(
        dlrm_tpu.kaggle_config(feature_size=16), table_sizes=sizes)
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack(
        [rng.integers(0, s, size=B) for s in sizes], axis=1
        ).astype(np.int32))
    labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))
    bs = batch_sharding(mesh)
    dense, sparse, labels = (jax.device_put(x, bs)
                             for x in (dense, sparse, labels))

    out = {"metric": "hostrs_probe", "batch": B, "host_rows": HOST_ROWS}
    for host in (False, True):
        placement = plan_placement(
            sizes, 1, pack=config.pack,
            host_tables=((25,) if host else ()))
        # build params WITHOUT a host-side 620 MB round-trip: small
        # tables via init on a small config, the deep stack on device
        p0 = dlrm_tpu.init_params(
            jax.random.key(0),
            dataclasses.replace(config, table_sizes=tuple([2000] * 26)))
        sh_params = {"bottom": p0["bottom"], "top": p0["top"]}
        # device stack: (1, R_dev, W); host stack: (1, H, W) pinned
        W = config.feature_size * placement.pack
        dev_rows = placement.local_rows
        key = jax.random.key(1)
        sh_params["emb"] = jax.jit(lambda k: 0.01 * jax.random.normal(
            k, (1, dev_rows, W), jnp.float32))(key)
        if host:
            sh_h = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("d"),
                memory_kind="pinned_host")
            sh_params["emb_h"] = jax.jit(
                lambda k: 0.01 * jax.random.normal(
                    k, (1, placement.host_local_rows, W), jnp.float32),
                out_shardings=sh_h)(key)
        sh_params = jax.device_put(sh_params,
                                   param_shardings(mesh, sh_params))
        step = make_sharded_train_step(config, 0.1, mesh, placement)
        state = [sh_params]
        t0 = time.perf_counter()
        loss = None
        for _ in range(3):
            state[0], loss = step(state[0], dense, sparse, labels)
        _ = float(loss)
        name = "host_rs" if host else "device"
        print(f"{name} compile+warmup {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        ts = []
        for n in ITERS:
            t0 = time.perf_counter()
            for _ in range(n):
                state[0], loss = step(state[0], dense, sparse, labels)
            _ = float(loss)
            ts.append(time.perf_counter() - t0)
        ms = (ts[1] - ts[0]) / (ITERS[1] - ITERS[0]) * 1e3
        out[f"{name}_ms"] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms/step", file=sys.stderr, flush=True)
        state[0] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
