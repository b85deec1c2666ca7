"""Hot-id / duplicate-id probe (round 5, VERDICT item 4).

The reference's SparseIndexer dedups ids before apply
(/root/reference/src/train/train.jl:276-290); this repo dedups for
Adagrad CORRECTNESS, but the round-4 lookup-floor analysis names "fewer
ids" as the only remaining >10% lever on the dominant step cost.  With
XLA's static shapes we cannot issue fewer gather/scatter rows — what we
CAN exploit is whatever the hardware already does with duplicates:

1. dup ratio: how many duplicate ids a B=32768 batch actually has, per
   deep Kaggle table, under uniform ids, Zipf ids, and the reference's
   own dataset distribution;
2. does a DUPLICATE-heavy id vector make the gather faster (the row is
   hot in whatever caching the HBM path has)?
3. does a dropped slot (id = -1, mode="drop") make the scatter cheaper,
   i.e. would dedup-compression (duplicates -> -1) buy anything beyond
   correctness?
4. what does the dedup itself (argsort + segment-sum at B=32768) cost?

Run on the real chip: ``python bench_hotid.py``.  Results land in
PERFORMANCE.md ("Tried and rejected" if negative, per the VERDICT).
"""

import json
import sys
import time

import numpy as np

B = 32768
ROWS = 10_131_227  # deepest Kaggle table (criteo.jl:350-377)
D = 128            # one 128-lane physical row (pack=1 regime)
ITERS = (5, 20)


def zipf_ids(rng, n, rows, a=1.05):
    """Zipf-distributed ids clipped to the table (CTR id popularity is
    famously Zipf-like; a~1.05 matches common Criteo fits)."""
    z = rng.zipf(a, size=n * 2)
    z = z[z <= rows][:n]
    while len(z) < n:
        more = rng.zipf(a, size=n)
        z = np.concatenate([z, more[more <= rows]])[:n]
    return (z - 1).astype(np.int32)


def main():
    from bench_util import init_devices
    devices = init_devices("hotid_probe", timeout_s=300.0)
    import jax
    import jax.numpy as jnp

    dev = devices[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    out = {"metric": "hotid_probe", "batch": B, "rows": ROWS}

    # -- 1. dup ratios ----------------------------------------------------
    uni = rng.integers(0, ROWS, size=B).astype(np.int32)
    zpf = zipf_ids(rng, B, ROWS)
    out["dup_ratio_uniform"] = round(1 - len(np.unique(uni)) / B, 4)
    out["dup_ratio_zipf105"] = round(1 - len(np.unique(zpf)) / B, 4)
    # reference dataset: the checked-in 250-row DAC sample's per-table
    # dup ratio at its full size (all rows in one batch)
    try:
        import dlrm_tpu
        from dlrm_tpu.data.criteo import binarize, load
        import tempfile
        import os
        src = "/root/reference/test/dataset/alldays.txt"
        if os.path.exists(src):
            with tempfile.TemporaryDirectory() as td:
                binpath = os.path.join(td, "d.bin")
                binarize(src, binpath)
                recs = load(binpath)
                cat = np.asarray(recs["cat"])  # (N, 26) uint32
                ratios = [1 - len(np.unique(cat[:, t])) / len(cat)
                          for t in range(cat.shape[1])]
                out["dup_ratio_refdata_mean"] = round(
                    float(np.mean(ratios)), 4)
                out["dup_ratio_refdata_max"] = round(
                    float(np.max(ratios)), 4)
    except Exception as e:
        out["refdata_error"] = f"{type(e).__name__}: {e}"
    print(f"dup ratios: uniform={out['dup_ratio_uniform']}, "
          f"zipf={out['dup_ratio_zipf105']}, "
          f"refdata_mean={out.get('dup_ratio_refdata_mean')}",
          file=sys.stderr, flush=True)

    # generate the table ON DEVICE — a host-generated 5.2 GB array would
    # bulk-upload through the tunnel for ~15 minutes
    def fresh_table():
        t = jax.jit(lambda k: jax.random.normal(
            k, (ROWS, D), jnp.float32))(jax.random.key(0))
        jax.block_until_ready(t)
        return t

    table = fresh_table()
    upd = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def slope(window):
        ts = []
        for n in ITERS:
            t0 = time.perf_counter()
            window(n)
            ts.append(time.perf_counter() - t0)
        return (ts[1] - ts[0]) / (ITERS[1] - ITERS[0]) * 1e3

    # -- 2. gather under distributions ------------------------------------
    def bench_gather(ids_np, name):
        ids = jnp.asarray(ids_np)

        @jax.jit
        def g(table, ids, k):
            r = table.at[(ids + (k & 1)) % ROWS].get(
                mode="promise_in_bounds")
            return jnp.sum(r), k + 1

        k = jnp.int32(0)
        s = None
        for _ in range(3):
            s, k = g(table, ids, k)
        _ = float(s)

        def window(n):
            nonlocal k, s
            for _ in range(n):
                s, k = g(table, ids, k)
            _ = float(s)

        ms = slope(window)
        out[f"gather_ms_{name}"] = round(ms, 3)
        print(f"gather [{name}]: {ms:.3f} ms "
              f"({ms*1e6/B:.1f} ns/row)", file=sys.stderr, flush=True)

    bench_gather(uni, "uniform")
    bench_gather(zpf, "zipf105")
    bench_gather(np.sort(zpf), "zipf105_sorted")
    bench_gather(np.full(B, 12345, np.int32), "allsame")

    # -- 3. scatter under distributions + drop slots ----------------------
    def bench_scatter(ids_np, name):
        ids = jnp.asarray(ids_np)

        def sc(table, ids, k):
            new = table.at[(ids + (k & 1)) % ROWS].add(
                upd, mode="promise_in_bounds")
            return new, jnp.sum(new[12345]), k + 1

        # drop-mode path: perturb ONLY the non-negative ids — a bare
        # `ids + (k & 1)` would turn the -1 drop sentinels into row 0 on
        # every odd iteration, timing a no-drop program half the time
        # (round-5 review finding; the drop measurements were re-run
        # after this fix)
        if (ids_np < 0).any():
            def sc(table, ids, k):  # noqa: F811
                new = table.at[ids + (k & 1) * (ids >= 0)].add(
                    upd, mode="drop")
                return new, jnp.sum(new[12345]), k + 1

        jit_sc = jax.jit(sc, donate_argnums=(0,))
        # the scatter donates its table — each variant gets a fresh one
        nonloc = {"t": fresh_table()}
        k = jnp.int32(0)
        s = None
        for _ in range(3):
            nonloc["t"], s, k = jit_sc(nonloc["t"], ids, k)
        _ = float(s)

        def window(n):
            nonlocal k, s
            for _ in range(n):
                nonloc["t"], s, k = jit_sc(nonloc["t"], ids, k)
            _ = float(s)

        ms = slope(window)
        out[f"scatter_ms_{name}"] = round(ms, 3)
        print(f"scatter [{name}]: {ms:.3f} ms "
              f"({ms*1e6/B:.1f} ns/row)", file=sys.stderr, flush=True)

    table = None  # gathers done; scatters use fresh donated tables
    bench_scatter(uni, "uniform")
    bench_scatter(zpf, "zipf105")
    drop50 = uni.copy()
    drop50[::2] = -1
    bench_scatter(drop50, "drop50")
    drop90 = uni.copy()
    drop90[np.arange(B) % 10 != 0] = -1
    bench_scatter(drop90, "drop90")

    # -- 4. dedup cost ----------------------------------------------------
    from dlrm_tpu.ops.embedding import dedup_sparse_grad, SparseGrad

    @jax.jit
    def dd(ids, rows, k):
        o = dedup_sparse_grad(SparseGrad(ids + (k & 1), rows))
        return jnp.sum(o.rows), k + 1

    ids = jnp.asarray(zpf)
    k = jnp.int32(0)
    s = None
    for _ in range(3):
        s, k = dd(ids, upd, k)
    _ = float(s)

    def window(n):
        nonlocal k, s
        for _ in range(n):
            s, k = dd(ids, upd, k)
        _ = float(s)

    out["dedup_ms_b32768"] = round(slope(window), 3)
    print(f"dedup (argsort+segsum): {out['dedup_ms_b32768']:.3f} ms",
          file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
