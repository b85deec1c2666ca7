"""Headline benchmark: DLRM training examples/s/chip on Criteo Kaggle.

Runs the full jitted train step (forward + backward + dense SGD + sparse
scatter-add embedding update, donated buffers) on synthetic Kaggle-shaped
data and reports steady-state throughput.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
first recorded run of this benchmark on this hardware (BENCH_BASELINE.json,
written on first use); later rounds report their ratio against it.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 32768          # reference experiment batch (src/DLRM.jl:82-83)
FEATURE_SIZE = 16      # reference kaggle_dlrm default (criteo.jl:412)
WARMUP = 5
ITERS = 20
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
METRIC = f"dlrm_kaggle_fs{FEATURE_SIZE}_train_b{BATCH}"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_devices(timeout_s: float = 300.0):
    from bench_util import init_devices

    return init_devices(METRIC, timeout_s=timeout_s)


def main():
    devices = _init_devices()
    import jax
    import jax.numpy as jnp
    import dlrm_tpu

    dev = devices[0]
    log(f"device: {dev} ({dev.platform})")

    if "--fs128-only" in sys.argv:
        # re-run just the fs=128 section (development aid; the driver runs
        # the full bench with no args)
        rng = np.random.default_rng(0)
        fs128: dict = {}
        try:
            _bench_fs128(rng, log, fs128)
        except Exception as e:  # pragma: no cover - depends on device HBM
            log(f"fs128 section failed: {type(e).__name__}: {e}")
            fs128["fs128_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps({"metric": "dlrm_kaggle_fs128_train_b32768",
                          "value": fs128.get(
                              "fs128_sgd_gram_examples_per_s", 0),
                          "unit": "examples/s/chip",
                          "vs_baseline": 0,
                          **fs128}))
        return

    # "gram" (batched MXU einsum + static gather) measures fastest on v5e
    # for fs=16 (3.5 ms fwd+bwd vs 7 ms for the fused pallas kernel).
    config = dlrm_tpu.kaggle_config(feature_size=FEATURE_SIZE,
                                    interaction_impl="gram")
    log(f"model: kaggle fs={FEATURE_SIZE}, {config.total_rows:,} rows, "
        f"top_in={config.top_input}")
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(BATCH, 13)).astype(np.float32))
    sparse = jnp.asarray(np.stack(
        [rng.integers(0, s, size=BATCH) for s in config.table_sizes],
        axis=1).astype(np.int32))
    labels = jnp.asarray((rng.random(BATCH) > 0.5).astype(np.float32))

    step = dlrm_tpu.make_jit_train_step(config, lr=0.1)
    t0 = time.perf_counter()
    for _ in range(WARMUP):
        params, loss = step(params, dense, sparse, labels)
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s, "
        f"loss={float(loss):.4f}")

    # Two-point slope timing: each window is timed end-to-end with ONE
    # device sync (float(loss) of the last chained step), and the per-step
    # time is the marginal cost between the two window sizes.  This cancels
    # both the sync round-trip and any fixed dispatch overhead — necessary
    # under remote-tunnel setups where block_until_ready can return before
    # execution finishes and a scalar fetch costs a full RTT.
    totals = []
    for iters in (ITERS // 4, ITERS):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, loss = step(params, dense, sparse, labels)
        _ = float(loss)
        totals.append(time.perf_counter() - t0)
    step_time = (totals[1] - totals[0]) / (ITERS - ITERS // 4)
    throughput = BATCH / step_time
    log(f"step time: {step_time*1e3:.2f} ms -> {throughput:,.0f} examples/s")

    baseline = None
    if os.path.exists(BASELINE_PATH):
        try:
            with open(BASELINE_PATH) as f:
                baseline = json.load(f).get("value")
        except Exception:
            baseline = None
    if baseline is None:
        baseline = throughput
        try:
            with open(BASELINE_PATH, "w") as f:
                json.dump({"metric": METRIC,
                           "value": throughput,
                           "device": str(dev),
                           "batch": BATCH}, f)
        except OSError:
            pass

    # secondary: the coalesced-update block mode (--update-interval 4, the
    # reference BatchUpdater relaxation; train.train_block) — one scatter
    # per chunk per K steps, bounded staleness < K
    from dlrm_tpu.train.train import make_jit_train_block
    K = 8  # measured knee of the staleness/compile tradeoff (PERFORMANCE.md)
    # every micro-step gets fully distinct dense/ids/labels so no
    # broadcast-shared operand can be memoized anywhere in the block
    kd = jnp.asarray(rng.normal(size=(K, BATCH, 13)).astype(np.float32))
    ks = jnp.asarray(np.stack(
        [np.stack([rng.integers(0, s, size=BATCH)
                   for s in config.table_sizes], axis=1)
         for _ in range(K)]).astype(np.int32))
    kl = jnp.asarray((rng.random((K, BATCH)) > 0.5).astype(np.float32))
    blk = make_jit_train_block(config, lr=0.1, block=K)
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    t0 = time.perf_counter()
    for _ in range(3):
        params, bl = blk(params, kd, ks, kl)
    _ = float(bl[-1])
    log(f"block K={K} compile+warmup: {time.perf_counter() - t0:.1f}s")
    totals = []
    for iters in (4, 12):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, bl = blk(params, kd, ks, kl)
        _ = float(bl[-1])
        totals.append(time.perf_counter() - t0)
    blk_step = (totals[1] - totals[0]) / 8 / K
    blk_tput = BATCH / blk_step
    log(f"block K={K}: {blk_step*1e3:.2f} ms/step "
        f"-> {blk_tput:,.0f} examples/s")

    # adagrad: the optimizer DLRM actually trains with (the reference is
    # SGD-only).  Exact per-step semantics via the per-chunk HYBRID
    # implementation (optim.apply_adagrad_hybrid: dense-G for chunks
    # <= 400 MB, dedup for the deep ones — measured 46.8 vs 55.3 ms
    # dedup-only, and ~25x faster first compile).
    from dlrm_tpu.train.train import init_opt_state, make_jit_train_step_opt
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    opt = init_opt_state(params, config=config, optimizer="adagrad",
                         lr=0.01)
    astep = make_jit_train_step_opt(config, optimizer="adagrad", lr=0.01,
                                    emb_impl="hybrid")
    t0 = time.perf_counter()
    for _ in range(3):
        (params, opt), loss = astep(params, opt, dense, sparse, labels)
    _ = float(loss)
    log(f"adagrad compile+warmup: {time.perf_counter() - t0:.1f}s")
    totals = []
    for iters in (4, 12):
        t0 = time.perf_counter()
        for _ in range(iters):
            (params, opt), loss = astep(params, opt, dense, sparse, labels)
        _ = float(loss)
        totals.append(time.perf_counter() - t0)
    ada_step = (totals[1] - totals[0]) / 8
    ada_tput = BATCH / ada_step
    log(f"adagrad exact: {ada_step*1e3:.2f} ms/step "
        f"-> {ada_tput:,.0f} examples/s")

    # adagrad coalesced block (dense-G): the production adagrad config.
    # unroll=False (lax.scan over micro-steps) compiles in ~55 s vs ~8 min
    # unrolled at a ~5% steady-state cost — the right tradeoff for this
    # driver-run bench; the unrolled variant measures 24.4 ms/step.
    from dlrm_tpu.train.train import make_jit_train_block_opt
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    opt = init_opt_state(params, config=config, optimizer="adagrad",
                         lr=0.01)
    ablk = make_jit_train_block_opt(config, optimizer="adagrad", lr=0.01,
                                    block=K, unroll=False)
    t0 = time.perf_counter()
    for _ in range(3):
        (params, opt), bl = ablk(params, opt, kd, ks, kl)
    _ = float(bl[-1])
    log(f"adagrad block K={K} compile+warmup: "
        f"{time.perf_counter() - t0:.1f}s")
    totals = []
    for iters in (3, 9):
        t0 = time.perf_counter()
        for _ in range(iters):
            (params, opt), bl = ablk(params, opt, kd, ks, kl)
        _ = float(bl[-1])
        totals.append(time.perf_counter() - t0)
    ablk_step = (totals[1] - totals[0]) / 6 / K
    ablk_tput = BATCH / ablk_step
    log(f"adagrad block K={K}: {ablk_step*1e3:.2f} ms/step "
        f"-> {ablk_tput:,.0f} examples/s")

    # tertiary: embedding-lookup bandwidth (BASELINE.json metric).  Jitted
    # pooled lookup (mixed engine) alone; the carry makes each call's ids
    # data-dependent on the previous result, defeating axon's
    # identical-args memoization.  GB/s is LOGICAL pooled-row bytes
    # (B * T * D * 4) per second.
    from dlrm_tpu.ops.embedding import mixed_lookup
    params = dlrm_tpu.init_params(jax.random.key(0), config)
    emb = params["emb"]
    ids_base = jnp.asarray(np.stack(
        [rng.integers(0, s - 1, size=BATCH) for s in config.table_sizes],
        axis=1).astype(np.int32))

    @jax.jit
    def lookup_probe(emb, ids_base, c, k):
        # k is a monotone device counter: every call's argument tuple is
        # GUARANTEED distinct (a result-derived carry alone can enter a
        # fixed point / 2-cycle once the result value repeats, re-enabling
        # the identical-args memoization this probe exists to defeat);
        # c still folds the previous RESULT in so the chain is also
        # data-dependent, not just counter-dependent
        ids = ids_base + ((c.astype(jnp.int32) ^ k) & 1)
        pooled = mixed_lookup(emb, ids, config)
        return jnp.sum(pooled.astype(jnp.float32)), k + 1

    c, k = jnp.float32(0), jnp.int32(0)
    for _ in range(3):
        c, k = lookup_probe(emb, ids_base, c, k)
    _ = float(c)
    totals = []
    for iters in (5, 20):
        t0 = time.perf_counter()
        for _ in range(iters):
            c, k = lookup_probe(emb, ids_base, c, k)
        _ = float(c)
        totals.append(time.perf_counter() - t0)
    lk_t = (totals[1] - totals[0]) / 15
    n_tables = len(config.table_sizes)
    lk_bytes = BATCH * n_tables * FEATURE_SIZE * 4
    lk_gbs = lk_bytes / lk_t / 1e9
    log(f"pooled lookup: {lk_t*1e3:.2f} ms -> {lk_gbs:.1f} GB/s logical "
        f"({BATCH * n_tables / lk_t / 1e9:.2f} G lookups/s)")

    # reference-protocol points (BASELINE.md final paragraph): train at
    # the reference's experiment batch B=2048 (script.jl:13) and eval at
    # its 2^16 test batch (src/DLRM.jl:89-91)
    B2 = 2048
    # run.py keys the chunk budget off the batch size (the B=2048 sweep
    # measured 64 MB at 1.70 ms vs 16 MB at 2.17); measure what a user of
    # the production CLI actually gets
    import dataclasses as _dc
    from dlrm_tpu import config as _cfg_mod
    config2 = _dc.replace(
        config,
        chunk_budget_bytes=_cfg_mod.auto_chunk_budget_bytes(B2))
    params = dlrm_tpu.init_params(jax.random.key(0), config2)
    d2 = dense[:B2]
    s2 = sparse[:B2]
    l2 = labels[:B2]
    step2 = dlrm_tpu.make_jit_train_step(config2, lr=0.1)
    t0 = time.perf_counter()
    for _ in range(5):
        params, loss = step2(params, d2, s2, l2)
    _ = float(loss)
    log(f"b2048 compile+warmup: {time.perf_counter() - t0:.1f}s")
    totals = []
    for iters in (10, 40):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, loss = step2(params, d2, s2, l2)
        _ = float(loss)
        totals.append(time.perf_counter() - t0)
    b2_step = (totals[1] - totals[0]) / 30
    b2_tput = B2 / b2_step
    log(f"train b{B2}: {b2_step*1e3:.2f} ms/step "
        f"-> {b2_tput:,.0f} examples/s")

    # eval throughput at the reference's 2^16 test batch: jitted forward
    # only (the serving/eval inner loop); ids chained through the carry to
    # defeat identical-args memoization
    BE = 1 << 16
    from dlrm_tpu.models.dlrm import forward
    de = jnp.asarray(rng.normal(size=(BE, 13)).astype(np.float32))
    se = jnp.asarray(np.stack(
        [rng.integers(0, s - 1, size=BE) for s in config.table_sizes],
        axis=1).astype(np.int32))

    @jax.jit
    def eval_probe(params, d, s_, c, k):
        # monotone counter k guarantees distinct args every call (see
        # lookup_probe)
        preds = forward(params, d,
                        s_ + ((c.astype(jnp.int32) ^ k) & 1), config)
        return jnp.sum(preds), k + 1

    c, k = jnp.float32(0), jnp.int32(0)
    for _ in range(3):
        c, k = eval_probe(params, de, se, c, k)
    _ = float(c)
    totals = []
    for iters in (4, 12):
        t0 = time.perf_counter()
        for _ in range(iters):
            c, k = eval_probe(params, de, se, c, k)
        _ = float(c)
        totals.append(time.perf_counter() - t0)
    ev_t = (totals[1] - totals[0]) / 8
    ev_tput = BE / ev_t
    log(f"eval b{BE}: {ev_t*1e3:.2f} ms -> {ev_tput:,.0f} examples/s")

    # fs=128 operating point (the MLPerf/Terabyte feature size,
    # criteo.jl:379-406; BASELINE config 4 north star).  pack = 128/128
    # = 1, so lane packing disables and every fs=16-tuned constant is on
    # different footing.  Kaggle tables at fs=128 f32 are 17.3 GB — over
    # one v5e's 16 GB HBM — so storage is bf16 (the reference's own
    # BF16-embeddings experiment, src/DLRM.jl:44-110): 8.6 GB.  The
    # optimizer point is rowwise adagrad (f32 (R,) accumulator, 135 MB);
    # elementwise adagrad's f32 accumulator alone would be 17.3 GB.
    fs128: dict = {}
    # free the fs=16 model (2.2 GB + opt state) before the 8.6 GB alloc
    del params, opt, emb, c, k, astep, ablk, blk, step, step2
    try:
        # fs128 is filled in-place so measurements taken before a
        # mid-section OOM still reach the JSON line
        _bench_fs128(rng, log, fs128)
    except Exception as e:  # pragma: no cover - depends on device HBM
        log(f"fs128 section failed: {type(e).__name__}: {e}")
        fs128["fs128_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps({
        "metric": METRIC,
        "value": round(throughput, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(throughput / baseline, 3),
        f"block{K}_examples_per_s": round(blk_tput, 1),
        f"block{K}_vs_baseline": round(blk_tput / baseline, 3),
        "adagrad_examples_per_s": round(ada_tput, 1),
        f"adagrad_block{K}_examples_per_s": round(ablk_tput, 1),
        "lookup_gb_s_logical": round(lk_gbs, 2),
        "b2048_examples_per_s": round(b2_tput, 1),
        "eval_examples_per_s": round(ev_tput, 1),
        **fs128,
    }))


def _bench_fs128(rng, log, out):
    """kaggle fs=128 (pack=1, bf16 tables) : exact SGD, rowwise adagrad,
    pooled lookup, and the gram-vs-pallas interaction choice end-to-end.

    Fills ``out`` in-place so the caller keeps every measurement taken
    before a mid-section device OOM."""
    import jax
    import jax.numpy as jnp
    import dlrm_tpu
    from dlrm_tpu.train.train import init_opt_state, make_jit_train_step_opt
    from dlrm_tpu.ops.embedding import mixed_lookup

    B = BATCH

    def slope_step(step, state, extra, iters=(3, 9)):
        for _ in range(3):
            state, loss = step(state, *extra)
            loss = loss[-1] if getattr(loss, "ndim", 0) else loss
        _ = float(loss)
        totals = []
        for n in iters:
            t0 = time.perf_counter()
            for _ in range(n):
                state, loss = step(state, *extra)
            loss = loss[-1] if getattr(loss, "ndim", 0) else loss
            _ = float(loss)
            totals.append(time.perf_counter() - t0)
        return (totals[1] - totals[0]) / (iters[1] - iters[0])

    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))

    # the bf16 table stack is 8.6 GB on a 16 GB chip: any rebind of the
    # model (params = init_params(...)) while the previous stack is still
    # referenced is a ~17 GB transient and an instant OOM — measured on
    # the first on-chip run (block + int8 + pallas sections all died that
    # way).  Every re-init below therefore goes through fresh_params(),
    # which drops the old reference BEFORE allocating the new stack.
    params = None

    def fresh_params(config):
        nonlocal params
        params = None
        return dlrm_tpu.init_params(jax.random.key(0), config)

    for impl in ("gram", "pallas"):
        config = dlrm_tpu.kaggle_config(feature_size=128,
                                        embedding_dtype=jnp.bfloat16,
                                        interaction_impl=impl)
        sparse = jnp.asarray(np.stack(
            [rng.integers(0, s, size=B) for s in config.table_sizes],
            axis=1).astype(np.int32))
        params = fresh_params(config)
        step = dlrm_tpu.make_jit_train_step(config, lr=0.1)

        def sgd_step(p, d, s_, l):
            return step(p, d, s_, l)

        t0 = time.perf_counter()
        t = slope_step(sgd_step, params, (dense, sparse, labels))
        log(f"fs128 sgd [{impl}]: {t*1e3:.2f} ms/step -> "
            f"{B/t:,.0f} examples/s "
            f"(compile+measure {time.perf_counter()-t0:.0f}s)")
        out[f"fs128_sgd_{impl}_examples_per_s"] = round(B / t, 1)
        if impl == "gram":
            # rowwise adagrad + lookup measured once, on the default
            # impl.  Sub-isolated like the block/int8 sections below: a
            # failure here must not lose the pallas measurement.
            emb = ids_base = None
            try:
                params = fresh_params(config)
                opt = init_opt_state(params, config=config,
                                     optimizer="rowwise_adagrad", lr=0.01)
                astep = make_jit_train_step_opt(config,
                                                optimizer="rowwise_adagrad",
                                                lr=0.01)

                def ada_step(state, d, s_, l):
                    (p, o), loss = astep(state[0], state[1], d, s_, l)
                    return (p, o), loss

                t0 = time.perf_counter()
                ta = slope_step(ada_step, (params, opt),
                                (dense, sparse, labels))
                log(f"fs128 rowwise adagrad: {ta*1e3:.2f} ms/step -> "
                    f"{B/ta:,.0f} examples/s "
                    f"(compile+measure {time.perf_counter()-t0:.0f}s)")
                out["fs128_rowwise_adagrad_examples_per_s"] = round(
                    B / ta, 1)
                opt = astep = None  # free the accumulator first

                params = fresh_params(config)
                emb = params["emb"]
                ids_base = jnp.asarray(np.stack(
                    [rng.integers(0, s - 1, size=B)
                     for s in config.table_sizes], axis=1).astype(np.int32))

                @jax.jit
                def lookup_probe(emb, ids_base, c, k):
                    # monotone counter k: distinct args every call (see
                    # the fs=16 lookup_probe note on axon memoization)
                    ids = ids_base + ((c.astype(jnp.int32) ^ k) & 1)
                    pooled = mixed_lookup(emb, ids, config)
                    return jnp.sum(pooled.astype(jnp.float32)), k + 1

                c, k = jnp.float32(0), jnp.int32(0)
                for _ in range(3):
                    c, k = lookup_probe(emb, ids_base, c, k)
                _ = float(c)
                totals = []
                for iters in (4, 12):
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        c, k = lookup_probe(emb, ids_base, c, k)
                    _ = float(c)
                    totals.append(time.perf_counter() - t0)
                lk_t = (totals[1] - totals[0]) / 8
                lk_bytes = B * len(config.table_sizes) * 128 * 2  # bf16
                out["fs128_lookup_gb_s_logical"] = round(
                    lk_bytes / lk_t / 1e9, 2)
                log(f"fs128 pooled lookup: {lk_t*1e3:.2f} ms -> "
                    f"{out['fs128_lookup_gb_s_logical']:.1f} GB/s logical")
            except Exception as e:  # pragma: no cover - device HBM
                log(f"fs128 rowwise/lookup failed: {type(e).__name__}: {e}")
                out["fs128_rowwise_error"] = f"{type(e).__name__}: {e}"
            finally:
                emb = ids_base = opt = astep = None  # noqa: F841

            # coalesced SGD block K=8 — the production schedule; at
            # fs=128 the deep-table scatters are the most expensive in
            # the whole config (density law: 32k ids into 2.5 GB bf16
            # operands), so one-scatter-per-chunk-per-K matters most
            # here.  Sub-isolated: the K-step payload (~1.3 GB of
            # accumulated f32 grad rows) is the most OOM-prone point of
            # the whole bench, and a failure here must not lose the
            # pallas measurement that follows.
            try:
                from dlrm_tpu.train.train import make_jit_train_block
                Kb = 8
                kd = jnp.asarray(rng.normal(
                    size=(Kb, B, 13)).astype(np.float32))
                ks = jnp.asarray(np.stack(
                    [np.stack([rng.integers(0, s, size=B)
                               for s in config.table_sizes], axis=1)
                     for _ in range(Kb)]).astype(np.int32))
                kl = jnp.asarray(
                    (rng.random((Kb, B)) > 0.5).astype(np.float32))
                params = fresh_params(config)
                blk = make_jit_train_block(config, lr=0.1)

                def blk_step(p, d, s_, l):
                    return blk(p, d, s_, l)

                t0 = time.perf_counter()
                tb = slope_step(blk_step, params, (kd, ks, kl),
                                iters=(2, 6)) / Kb
                log(f"fs128 sgd block K={Kb}: {tb*1e3:.2f} ms/step -> "
                    f"{B/tb:,.0f} examples/s "
                    f"(compile+measure {time.perf_counter()-t0:.0f}s)")
                out[f"fs128_sgd_block{Kb}_examples_per_s"] = round(
                    B / tb, 1)
            except Exception as e:  # pragma: no cover - device HBM
                log(f"fs128 block failed: {type(e).__name__}: {e}")
                out["fs128_block_error"] = f"{type(e).__name__}: {e}"
            finally:
                # drop the block payload references even on the OOM this
                # guard exists for — the pallas measurement follows
                kd = ks = kl = blk = None  # noqa: F841

            # int8 quantized serving (ops/quant.py): forward-only
            # throughput, bf16 tables (8.6 GB) vs int8+f32-scales
            # (~4.5 GB).  Sub-isolated: both models coexist briefly
            # (~13 GB) — an OOM here must not lose the measurements
            # above or the pallas point below.
            qparams = None
            try:
                from dlrm_tpu.ops.quant import quantize_emb

                params = fresh_params(config)
                sv = jnp.asarray(np.stack(
                    [rng.integers(0, s - 1, size=B)
                     for s in config.table_sizes], axis=1).astype(np.int32))

                def serving_probe_t(p):
                    @jax.jit
                    def probe(p, ids_base, c, k):
                        # monotone counter: distinct args per call (axon
                        # memoization; see the fs=16 eval probe)
                        ids = ids_base + ((c.astype(jnp.int32) ^ k) & 1)
                        preds = dlrm_tpu.forward(p, dense, ids, config)
                        return jnp.sum(preds), k + 1

                    c, k = jnp.float32(0), jnp.int32(0)
                    for _ in range(3):
                        c, k = probe(p, sv, c, k)
                    _ = float(c)
                    totals = []
                    for iters in (4, 12):
                        t0 = time.perf_counter()
                        for _ in range(iters):
                            c, k = probe(p, sv, c, k)
                        _ = float(c)
                        totals.append(time.perf_counter() - t0)
                    return (totals[1] - totals[0]) / 8

                tb16 = serving_probe_t(params)
                out["fs128_predict_examples_per_s"] = round(B / tb16, 1)
                log(f"fs128 predict [bf16 tables]: {tb16*1e3:.2f} ms -> "
                    f"{B/tb16:,.0f} examples/s")
                # donate=True frees each bf16 chunk inside its (jitted,
                # fused) quantization call — both stacks never coexist
                qparams = {"bottom": params["bottom"],
                           "emb": quantize_emb(params["emb"], config,
                                               donate=True),
                           "top": params["top"]}
                params = None  # emb chunks already freed by donation
                tq = serving_probe_t(qparams)
                out["fs128_int8_predict_examples_per_s"] = round(B / tq, 1)
                log(f"fs128 predict [int8 tables]: {tq*1e3:.2f} ms -> "
                    f"{B/tq:,.0f} examples/s")
            except Exception as e:  # pragma: no cover - device HBM
                log(f"fs128 int8 serving failed: {type(e).__name__}: {e}")
                out["fs128_int8_error"] = f"{type(e).__name__}: {e}"
            finally:
                # drop BOTH models even on the OOM this guard exists for
                # — the pallas measurement follows
                qparams = None  # noqa: F841
            params = None
        params = step = None
    return out


if __name__ == "__main__":
    main()
