#!/bin/bash
# Run the full round-4 hardware queue in priority order the moment the
# TPU transport is back (ROUND4_NOTES.md item 1).  Each step is
# independently time-boxed and logs to /tmp/r4_tpu/, so a flaky tunnel
# still lands whatever it can; re-run safely any time (artifacts are
# overwritten, nothing is cumulative).
#
#   bash capture_tpu_artifacts.sh
#
set -u
cd "$(dirname "$0")"
OUT=/tmp/r4_tpu
mkdir -p "$OUT"

probe() {
    curl -s -m 3 http://127.0.0.1:8083/ >/dev/null 2>&1
    [ $? -ne 7 ]
}

if ! probe; then
    echo "tunnel port 8083 refused — transport still down" >&2
    exit 2
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
    timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "$name: rc=$rc" | tee -a "$OUT/summary.log"
    tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. the driver bench itself (all fs=16 metrics + the fs=128 section)
run bench 3600 python bench.py

# 2. B=2048 chunk-budget sweep (VERDICT item 3)
run b2048_sweep 2400 python bench_b2048.py

# 3. fs=128 tuning sweeps (VERDICT item 2)
run fs128_budgets 3000 python bench_fs128_tune.py budgets
run fs128_thresholds 3000 python bench_fs128_tune.py thresholds

# 4. phase-breakdown table (VERDICT item 4 / BASELINE.md measurement (d))
run instrument 1800 python -m dlrm_tpu instrument --config kaggle \
    --batch-size 32768 --steps 8

# 5. host-prefetch profiler trace (two-tier pipelined step)
run hostprefetch_trace 2400 python -m dlrm_tpu train --config kaggle \
    --batch-size 8192 --steps 6 --hbm-budget-gb 1.5 --host-prefetch \
    --profile-dir "$OUT/trace"

echo "done; artifacts in $OUT" | tee -a "$OUT/summary.log"
