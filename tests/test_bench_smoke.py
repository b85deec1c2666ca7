"""Drive bench.py's full section sequence on CPU (--smoke).

Round 4's driver bench died mid-run on a section-sequencing bug (the
eval probe called forward() on params packed under a different chunk
geometry) that no test exercised — the bench script's SECTION SEQUENCE
is itself a correctness surface.  This test runs every section on tiny
shapes and asserts the final JSON line prints with every section's
fragment present and no ``*_error`` keys.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_sequence_end_to_end():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    last = proc.stdout.strip().splitlines()[-1]
    out = json.loads(last)
    errors = {k: v for k, v in out.items() if k.endswith("_error")}
    assert not errors, errors
    # every section's fragment must be present (block/K keys use the
    # smoke block size K=2)
    for key in ("value", "block2_examples_per_s", "adagrad_examples_per_s",
                "adagrad_block2_examples_per_s", "lookup_gb_s_logical",
                "b2048_examples_per_s", "eval_examples_per_s",
                "hosttier_b128_examples_per_s",
                "hosttier_block2_b128_examples_per_s",
                "fs128_sgd_gram_examples_per_s",
                "fs128_sgd_pallas_examples_per_s",
                "fs128_rowwise_adagrad_examples_per_s",
                "fs128_lookup_gb_s_logical",
                "fs128_sgd_block2_examples_per_s",
                "fs128_predict_examples_per_s",
                "fs128_int8_predict_examples_per_s"):
        assert key in out, f"missing fragment {key}: {out}"
        assert out[key] > 0, (key, out[key])


def test_slope_time_rejects_negative_slopes():
    """The guard that keeps a noise-dominated slope from printing a
    negative throughput (round-4 driver log: '-0.25 ms/step')."""
    sys.path.insert(0, REPO)
    try:
        from bench import slope_time
    finally:
        sys.path.remove(REPO)

    # windows whose measured totals DECREASE with n: slope is negative,
    # the fallback (best whole-window mean) must be returned instead
    times = {4: 1.0, 12: 0.6}
    secs, fallback = slope_time(lambda n: times[n], iters=(4, 12),
                                repeats=3)
    assert fallback
    assert secs == pytest.approx(0.6 / 12)
    assert secs > 0

    # a clean positive slope passes through untouched
    times = {4: 0.9, 12: 2.5}
    secs, fallback = slope_time(lambda n: times[n], iters=(4, 12),
                                repeats=3)
    assert not fallback
    assert secs == pytest.approx((2.5 - 0.9) / 8)


@pytest.mark.slow
def test_auc_curve_script_tiny():
    """make_auc_curve.py --tiny end-to-end on CPU: the committed curve
    artifacts (AUC_CURVE.json / AUC_CURVE_fs128.json) must stay
    reproducible by a tested script, not a one-off session."""
    out = os.path.join(REPO, ".pytest_auc_tiny.json")
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "make_auc_curve.py"),
             "--tiny", "--feature-size", "16", "--batch-size", "256",
             "--steps", "40", "--eval-every", "20", "--eval-batches",
             "2", "--out", out],
            env=env, capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stderr[-3000:]
        payload = json.loads(open(out).read())
        curve = payload["curve"]
        assert len(curve) == 3
        for row in curve:
            for key in ("accuracy", "auc", "loss", "examples", "step",
                        "wall_s"):
                assert key in row
        # the planted-truth task is learnable: AUC must rise from chance
        assert curve[-1]["auc"] > curve[0]["auc"] + 0.05
    finally:
        if os.path.exists(out):
            os.remove(out)
