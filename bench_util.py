"""Shared helpers for the repo-root bench scripts (bench.py,
bench_b2048.py, bench_fs128_tune.py)."""

import json
import sys


def init_devices(metric: str, unit: str = "examples/s/chip",
                 timeout_s: float = 300.0):
    """Backend init with a watchdog: if the TPU transport is down,
    jax.devices() blocks forever retrying the dial — fail fast with a
    diagnostic JSON line (exit 2) instead of hanging the driver."""
    import threading

    box = {}

    def _init():
        import jax
        box["devices"] = jax.devices()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in box:
        print(f"FATAL: jax backend init did not complete in "
              f"{timeout_s:.0f}s — TPU transport down?",
              file=sys.stderr, flush=True)
        print(json.dumps({"metric": metric, "value": 0, "unit": unit,
                          "vs_baseline": 0,
                          "error": "device init timeout"}))
        sys.exit(2)
    return box["devices"]
