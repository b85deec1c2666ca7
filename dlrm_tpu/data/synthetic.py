"""Synthetic data generators: Criteo-format text and device batches.

The reference ships a 250-line text fixture for pipeline tests; we generate
equivalent-format data on the fly (same tab-separated schema: label, 13
base-10 ints with empties, 26 base-16 ids with empties) so tests own their
inputs.  Also provides ready-made device batch streams for training
benchmarks and smoke tests.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.criteo import NUM_DENSE, NUM_SPARSE


def criteo_text_lines(n: int, seed: int = 0, missing_prob: float = 0.1,
                      vocab: int = 1000) -> list:
    """Generate n Criteo-format text lines (with missing fields)."""
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(n):
        fields = [str(int(rng.integers(0, 2)))]
        for _ in range(NUM_DENSE):
            if rng.random() < missing_prob:
                fields.append("")
            else:
                # reference log-transform clamps negatives; include some
                fields.append(str(int(rng.integers(-5, 10000))))
        for _ in range(NUM_SPARSE):
            if rng.random() < missing_prob:
                fields.append("")
            else:
                fields.append(format(int(rng.integers(0, vocab)), "x"))
        lines.append("\t".join(fields) + "\n")
    return lines


def random_batch(rng: np.random.Generator, config: DLRMConfig, batch: int,
                 ) -> Dict[str, np.ndarray]:
    """One random device-ready batch for the given model config."""
    dense = rng.normal(size=(batch, config.num_dense)).astype(np.float32)
    if config.n_hot == 1:
        sparse = np.stack([rng.integers(0, s, size=batch)
                           for s in config.table_sizes], axis=1)
    else:
        sparse = np.stack([rng.integers(0, s, size=(batch, config.n_hot))
                           for s in config.table_sizes], axis=1)
    labels = (rng.random(batch) > 0.5).astype(np.float32)
    return {"dense": dense, "sparse": sparse.astype(np.int32),
            "labels": labels}


def batch_stream(config: DLRMConfig, batch: int, steps: Optional[int] = None,
                 seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    i = 0
    while steps is None or i < steps:
        yield random_batch(rng, config, batch)
        i += 1
