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


def _slice_rows(batch: Dict[str, np.ndarray], rows) -> Dict[str, np.ndarray]:
    """Multi-host feeding: each process generates the SAME global batch
    (deterministic rng) and keeps only its own rows ``[lo, hi)`` — the data
    stream is bit-identical to the single-process run by construction, the
    host-side over-generation is microseconds per batch."""
    if rows is None:
        return batch
    lo, hi = rows
    return {k: v[lo:hi] for k, v in batch.items()}


def batch_stream(config: DLRMConfig, batch: int, steps: Optional[int] = None,
                 seed: int = 0, rows=None) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    i = 0
    while steps is None or i < steps:
        yield _slice_rows(random_batch(rng, config, batch), rows)
        i += 1


class ClickthroughModel:
    """Learnable synthetic CTR ground truth with Zipf-skewed ids.

    Real Criteo ids are heavy-tailed; uniform synthetic ids miss the
    duplicate-id/dedup regimes entirely.  This generator draws per-table ids
    from a Zipf(a) distribution (rank-permuted per table so hot rows are
    scattered) and labels from a Bernoulli over a ground-truth logit: a
    latent scalar affinity per table row plus a linear dense term.  A DLRM
    can learn it, so end-to-end tests can assert AUC climbs well above 0.5.
    """

    def __init__(self, config: DLRMConfig, seed: int = 0,
                 zipf_a: float = 1.2, noise: float = 0.5):
        self.config = config
        self.zipf_a = zipf_a
        self.noise = noise
        root = np.random.default_rng(seed)
        t = config.num_tables
        scale = 1.5 / np.sqrt(t * max(config.n_hot, 1))
        self.row_affinity = [
            root.normal(0.0, scale, size=s).astype(np.float32)
            for s in config.table_sizes]
        self.perms = [root.permutation(s).astype(np.int64)
                      for s in config.table_sizes]
        self.dense_w = root.normal(0.0, 0.3, size=config.num_dense
                                   ).astype(np.float32)

    def _zipf_ids(self, rng, size, table: int):
        n = self.config.table_sizes[table]
        ranks = rng.zipf(self.zipf_a, size=size) - 1
        return self.perms[table][np.minimum(ranks, n - 1)].astype(np.int32)

    def batch(self, rng: np.random.Generator, batch: int
              ) -> Dict[str, np.ndarray]:
        c = self.config
        dense = rng.normal(size=(batch, c.num_dense)).astype(np.float32)
        shape = (batch,) if c.n_hot == 1 else (batch, c.n_hot)
        cols = [self._zipf_ids(rng, shape, t) for t in range(c.num_tables)]
        sparse = np.stack(cols, axis=1).astype(np.int32)
        logit = dense @ self.dense_w
        for t in range(c.num_tables):
            aff = self.row_affinity[t][cols[t]]
            logit = logit + (aff if c.n_hot == 1 else aff.sum(axis=1))
        logit = logit + rng.normal(0.0, self.noise, size=batch)
        labels = (rng.random(batch) < 1.0 / (1.0 + np.exp(-logit))
                  ).astype(np.float32)
        return {"dense": dense, "sparse": sparse, "labels": labels}

    def stream(self, batch: int, steps: Optional[int] = None, seed: int = 1,
               rows=None) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(seed)
        i = 0
        while steps is None or i < steps:
            yield _slice_rows(self.batch(rng, batch), rows)
            i += 1
