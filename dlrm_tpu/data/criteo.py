"""Criteo DAC preprocessing pipeline and memory-mapped batch loader.

Reproduces the reference's data layer (/root/reference/src/data/criteo.jl)
with a byte-compatible on-disk format, so binary files produced by either
implementation interoperate:

* **Record layout** (criteo.jl:91-95): little-endian packed 160-byte record
  = int32 label + 13 x float32 log-transformed dense + 26 x uint32
  categorical.  Here it is a numpy structured dtype over an ``np.memmap``
  (the analog of Julia's bit-compatible struct mmap, criteo.jl:114-123).
* **binarize** (criteo.jl:137-178): tab-separated text -> records.  Dense
  fields parse as base-10 ints, empty -> 0, then ``log(max(x,0)+1)``
  (criteo.jl:55); categorical fields parse as base-16, empty -> 0.  A C++
  fast path (native/) does the parsing when built; this module is the
  reference implementation and fallback.
* **Vocabulary building** (criteo.jl:194-264): per-column unique values in
  FIRST-APPEARANCE order, merged serially across shards for determinism
  (criteo.jl:229-238), then remapped to dense ids 1..N **in the file**
  (matching the reference's 1-based convention so reindexed binaries are
  identical); the loader shifts to 0-based for the model.
* **DACLoader** (criteo.jl:284-344): batched marshaling of the mmap into
  (labels (B,), dense (B,13), sparse (B,26)) arrays.  The reference uses 8
  Polyester threads; here the marshaling is three vectorized strided copies
  and batches stream to the device asynchronously (see loader.py).
"""

from __future__ import annotations

import gzip
import math
import os
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

NUM_DENSE = 13
NUM_SPARSE = 26

# Byte-compatible with the reference's DACRecord (criteo.jl:91-95): 160 B.
DAC_DTYPE = np.dtype([
    ("label", "<i4"),
    ("dense", "<f4", (NUM_DENSE,)),
    ("cat", "<u4", (NUM_SPARSE,)),
])
assert DAC_DTYPE.itemsize == 160


def _open_maybe_gzip(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def log_transform(x: np.ndarray) -> np.ndarray:
    """log(max(x, 0) + 1), the reference's logtransform (criteo.jl:55).

    Computed in float64 and rounded once to float32 so the Python and C++
    (native/dlrm_data.cpp) paths produce bit-identical records.
    """
    return np.log1p(np.maximum(x.astype(np.float64), 0.0)).astype(np.float32)


def parse_lines(lines: Iterable[str]) -> np.ndarray:
    """Parse Criteo text lines into a DAC_DTYPE record array (Python path)."""
    rows = []
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        f = line.split("\t")
        if len(f) != 1 + NUM_DENSE + NUM_SPARSE:
            raise ValueError(
                f"expected {1 + NUM_DENSE + NUM_SPARSE} tab-separated "
                f"fields, got {len(f)}")
        label = int(f[0])
        dense = [int(v) if v else 0 for v in f[1:1 + NUM_DENSE]]
        cat = [int(v, 16) if v else 0 for v in f[1 + NUM_DENSE:]]
        rows.append((label, dense, cat))
    out = np.zeros(len(rows), dtype=DAC_DTYPE)
    if rows:
        out["label"] = [r[0] for r in rows]
        out["dense"] = log_transform(np.asarray([r[1] for r in rows],
                                                dtype=np.int64))
        out["cat"] = np.asarray([r[2] for r in rows], dtype=np.uint32)
    return out


def _native_parse_stream(fobj, chunk_bytes: int = 256 << 20
                         ) -> List[np.ndarray]:
    """Stream a (possibly gzip-wrapped) binary file through the C++ parser
    in bounded text chunks cut at line boundaries — peak memory stays
    ~chunk_bytes + this chunk's records, never the whole decompressed day
    (a Terabyte day is ~45 GB of text)."""
    from dlrm_tpu.data import native

    chunks: List[np.ndarray] = []
    buf = b""
    while True:
        block = fobj.read(chunk_bytes)
        if not block:
            break
        buf += block
        cut = buf.rfind(b"\n")
        if cut < 0:
            continue
        chunks.append(native.parse_buffer(buf[:cut + 1]))
        buf = buf[cut + 1:]
    if buf.strip():
        chunks.append(native.parse_buffer(buf))
    return chunks


def binarize(src: str, dst: Optional[str] = None,
             chunk_lines: int = 1 << 18,
             use_native: Optional[bool] = None) -> np.ndarray:
    """Text (optionally .gz) -> binary records; returns the record array.

    Writes to ``dst`` when given (mmap-backed, grown incrementally like the
    reference's grow-mmap, criteo.jl:120-123), else stays in memory.
    Uses the C++ parser from dlrm_tpu.data.native when available
    (streaming in bounded chunks; ``use_native=False`` forces the Python
    reference parser).
    """
    from dlrm_tpu.data import native  # lazy: optional .so

    if use_native is not False and native.available():
        opener = (lambda: gzip.open(src, "rb")) if src.endswith(".gz") \
            else (lambda: open(src, "rb"))
        with opener() as f:
            chunks = _native_parse_stream(f)
    else:
        chunks = []
        with _open_maybe_gzip(src) as f:
            batch: List[str] = []
            for line in f:
                batch.append(line)
                if len(batch) >= chunk_lines:
                    chunks.append(parse_lines(batch))
                    batch = []
            if batch:
                chunks.append(parse_lines(batch))
    data = (np.concatenate(chunks) if chunks
            else np.zeros(0, dtype=DAC_DTYPE))
    if dst is not None:
        mm = np.memmap(dst, dtype=DAC_DTYPE, mode="w+", shape=(len(data),))
        mm[:] = data
        mm.flush()
        return mm
    return data


def load(path: str, writable: bool = False) -> np.ndarray:
    """Mmap a binarized dataset (criteo.jl:114-118)."""
    return np.memmap(path, dtype=DAC_DTYPE, mode="r+" if writable else "r")


class Vocabulary:
    """Per-column value -> dense-id maps in first-appearance order.

    ``maps[j]`` sends raw uint32 values of column j to ids 1..N_j (1-based
    in the file format, per the reference; the loader shifts to 0-based).
    Internally each column keeps (sorted_values, rank) so remapping is a
    vectorized searchsorted instead of a Python dict walk.
    """

    def __init__(self):
        self.sorted_values: List[np.ndarray] = [
            np.zeros(0, np.uint32) for _ in range(NUM_SPARSE)]
        self.ranks: List[np.ndarray] = [
            np.zeros(0, np.uint32) for _ in range(NUM_SPARSE)]

    @property
    def sizes(self) -> List[int]:
        return [len(v) for v in self.sorted_values]

    def update(self, data: np.ndarray) -> "Vocabulary":
        """Fold one shard's values in, preserving first-appearance order
        across shards (serial merge, like reindex(setsvector),
        criteo.jl:229-238)."""
        cat = np.asarray(data["cat"])
        for j in range(NUM_SPARSE):
            col = cat[:, j]
            # first-appearance unique within this shard
            uniq, first_idx = np.unique(col, return_index=True)
            order = np.argsort(first_idx, kind="stable")
            appear = uniq[order]
            known = self.sorted_values[j]
            if len(known):
                fresh = appear[~_is_member(appear, known)]
            else:
                fresh = appear
            if len(fresh):
                n0 = len(known)
                new_ranks = np.arange(n0, n0 + len(fresh), dtype=np.uint32)
                merged = np.concatenate([known, fresh])
                merged_ranks = np.concatenate([self.ranks[j], new_ranks])
                srt = np.argsort(merged, kind="stable")
                self.sorted_values[j] = merged[srt]
                self.ranks[j] = merged_ranks[srt]
        return self

    def remap_column(self, j: int, values: np.ndarray) -> np.ndarray:
        """values -> 1-based dense ids."""
        pos = np.searchsorted(self.sorted_values[j], values)
        if np.any(pos >= len(self.sorted_values[j])) or np.any(
                self.sorted_values[j][pos] != values):
            raise KeyError(f"column {j}: value not in vocabulary")
        return (self.ranks[j][pos] + 1).astype(np.uint32)

    def save(self, path: str) -> None:
        np.savez(path, **{
            f"v{j}": self.sorted_values[j] for j in range(NUM_SPARSE)
        }, **{f"r{j}": self.ranks[j] for j in range(NUM_SPARSE)})

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        z = np.load(path)
        v = cls()
        v.sorted_values = [z[f"v{j}"] for j in range(NUM_SPARSE)]
        v.ranks = [z[f"r{j}"] for j in range(NUM_SPARSE)]
        return v

    @classmethod
    def from_appearance(cls, appear: Sequence[np.ndarray]) -> "Vocabulary":
        """Build from per-column values in first-appearance order (the
        C++ vocab builder's export format, native.build_vocab_and_reindex)."""
        v = cls()
        for j, a in enumerate(appear):
            a = np.asarray(a, np.uint32)
            srt = np.argsort(a, kind="stable")
            v.sorted_values[j] = a[srt]
            v.ranks[j] = srt.astype(np.uint32)
        return v


def _is_member(a: np.ndarray, sorted_b: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_b, a)
    pos = np.minimum(pos, len(sorted_b) - 1)
    return sorted_b[pos] == a


def build_vocabulary(shards: Sequence[np.ndarray]) -> Vocabulary:
    """Serial fold over shards (determinism, criteo.jl:229-238)."""
    vocab = Vocabulary()
    for data in shards:
        vocab.update(data)
    return vocab


def reindex(data: np.ndarray, vocab: Vocabulary) -> None:
    """In-place rewrite of categorical columns to dense 1-based ids
    (criteo.jl:256-264)."""
    cat = data["cat"]
    for j in range(NUM_SPARSE):
        cat[:, j] = vocab.remap_column(j, np.asarray(cat[:, j]))
    data["cat"] = cat  # memmap write-back for structured views


def process(paths, binpath: Optional[str] = None,
            vocab_path: Optional[str] = None,
            use_native: Optional[bool] = None) -> np.ndarray:
    """Full pipeline (criteo.jl:271-278): binarize all shards (concatenated
    into one binary), build vocabulary, reindex in place.

    The C++ engine does the vocabulary build + reindex in one hash-probe
    pass over the concatenated records (first-appearance order over the
    concatenation == the Python per-shard serial fold, tested); the numpy
    path remains as reference and fallback (``use_native=False``).
    """
    from dlrm_tpu.data import native

    if isinstance(paths, str):
        paths = [paths]
    shards = [binarize(p, use_native=use_native) for p in paths]
    data = np.concatenate([np.asarray(s) for s in shards]) if len(
        shards) > 1 else np.asarray(shards[0])
    if binpath is not None:
        mm = np.memmap(binpath, dtype=DAC_DTYPE, mode="w+",
                       shape=(len(data),))
        mm[:] = data
        data = mm
    native_ok = (use_native is not False and native.available()
                 and data.flags["C_CONTIGUOUS"]
                 and data.flags["WRITEABLE"])
    if native_ok:
        appear = native.build_vocab_and_reindex(data, reindex=True)
        vocab = Vocabulary.from_appearance(appear)
    else:
        vocab = build_vocabulary(shards)
        reindex(data, vocab)
    if isinstance(data, np.memmap):
        data.flush()
    if vocab_path is not None:
        vocab.save(vocab_path)
    return data


def validate_ids(data: np.ndarray, table_sizes: Sequence[int], *,
                 chunk: int = 1 << 20, one_based: bool = True) -> None:
    """Scan every categorical id against its table size (bounded-memory
    chunks; a Terabyte-scale mmap streams through).

    The compute engine deliberately has NO per-id bound check in the hot
    path (one compare per id on every lookup/scatter); an id past its
    table's size but inside the table's storage chunk would silently
    read/corrupt the NEXT table.  This scan is the loud, off-hot-path
    guard for config/dataset mismatches — run it once per (dataset,
    config) pairing (run.py --validate-data).
    """
    sizes = np.asarray(table_sizes, np.int64)
    if sizes.shape[0] != NUM_SPARSE:
        raise ValueError(f"expected {NUM_SPARSE} table sizes, got "
                         f"{sizes.shape[0]}")
    lo = 1 if one_based else 0
    for start in range(0, len(data), chunk):
        cat = data["cat"][start:start + chunk].astype(np.int64)
        bad = (cat < lo) | (cat >= sizes[None, :] + lo)
        if bad.any():
            i, j = map(int, np.argwhere(bad)[0])
            raise ValueError(
                f"record {start + i}, column {j}: id {int(cat[i, j])} "
                f"outside [{lo}, {int(sizes[j]) + lo}) — the dataset does "
                "not match this config's table sizes (wrong --table-sizes/"
                "--config, or the file was never vocab-reindexed)")


class DACLoader:
    """Batched iterator over a binarized dataset.

    Yields dicts of numpy arrays: labels (B,) f32, dense (B,13) f32,
    sparse (B,26) int32 **0-based** (file ids are 1-based; shift here).
    Mirrors the reference DACLoader (criteo.jl:312-344): fixed batch size,
    trailing partial batch dropped.
    """

    def __init__(self, dataset: np.ndarray, batch_size: int, *,
                 drop_remainder: bool = True, zero_based_file: bool = False,
                 shuffle: bool = False, shuffle_rows: bool = False,
                 shuffle_window: int = 8, seed: int = 0,
                 use_native: Optional[bool] = None,
                 local_rows: Optional[tuple] = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.drop_remainder = drop_remainder
        self.shuffle = shuffle
        # chunked-permutation ROW shuffle (the north-star MLPerf protocol
        # shuffles rows; the reference doesn't shuffle at all): rows are
        # permuted WITHIN a window of ``shuffle_window`` consecutive
        # batches and the window order is permuted per epoch — mmap reads
        # stay sequential per window (locality bounded to window_rows*160 B)
        # while intra-batch composition decorrelates across epochs.
        self.shuffle_rows = shuffle_rows
        self.shuffle_window = max(int(shuffle_window), 1)
        self.seed = seed
        self._epoch = 0
        self._shift = 0 if zero_based_file else 1
        # None = auto (C++ marshal when the library is loadable);
        # False forces the numpy fallback (tests oracle it against C++)
        self.use_native = use_native
        # multi-host feeding (mesh.local_batch_rows): marshal only rows
        # [lo, hi) of every batch window — a true per-process stride into
        # the mmap, the other processes' records are never touched.  Batch
        # order/shuffle stay GLOBAL (identical (seed, epoch) permutation on
        # every process) so the union over processes is exactly the
        # single-process stream.  Requires full batches (drop_remainder).
        if local_rows is not None:
            lo, hi = local_rows
            if not (0 <= lo < hi <= self.batch_size):
                raise ValueError(f"local_rows {local_rows} outside batch "
                                 f"size {self.batch_size}")
            if not drop_remainder and len(dataset) % self.batch_size:
                raise ValueError("local_rows needs drop_remainder=True "
                                 "(a ragged tail batch has no well-defined "
                                 "per-process stripe)")
        self.local_rows = local_rows

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_remainder and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _use_native(self) -> bool:
        """The C++ marshal reads the packed 160 B records directly; it
        needs the base array contiguous in DAC layout (memmap or ndarray,
        not a strided view)."""
        from dlrm_tpu.data import native

        if self.use_native is False:
            return False
        d = self.dataset
        return (native.available() and d.dtype == DAC_DTYPE
                and d.flags["C_CONTIGUOUS"])

    def _marshal(self, start: int, count: int) -> Dict[str, np.ndarray]:
        if self._use_native():
            from dlrm_tpu.data import native

            # one C++ pass: label/dense/sparse marshal with the id shift
            # fused (the reference's 8-thread Polyester loop,
            # criteo.jl:324-344)
            return native.marshal_batch(self.dataset, start, count,
                                        self._shift)
        window = self.dataset[start:start + count]
        return {
            "labels": window["label"].astype(np.float32),
            "dense": np.ascontiguousarray(window["dense"]),
            "sparse": (window["cat"].astype(np.int64)
                       - self._shift).astype(np.int32),
        }

    def _iter_shuffled_rows(self, epoch: int
                            ) -> Iterator[Dict[str, np.ndarray]]:
        """Chunked-permutation row shuffle: marshal ``shuffle_window``
        batches' worth of consecutive rows at once, permute the rows, emit
        the window's batches from the permuted arrays.  Window order is
        permuted too.  Deterministic in (seed, epoch) — every multi-host
        process computes the identical permutation and slices its own
        ``local_rows`` stripe of each permuted batch."""
        b = self.batch_size
        n_batches = len(self)
        w = self.shuffle_window
        n_windows = -(-n_batches // w)
        worder = np.random.default_rng(
            (self.seed, 1, epoch)).permutation(n_windows)
        for wi in (int(x) for x in worder):
            first = wi * w           # first global batch of this window
            n_here = min(n_batches - first, w)
            count = min(n_here * b, len(self.dataset) - first * b)
            batch = self._marshal(first * b, count)
            # per-window rng keyed by (seed, epoch, window index): no
            # global index state, O(window) memory at any dataset scale
            perm = np.random.default_rng(
                (self.seed, 2, epoch, wi)).permutation(count)
            for k in range(n_here):
                rows_k = perm[k * b:min((k + 1) * b, count)]
                if self.local_rows is not None:
                    rows_k = rows_k[self.local_rows[0]:self.local_rows[1]]
                yield {key: v[rows_k] for key, v in batch.items()}

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        """Random access to batch ``i`` in dataset order — the reference's
        extractor-style ``getindex(batch_i)`` (train/data.jl:37-56), which
        marshals an arbitrary batch on demand.  Indexing is over the
        UNSHUFFLED sequence (the reference extractor is a plain indexed
        view; shuffle orders only apply to iteration).  Supports negative
        indices; honors ``local_rows`` striping and the ragged tail when
        ``drop_remainder=False``."""
        n = len(self)
        if i < 0:
            i += n
        if not 0 <= i < n:
            raise IndexError(f"batch index {i} out of range for {n} "
                             "batches")
        b = self.batch_size
        count = min(b, len(self.dataset) - i * b)
        lo, hi = self.local_rows if self.local_rows is not None else (0, b)
        start = i * b + min(lo, count)
        count = min(hi, count) - min(lo, count)
        return self._marshal(start, count)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.shuffle_rows:
            # bump the epoch EAGERLY (like the shuffle branch below): a
            # consumer that stops mid-epoch and re-iterates must get a
            # fresh permutation, not a replay of the last one
            self._epoch += 1
            yield from self._iter_shuffled_rows(self._epoch - 1)
            return
        b = self.batch_size
        order = None
        if self.shuffle:
            # shuffle BATCH WINDOWS, not rows: keeps the mmap reads
            # sequential within a batch (the loader's locality win,
            # criteo.jl:324) while decorrelating batch order across epochs
            rng = np.random.default_rng((self.seed, self._epoch))
            order = rng.permutation(len(self))
            self._epoch += 1
        lo, hi = self.local_rows if self.local_rows is not None else (0, b)
        for i in range(len(self)):
            j = int(order[i]) if order is not None else i
            count = min(b, len(self.dataset) - j * b)
            start = j * b + min(lo, count)
            count = min(hi, count) - min(lo, count)
            yield self._marshal(start, count)
