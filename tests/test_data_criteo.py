"""Criteo pipeline tests, mirroring the reference's data-test strategy
(test/data/criteo.jl: record round-trip, binarize, sharded ≡ monolithic
vocabulary, in-place reindex vs line-by-line oracle) — on generated data."""

import gzip
import os

import numpy as np
import pytest

from dlrm_tpu.data import criteo, native, synthetic


@pytest.fixture(scope="module")
def text_lines():
    return synthetic.criteo_text_lines(250, seed=42)


def test_record_roundtrip(tmp_path, text_lines):
    data = criteo.parse_lines(text_lines)
    assert data.dtype.itemsize == 160  # byte-compatible with the reference
    path = str(tmp_path / "records.bin")
    mm = np.memmap(path, dtype=criteo.DAC_DTYPE, mode="w+",
                   shape=(len(data),))
    mm[:] = data
    mm.flush()
    del mm
    assert os.path.getsize(path) == 160 * len(data)
    back = criteo.load(path)
    np.testing.assert_array_equal(np.asarray(back), data)


def test_parse_semantics():
    # label, 13 dense (one missing, one negative), 26 hex (one missing)
    dense_fields = ["3", "", "-7"] + ["1"] * 10
    hex_fields = ["ff", ""] + ["a0"] * 24
    line = "\t".join(["1"] + dense_fields + hex_fields) + "\n"
    rec = criteo.parse_lines([line])[0]
    assert rec["label"] == 1
    np.testing.assert_allclose(rec["dense"][0], np.log1p(3.0))
    assert rec["dense"][1] == 0.0           # missing -> 0 -> log1p(0)=0
    assert rec["dense"][2] == 0.0           # negative clamped (criteo.jl:55)
    assert rec["cat"][0] == 0xFF
    assert rec["cat"][1] == 0               # missing hex -> 0


def test_binarize_gzip_equals_plain(tmp_path, text_lines):
    plain = tmp_path / "day.txt"
    gz = tmp_path / "day.txt.gz"
    plain.write_text("".join(text_lines))
    with gzip.open(gz, "wt") as f:
        f.write("".join(text_lines))
    a = criteo.binarize(str(plain))
    b = criteo.binarize(str(gz))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_vocab_equals_monolithic(text_lines):
    """Sharded vocabulary building ≡ monolithic (test/data/criteo.jl:36-55)."""
    data = criteo.parse_lines(text_lines)
    mono = criteo.build_vocabulary([data])
    shards = [data[:100], data[100:180], data[180:]]
    sharded = criteo.build_vocabulary(shards)
    for j in range(criteo.NUM_SPARSE):
        np.testing.assert_array_equal(mono.sorted_values[j],
                                      sharded.sorted_values[j])
        np.testing.assert_array_equal(mono.ranks[j], sharded.ranks[j])


def test_reindex_matches_oracle(text_lines):
    data = criteo.parse_lines(text_lines)
    original = data.copy()
    vocab = criteo.build_vocabulary([data])
    criteo.reindex(data, vocab)
    # oracle: first-appearance order of each column's values, ids 1..N
    for j in range(criteo.NUM_SPARSE):
        seen = {}
        for v in original["cat"][:, j]:
            if v not in seen:
                seen[v] = len(seen) + 1
        expected = np.array([seen[v] for v in original["cat"][:, j]],
                            dtype=np.uint32)
        np.testing.assert_array_equal(data["cat"][:, j], expected)
        assert data["cat"][:, j].max() == len(seen)
    # dense/labels untouched
    np.testing.assert_array_equal(data["dense"], original["dense"])
    np.testing.assert_array_equal(data["label"], original["label"])


def test_full_process_and_loader(tmp_path, text_lines):
    src = tmp_path / "train.txt"
    src.write_text("".join(text_lines))
    binpath = str(tmp_path / "train.bin")
    data = criteo.process(str(src), binpath=binpath,
                          vocab_path=str(tmp_path / "vocab.npz"))
    assert os.path.exists(binpath)
    loader = criteo.DACLoader(data, batch_size=64)
    batches = list(loader)
    assert len(batches) == len(data) // 64
    b = batches[0]
    assert b["dense"].shape == (64, 13) and b["dense"].dtype == np.float32
    assert b["sparse"].shape == (64, 26) and b["sparse"].dtype == np.int32
    assert b["sparse"].min() >= 0  # loader shifts the 1-based file ids
    assert set(np.unique(b["labels"])) <= {0.0, 1.0}
    # vocab round-trip
    vocab = criteo.Vocabulary.load(str(tmp_path / "vocab.npz"))
    assert vocab.sizes == criteo.build_vocabulary(
        [criteo.parse_lines(text_lines)]).sizes


def test_native_parser_matches_python(text_lines):
    if not native.available():
        assert native.build(), "native library should compile in this image"
    text = "".join(text_lines).encode()
    got = native.parse_buffer(text, num_threads=4)
    expected = criteo.parse_lines(text_lines)
    assert len(got) == len(expected)
    np.testing.assert_array_equal(got["label"], expected["label"])
    np.testing.assert_allclose(got["dense"], expected["dense"], rtol=1e-6)
    np.testing.assert_array_equal(got["cat"], expected["cat"])


def test_native_marshal_matches_loader(text_lines):
    """C++ marshal vs the PURE-PYTHON loader path: use_native=False pins
    the oracle side to numpy (the default loader routes through the same
    C++ code when the library is present, which would make this test
    native-vs-native and vacuous)."""
    if not native.available():
        pytest.skip("native library unavailable")
    data = criteo.parse_lines(text_lines)
    vocab = criteo.build_vocabulary([data])
    criteo.reindex(data, vocab)
    loader = criteo.DACLoader(data, batch_size=50, use_native=False)
    assert not loader._use_native()
    py_batch = next(iter(loader))
    c_batch = native.marshal_batch(np.ascontiguousarray(data), 0, 50)
    for k in ("labels", "dense", "sparse"):
        np.testing.assert_array_equal(py_batch[k], c_batch[k])
    # and the auto loader (native path) agrees with both
    auto = criteo.DACLoader(np.ascontiguousarray(data), batch_size=50)
    assert auto._use_native()
    n_batch = next(iter(auto))
    for k in ("labels", "dense", "sparse"):
        np.testing.assert_array_equal(py_batch[k], n_batch[k])


def test_native_vocab_reindex_matches_python(text_lines):
    """C++ hash-probe vocab build + reindex == the numpy Vocabulary fold:
    same first-appearance order, same sorted/rank arrays, byte-identical
    reindexed records — including across multiple shards (first
    appearance over the concatenation == the per-shard serial fold)."""
    if not native.available():
        pytest.skip("native library unavailable")
    shard_a = criteo.parse_lines(text_lines[:70])
    shard_b = criteo.parse_lines(text_lines[70:])
    vocab_py = criteo.build_vocabulary([shard_a, shard_b])
    data_py = np.concatenate([shard_a, shard_b])
    criteo.reindex(data_py, vocab_py)

    data_c = np.concatenate([criteo.parse_lines(text_lines[:70]),
                             criteo.parse_lines(text_lines[70:])])
    appear = native.build_vocab_and_reindex(data_c, reindex=True)
    vocab_c = criteo.Vocabulary.from_appearance(appear)
    assert vocab_c.sizes == vocab_py.sizes
    for j in range(26):
        np.testing.assert_array_equal(vocab_c.sorted_values[j],
                                      vocab_py.sorted_values[j])
        np.testing.assert_array_equal(vocab_c.ranks[j], vocab_py.ranks[j])
    np.testing.assert_array_equal(data_c.view(np.uint8),
                                  data_py.view(np.uint8))


def test_process_native_matches_python(tmp_path, text_lines):
    """process() end to end: the native fast path and the forced numpy
    path produce identical binaries and vocab files."""
    if not native.available():
        pytest.skip("native library unavailable")
    src = tmp_path / "day.txt"
    src.write_text("".join(text_lines))
    out_n = str(tmp_path / "n.bin")
    out_p = str(tmp_path / "p.bin")
    criteo.process([str(src)], binpath=out_n,
                   vocab_path=str(tmp_path / "n.npz"))
    criteo.process([str(src)], binpath=out_p,
                   vocab_path=str(tmp_path / "p.npz"), use_native=False)
    a = np.fromfile(out_n, np.uint8)
    b = np.fromfile(out_p, np.uint8)
    np.testing.assert_array_equal(a, b)
    zn = np.load(str(tmp_path / "n.npz"))
    zp = np.load(str(tmp_path / "p.npz"))
    assert sorted(zn.files) == sorted(zp.files)
    for k in zn.files:
        np.testing.assert_array_equal(zn[k], zp[k])


def test_native_parser_rejects_malformed():
    if not native.available():
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError):
        native.parse_buffer(b"1\t2\t3\n")  # too few fields


def test_native_boundary_guards():
    """The ctypes layer must refuse buffers the C++ side would stride
    past: wrong dtype (it reads/writes n x 160-byte DacRecords),
    strided views (wrong base-pointer walk), and out-of-range marshal
    windows (it trusts [start, start+count))."""
    if not native.available():
        pytest.skip("native library unavailable")
    data = np.ascontiguousarray(
        criteo.parse_lines(synthetic.criteo_text_lines(20, seed=1)))
    wrong = np.zeros(20, np.float32)
    with pytest.raises(ValueError, match="DAC_DTYPE"):
        native.build_vocab_and_reindex(wrong)
    with pytest.raises(ValueError, match="DAC_DTYPE"):
        native.marshal_batch(wrong, 0, 4)
    with pytest.raises(ValueError, match="contiguous"):
        native.marshal_batch(data[::2], 0, 4)
    # (4, -1): start+count is in range, only the count<0 clause rejects
    for start, count in ((-1, 4), (18, 4), (0, 21), (4, -1)):
        with pytest.raises(ValueError, match="range"):
            native.marshal_batch(data, start, count)
    # in-range still works
    got = native.marshal_batch(data, 16, 4)
    assert got["labels"].shape == (4,)


def test_loader_shuffle_covers_all_batches():
    """Shuffled loader yields every batch window exactly once per epoch, in
    a different (seeded, deterministic) order each epoch."""
    import numpy as np
    from dlrm_tpu.data import synthetic
    from dlrm_tpu.data.criteo import DACLoader, parse_lines

    data = parse_lines(synthetic.criteo_text_lines(96, seed=3))
    plain = [b["labels"] for b in DACLoader(data, 16)]
    loader = DACLoader(data, 16, shuffle=True, seed=7)
    epoch1 = [b["labels"] for b in loader]
    epoch2 = [b["labels"] for b in loader]

    def keyset(batches):
        return sorted(tuple(b.tolist()) for b in batches)

    assert keyset(epoch1) == keyset(plain)
    assert keyset(epoch2) == keyset(plain)
    assert [tuple(b.tolist()) for b in epoch1] != \
        [tuple(b.tolist()) for b in epoch2]
    # deterministic given seed
    loader2 = DACLoader(data, 16, shuffle=True, seed=7)
    again = [b["labels"] for b in loader2]
    assert [tuple(b.tolist()) for b in again] == \
        [tuple(b.tolist()) for b in epoch1]


def test_loader_row_shuffle_covers_all_rows_and_bounds_locality():
    """Row shuffle (MLPerf protocol; the reference never shuffles): every
    ROW appears exactly once per epoch, composition differs from the
    sequential stream AND across epochs, rows never leave their
    shuffle_window (bounded mmap locality), and the stream is
    deterministic in (seed, epoch)."""
    import numpy as np
    from dlrm_tpu.data import synthetic
    from dlrm_tpu.data.criteo import DACLoader, parse_lines

    n, b, w = 96, 8, 3
    data = parse_lines(synthetic.criteo_text_lines(n, seed=3))
    # unique per-row fingerprint: the dense feature vector
    plain = np.concatenate(
        [bt["dense"] for bt in DACLoader(data, b)])
    row_key = {tuple(r): i for i, r in enumerate(plain.tolist())}
    assert len(row_key) == n

    loader = DACLoader(data, b, shuffle_rows=True, shuffle_window=w,
                       seed=5)
    ep1 = list(loader)
    ep2 = list(loader)

    def row_ids(batches):
        return [[row_key[tuple(r)] for r in bt["dense"].tolist()]
                for bt in batches]

    ids1, ids2 = row_ids(ep1), row_ids(ep2)
    assert sorted(x for bt in ids1 for x in bt) == list(range(n))
    assert sorted(x for bt in ids2 for x in bt) == list(range(n))
    assert ids1 != ids2                       # epochs differ
    # rows stay within their window of origin
    for bt in ids1:
        lo = (min(bt) // (b * w)) * (b * w)
        assert max(bt) < lo + b * w
    # intra-batch composition actually changed vs the sequential stream
    seq = [list(range(k * b, (k + 1) * b)) for k in range(n // b)]
    assert sorted(map(sorted, ids1)) != sorted(map(sorted, seq))
    # deterministic in (seed, epoch)
    again = row_ids(list(DACLoader(data, b, shuffle_rows=True,
                                   shuffle_window=w, seed=5)))
    assert again == ids1


def test_loader_row_shuffle_early_stop_advances_epoch():
    """A consumer that stops mid-epoch and re-iterates must get a FRESH
    permutation (the epoch bumps eagerly, like the window-shuffle branch)
    — not a replay of the aborted epoch's order."""
    from dlrm_tpu.data import synthetic
    from dlrm_tpu.data.criteo import DACLoader, parse_lines

    data = parse_lines(synthetic.criteo_text_lines(96, seed=3))
    loader = DACLoader(data, 8, shuffle_rows=True, shuffle_window=3,
                       seed=5)

    def first_batches(k):
        out = []
        for i, bt in enumerate(loader):
            out.append(bt["dense"].tolist())
            if i + 1 >= k:
                break
        return out

    a = first_batches(3)
    b = first_batches(3)
    assert a != b  # aborted epoch still advanced the permutation


def test_loader_row_shuffle_local_rows_stripe():
    """Multi-host feeding composes with the row shuffle: two processes'
    local stripes concatenate to exactly the single-process batch."""
    from dlrm_tpu.data import synthetic
    from dlrm_tpu.data.criteo import DACLoader, parse_lines

    data = parse_lines(synthetic.criteo_text_lines(64, seed=9))
    b = 8
    full = list(DACLoader(data, b, shuffle_rows=True, shuffle_window=2,
                          seed=11))
    p0 = list(DACLoader(data, b, shuffle_rows=True, shuffle_window=2,
                        seed=11, local_rows=(0, 4)))
    p1 = list(DACLoader(data, b, shuffle_rows=True, shuffle_window=2,
                        seed=11, local_rows=(4, 8)))
    assert len(full) == len(p0) == len(p1)
    for f, a, c in zip(full, p0, p1):
        for k in f:
            np.testing.assert_array_equal(
                np.concatenate([a[k], c[k]]), f[k])


def test_loader_random_access_getitem(text_lines):
    """Extractor-style random access (reference train/data.jl:37-56):
    loader[i] marshals batch i on demand, equal to the i-th sequential
    batch; negative indices and the ragged tail work; out-of-range
    raises."""
    data = criteo.parse_lines(text_lines[:83])
    loader = criteo.DACLoader(data, 16, drop_remainder=False,
                              use_native=False)
    seq = list(loader)
    assert len(loader) == 6 and len(seq[-1]["labels"]) == 3
    for i in range(len(loader)):
        got = loader[i]
        for k in ("labels", "dense", "sparse"):
            np.testing.assert_array_equal(got[k], seq[i][k])
    np.testing.assert_array_equal(loader[-1]["labels"], seq[-1]["labels"])
    with pytest.raises(IndexError):
        loader[6]
    with pytest.raises(IndexError):
        loader[-7]
    # native marshal agrees (when built)
    if native.available():
        loader_n = criteo.DACLoader(data, 16, drop_remainder=False)
        for i in (0, 3, 5):
            got = loader_n[i]
            for k in ("labels", "dense", "sparse"):
                np.testing.assert_array_equal(got[k], seq[i][k])
    # local_rows striping: loader[i] returns this process's stripe
    lr = criteo.DACLoader(data[:80], 16, local_rows=(4, 12),
                          use_native=False)
    np.testing.assert_array_equal(
        lr[2]["labels"],
        criteo.DACLoader(data[:80], 16, use_native=False)[2]
        ["labels"][4:12])


def test_native_parser_strictness_matches_python():
    """Malformed inputs that the Python path rejects must not parse
    SILENTLY differently on the C++ path (empty label -> 0, >32-bit hex
    ids truncated, >18-digit dense overflow were all silent divergences):
    both paths now raise."""
    if not native.available():
        pytest.skip("native library not built")
    good = "1\t" + "\t".join(["2"] * 13) + "\t" + "\t".join(["a"] * 26)

    def mutate(field_i, value):
        f = good.split("\t")
        f[field_i] = value
        return "\t".join(f)

    bad_lines = [
        mutate(0, ""),             # empty label
        mutate(0, "99999999999999999999"),  # label overflow
        mutate(5, "99999999999999999999"),  # dense overflow (>18 digits)
        mutate(20, "fffffffff"),   # 36-bit hex id (> uint32)
    ]
    for line in bad_lines:
        with pytest.raises((ValueError, OverflowError)):
            criteo.parse_lines([line])
        with pytest.raises(ValueError):
            native.parse_buffer((line + "\n").encode())
    # leading zeros in hex stay fine (value-bounded, not digit-bounded)
    ok = mutate(20, "00000000000000ff")
    got = native.parse_buffer((ok + "\n").encode())
    assert int(got[0]["cat"][6]) == 0xFF
    np.testing.assert_array_equal(got.tobytes(),
                                  criteo.parse_lines([ok]).tobytes())


def test_native_parser_error_reports_line_number():
    if not native.available():
        pytest.skip("native library not built")
    good = "0\t" + "\t".join(["1"] * 13) + "\t" + "\t".join(["b"] * 26)
    text = (good + "\n") * 3 + "garbage line\n" + (good + "\n")
    with pytest.raises(ValueError, match="line 4"):
        native.parse_buffer(text.encode())


def test_validate_ids_catches_config_mismatch(text_lines):
    """validate_ids: the loud off-hot-path guard for ids that would
    silently read/corrupt a NEIGHBORING table inside a shared storage
    chunk (the engine has no per-id bound check by design)."""
    data = criteo.parse_lines(text_lines[:50]).copy()
    vocab = criteo.build_vocabulary([data])
    criteo.reindex(data, vocab)
    criteo.validate_ids(data, vocab.sizes)  # matching config: clean
    too_small = list(vocab.sizes)
    too_small[7] -= 1  # config claims one fewer row than the data uses
    with pytest.raises(ValueError, match="column 7"):
        criteo.validate_ids(data, too_small)
    # raw (not reindexed) hex ids vs vocab sizes fail immediately
    with pytest.raises(ValueError, match="column 0"):
        criteo.validate_ids(criteo.parse_lines(text_lines[:50]),
                            vocab.sizes)
