"""Round-trip the reference's OWN checked-in dataset through the pipeline.

The reference's data tests binarize ``test/dataset/alldays.txt`` (250
lines of the real Criteo DAC dataset) and the same rows split across
``day_0.gz..day_4.gz``, asserting sharded == monolithic vocabularies and
in-place reindexing on those exact files
(/root/reference/test/data/criteo.jl:26-77).  These tests run the same
artifacts through dlrm_tpu — if the reference's actual files ever stop
round-tripping byte-identically, this fails.

The digests below pin the full 160 B/record binary images (both the
Python and C++ parse paths must produce them bit-identically; binarize
dispatches to the native parser when built).
"""

import hashlib
import os

import numpy as np
import pytest

from dlrm_tpu.data import criteo

DATASET_DIR = "/root/reference/test/dataset"
ALLDAYS = os.path.join(DATASET_DIR, "alldays.txt")
DAYS = [os.path.join(DATASET_DIR, f"day_{i}.gz") for i in range(5)]

# sha256 of the binarized (pre-reindex) and vocab-reindexed (1-based ids,
# the reference's in-file convention) record images of alldays.txt
SHA_BINARIZED = \
    "5c1e9235de151ccfccdc5f5fef1f7e4bf0d825aff17e353fa1969bea6a328465"
SHA_REINDEXED = \
    "16375d7f63b9339b834ee77b60e101d6fb6b548218922ef3a1b8f9cf0174bc66"
# per-column vocabulary sizes over the 250 records (first-appearance order
# merge; identical for monolithic and 5-shard builds)
VOCAB_SIZES = [26, 96, 185, 155, 13, 6, 205, 22, 2, 157, 191, 182, 177,
               11, 182, 176, 9, 142, 47, 4, 179, 6, 10, 122, 16, 90]

pytestmark = pytest.mark.skipif(
    not os.path.exists(ALLDAYS),
    reason="reference dataset not mounted")


@pytest.fixture(scope="module")
def records():
    return criteo.binarize(ALLDAYS)


def test_binarize_reference_alldays_golden(records):
    assert len(records) == 250
    assert records.dtype.itemsize == 160  # criteo.jl:91-95 layout
    assert hashlib.sha256(records.tobytes()).hexdigest() == SHA_BINARIZED
    # golden-check the first line of the real dataset:
    #   0  1 1 5 0 1382 4 15 2 181 1 2 <empty> 2  68fd1e64 80e26c9b ...
    r0 = records[0]
    assert int(r0["label"]) == 0
    expect_dense = np.log1p(np.asarray(
        [1, 1, 5, 0, 1382, 4, 15, 2, 181, 1, 2, 0, 2],
        np.float64)).astype(np.float32)  # empty field -> 0 (criteo.jl:55)
    np.testing.assert_array_equal(r0["dense"], expect_dense)
    assert int(r0["dense"].view(np.uint32)[4]) == np.float32(
        7.2320104).view(np.uint32)  # bit-exact log transform
    assert [int(v) for v in r0["cat"][:4]] == [
        0x68FD1E64, 0x80E26C9B, 0xFB936136, 0x7B4723C4]  # base-16 parse
    assert int(r0["cat"][-1]) == 0x9727DD16


def test_sharded_vocab_equals_monolithic_on_reference_files(records):
    """criteo.jl:37-55 — building the vocabulary from the 5 gzip day
    shards must equal the monolithic build (same merged id maps)."""
    mono = criteo.build_vocabulary([records])
    shards = [criteo.binarize(p) for p in DAYS]
    assert [len(s) for s in shards] == [50] * 5
    np.testing.assert_array_equal(
        np.concatenate(shards).tobytes(), records.tobytes())
    sharded = criteo.build_vocabulary(shards)
    assert mono.sizes == sharded.sizes == VOCAB_SIZES
    for j in range(criteo.NUM_SPARSE):
        np.testing.assert_array_equal(
            mono.remap_column(j, records["cat"][:, j]),
            sharded.remap_column(j, records["cat"][:, j]))


def test_reindex_reference_alldays_golden(records):
    """criteo.jl:62-77 — in-place reindex to dense 1-based ids."""
    data = records.copy()
    vocab = criteo.build_vocabulary([data])
    criteo.reindex(data, vocab)
    assert hashlib.sha256(data.tobytes()).hexdigest() == SHA_REINDEXED
    # ids are 1..N per column (the reference's 1-based file convention)
    assert int(data["cat"].min()) == 1
    np.testing.assert_array_equal(data["cat"].max(axis=0), VOCAB_SIZES)
    # first record's ids are all 1 (first appearance defines id 1)
    np.testing.assert_array_equal(data[0]["cat"],
                                  np.ones(criteo.NUM_SPARSE, np.uint32))
    # labels and dense features are untouched by reindexing
    np.testing.assert_array_equal(data["label"], records["label"])
    np.testing.assert_array_equal(data["dense"], records["dense"])


def test_loader_over_reference_dataset(tmp_path, records):
    """process() end-to-end on the reference files, then DACLoader
    marshals model-ready batches (0-based ids, criteo.jl:284-344)."""
    out = str(tmp_path / "alldays.bin")
    data = criteo.process([ALLDAYS], out)
    assert hashlib.sha256(np.asarray(data).tobytes()).hexdigest() \
        == SHA_REINDEXED
    loader = criteo.DACLoader(criteo.load(out), 64)
    batches = list(loader)
    assert [len(b["labels"]) for b in batches] == [64, 64, 64]  # drops tail
    b0 = batches[0]
    assert b0["sparse"].min() >= 0  # loader shifts 1-based -> 0-based
    np.testing.assert_array_equal(
        b0["sparse"][0], np.zeros(criteo.NUM_SPARSE, np.int32))
    assert b0["sparse"].max() < max(VOCAB_SIZES)
    np.testing.assert_array_equal(b0["dense"][0], records[0]["dense"])
