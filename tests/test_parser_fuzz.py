"""Differential fuzz: the native C++ data engine vs the Python reference
implementation (data/criteo.py docstring names the Python path as the
reference; native/dlrm_data.cpp must agree BIT-for-bit on accepts and
agree on rejects).

Seeded, deterministic "fuzz": a grammar of valid tokens (empty fields,
negative dense, 18-digit dense, mixed-case 32-bit hex) and malformed
mutations (wrong field counts, junk tokens, >18-digit dense, >32-bit
hex, empty labels) is sampled into whole buffers; each buffer must
either parse identically on both paths or be rejected by both.

Out of grammar (documented, not bugs): whitespace-padded numeric tokens
and CR line endings — Python's ``int()`` tolerates surrounding
whitespace accidentally; real DAC files contain neither, and the native
parser is deliberately strict.
"""

import numpy as np
import pytest

from dlrm_tpu.data import criteo, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _label_token(rng):
    r = rng.random()
    if r < 0.70:
        return str(rng.integers(0, 2)), True
    if r < 0.85:
        return str(rng.integers(-3, 10)), True
    if r < 0.95:
        return "", False          # empty label: reject (both paths)
    return "x", False             # junk: reject


def _dense_token(rng):
    r = rng.random()
    if r < 0.35:
        return "", True
    if r < 0.70:
        return str(rng.integers(0, 10_000)), True
    if r < 0.80:
        return str(-rng.integers(1, 1000)), True   # negative: log clamps
    if r < 0.88:
        # 18 digits: the widest the native parser accepts; fits int64
        return str(rng.integers(10**17, 10**18 - 1)), True
    if r < 0.94:
        # 19-20 digits: rejected by both (native digit cap; numpy int64
        # conversion overflow on the Python path)
        return str(rng.integers(10**17, 10**18)) + "99", False
    return "1.5" if rng.random() < 0.5 else "abc", False


def _cat_token(rng):
    r = rng.random()
    if r < 0.30:
        return "", True
    if r < 0.75:
        h = format(rng.integers(0, 2**32), "x")
        return (h.upper() if rng.random() < 0.3 else h), True
    if r < 0.85:
        return format(rng.integers(0, 2**32), "08x"), True  # zero-padded
    if r < 0.93:
        # 9-12 hex digits, guaranteed > 32 bits: rejected by both
        return format(rng.integers(2**32, 2**48), "x"), False
    return "g5", False            # non-hex junk: reject


def _random_line(rng):
    """(line_text, is_valid) — one sampled Criteo line."""
    lab, ok = _label_token(rng)
    fields, valid = [lab], ok
    for _ in range(criteo.NUM_DENSE):
        t, o = _dense_token(rng)
        fields.append(t)
        valid &= o
    for _ in range(criteo.NUM_SPARSE):
        t, o = _cat_token(rng)
        fields.append(t)
        valid &= o
    # structural mutations
    r = rng.random()
    if r < 0.03:
        fields = fields[:-1]      # one field short: reject
        valid = False
    elif r < 0.06:
        fields = fields + [""]    # one field long: reject
        valid = False
    return "\t".join(fields), valid


def _python_parse(text: bytes):
    return criteo.parse_lines(text.decode().split("\n"))


@pytest.mark.parametrize("seed", range(24))
def test_parse_differential_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    n_lines = int(rng.integers(1, 60))
    lines, all_valid = [], True
    for _ in range(n_lines):
        if rng.random() < 0.04:
            lines.append("")      # blank line: skipped by both
            continue
        line, ok = _random_line(rng)
        lines.append(line)
        all_valid &= ok
    text = "\n".join(lines)
    if rng.random() < 0.8:
        text += "\n"              # with/without trailing newline
    buf = text.encode()

    try:
        py = _python_parse(buf)
        py_ok = True
    except (ValueError, OverflowError):
        py_ok = False
    try:
        nat = native.parse_buffer(buf)
        nat_ok = True
    except (ValueError, RuntimeError):
        nat_ok = False

    assert py_ok == all_valid, (seed, "python grammar drift", text[:200])
    assert nat_ok == py_ok, (seed, "accept/reject divergence", text[:200])
    if py_ok:
        assert len(nat) == len(py)
        np.testing.assert_array_equal(nat["label"], py["label"])
        # dense must match BITWISE (both paths round once from float64)
        np.testing.assert_array_equal(nat["dense"].view(np.uint32),
                                      py["dense"].view(np.uint32))
        np.testing.assert_array_equal(nat["cat"], py["cat"])


@pytest.mark.parametrize("seed", range(8))
def test_vocab_differential_fuzz(seed):
    """Random record arrays (heavy duplicates, zeros, shard splits): the
    C++ vocabulary build + in-place reindex must equal the Python fold
    exactly, including first-appearance id order across shards."""
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(10, 400))
    recs = np.zeros(n, dtype=criteo.DAC_DTYPE)
    recs["label"] = rng.integers(0, 2, size=n)
    recs["dense"] = rng.random((n, 13), dtype=np.float32)
    # small value pools per column force heavy duplication; a few columns
    # get wide pools and explicit zeros
    for j in range(26):
        pool = rng.integers(0, 2**32, size=int(rng.integers(1, 30)),
                            dtype=np.uint64).astype(np.uint32)
        if rng.random() < 0.3:
            pool[0] = 0
        recs["cat"][:, j] = pool[rng.integers(0, len(pool), size=n)]

    py_recs = recs.copy()
    cut = int(rng.integers(0, n + 1))
    vocab = criteo.build_vocabulary([py_recs[:cut], py_recs[cut:]])
    criteo.reindex(py_recs, vocab)

    nat_recs = recs.copy()
    appear = native.build_vocab_and_reindex(nat_recs)
    np.testing.assert_array_equal(nat_recs["cat"], py_recs["cat"])
    # exported appearance order reconstructs the same Vocabulary
    v2 = criteo.Vocabulary.from_appearance(appear)
    for j in range(26):
        np.testing.assert_array_equal(v2.sorted_values[j],
                                      vocab.sorted_values[j])
        np.testing.assert_array_equal(v2.ranks[j], vocab.ranks[j])


@pytest.mark.parametrize("seed", range(8))
def test_marshal_differential_fuzz(seed):
    """Random windows/strides: native marshal_batch == numpy slicing."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(5, 300))
    recs = np.zeros(n, dtype=criteo.DAC_DTYPE)
    recs["label"] = rng.integers(0, 2, size=n)
    recs["dense"] = rng.standard_normal((n, 13)).astype(np.float32)
    recs["cat"] = rng.integers(1, 1000, size=(n, 26)).astype(np.uint32)
    for _ in range(6):
        start = int(rng.integers(0, n))
        count = int(rng.integers(1, n - start + 1))
        b = native.marshal_batch(recs, start, count)
        sl = recs[start:start + count]
        np.testing.assert_array_equal(b["labels"],
                                      sl["label"].astype(np.float32))
        np.testing.assert_array_equal(b["dense"], sl["dense"])
        # loader contract: 1-based file ids -> 0-based model ids
        np.testing.assert_array_equal(
            b["sparse"], (sl["cat"].astype(np.int64) - 1).astype(np.int32))
