"""C++ native module: bit-parity with the Python implementations + speed."""

import numpy as np
import pytest

from otters_tpu import native
from otters_tpu.ops import bloom, hashing


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_hash_matches_python():
    strings = [f"item_{i}" for i in range(500)] + ["", "日本語", "a" * 1000]
    g1n, g2n = native.hash_strings(strings)
    for i, s in enumerate(strings):
        a, b = hashing.hash_string(s)
        assert int(g1n[i]) == a, s
        assert int(g2n[i]) == b, s


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bloom_matches_python():
    n, chunk = 10_000, 512
    strings = [f"s{i % 300}" for i in range(n)]
    g1, g2 = hashing.hash_strings(strings)
    nulls = np.zeros(n, dtype=bool)
    nulls[::17] = True
    n_chunks = -(-n // chunk)
    params = bloom.BloomParams.from_fpr(0.02, chunk)
    chunk_ids = np.arange(n, dtype=np.int64) // chunk

    py = bloom.build_matrix(g1, g2, nulls, chunk_ids, n_chunks, params)
    cc = native.bloom_build(
        g1, g2, nulls, chunk, n, n_chunks, params.words, params.bits,
        params.k_hashes,
    )
    np.testing.assert_array_equal(py, cc)


def test_hash_strings_dispatches_without_error():
    # >64 strings triggers the native path when available
    strings = [f"x{i}" for i in range(200)]
    g1, g2 = hashing.hash_strings(strings)
    a, b = hashing.hash_string("x123")
    assert int(g1[123]) == a and int(g2[123]) == b


# ---- extended string predicates (contains / starts_with / ends_with) --------

_TRICKY = [
    "",  # empty string
    "abc",
    "abcabc",
    "xxabcxx",
    "ab",
    "ABC",  # case sensitivity
    "naïve café",  # multi-byte UTF-8
    "caf",
    "é",
    "aaaaab",  # overlapping prefixes
    "ababab",
    "abc" * 100,  # long row
    "zzz" + "abc",  # suffix match
]


def _py_mask(strings, pattern, mode):
    if mode == "contains":
        return np.array([pattern in s for s in strings])
    if mode == "starts_with":
        return np.array([s.startswith(pattern) for s in strings])
    return np.array([s.endswith(pattern) for s in strings])


@pytest.mark.parametrize("mode", ["contains", "starts_with", "ends_with"])
@pytest.mark.parametrize("pattern", ["", "abc", "é", "caf", "ab", "abcabcabc"])
def test_substr_mask_matches_python(mode, pattern):
    from otters_tpu.ops import strscan

    data, offsets = native.pack_utf8_arena(_TRICKY)
    want = _py_mask(_TRICKY, pattern, mode)
    got = strscan.substr_mask(data, offsets, pattern, mode)
    np.testing.assert_array_equal(np.asarray(got, bool), want)
    # the numpy fallback must agree bit-for-bit with the native kernel
    got_np = strscan._substr_mask_numpy(data, offsets, pattern, mode)
    np.testing.assert_array_equal(np.asarray(got_np, bool), want)


def test_substr_contains_no_cross_row_match():
    """A pattern straddling two adjacent rows in the arena must NOT match
    (the numpy fallback maps arena hits back to rows and rejects them)."""
    from otters_tpu.ops import strscan

    rows = ["xxxab", "cdyyy", "abcd", "ab", "cd"]
    data, offsets = native.pack_utf8_arena(rows)
    want = _py_mask(rows, "abcd", "contains")
    got_np = strscan._substr_mask_numpy(data, offsets, "abcd", "contains")
    np.testing.assert_array_equal(np.asarray(got_np, bool), want)
    got = strscan.substr_mask(data, offsets, "abcd", "contains")
    np.testing.assert_array_equal(np.asarray(got, bool), want)


def test_substr_mask_fuzz_parity():
    rng = np.random.default_rng(0)
    alpha = list("abcdé ")
    strings = [
        "".join(rng.choice(alpha, size=rng.integers(0, 20)))
        for _ in range(500)
    ]
    from otters_tpu.ops import strscan

    data, offsets = native.pack_utf8_arena(strings)
    for pattern in ["a", "ab", "é ", "abc", "dd", ""]:
        for mode in ["contains", "starts_with", "ends_with"]:
            want = _py_mask(strings, pattern, mode)
            got = strscan.substr_mask(data, offsets, pattern, mode)
            np.testing.assert_array_equal(np.asarray(got, bool), want)
            got_np = strscan._substr_mask_numpy(data, offsets, pattern, mode)
            np.testing.assert_array_equal(np.asarray(got_np, bool), want)


def test_store_extended_predicates_use_arena_cache():
    """End-to-end: contains/starts_with/ends_with through the store produce
    reference semantics and share ONE packed arena per column."""
    from otters_tpu import Column, DataType, Metric, MetaStore, col

    n = 4_000
    rng = np.random.default_rng(3)
    names = [
        ["alpha beta", "gamma", "alphabet soup", "beta max", "none"][i % 5]
        for i in range(n)
    ]
    namec = Column("name", DataType.String).from_values(
        [None if i % 13 == 0 else names[i] for i in range(n)]
    )
    vecs = rng.normal(size=(n, 16)).astype(np.float32)
    store = (
        MetaStore.from_columns([namec])
        .with_vectors(vecs)
        .with_chunk_size(512)
        .build()
    )
    q = vecs[7]
    r1 = (
        store.query(q, Metric.Cosine)
        .meta_filter(col("name").contains("alpha"))
        .take(50)
        .collect()
    )
    assert len(store._str_arena_cache) == 1
    r2 = (
        store.query(q, Metric.Cosine)
        .meta_filter(col("name").starts_with("beta"))
        .take(50)
        .collect()
    )
    assert len(store._str_arena_cache) == 1  # reused, not re-packed
    vals = [None if i % 13 == 0 else names[i] for i in range(n)]
    want1 = {i for i, v in enumerate(vals) if v is not None and "alpha" in v}
    want2 = {
        i for i, v in enumerate(vals) if v is not None and v.startswith("beta")
    }
    assert set(r1.indices) <= want1 and set(r2.indices) <= want2
    assert len(r1) == min(50, len(want1)) and len(r2) == min(50, len(want2))
