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
