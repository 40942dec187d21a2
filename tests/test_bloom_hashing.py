"""Bloom filter and hashing unit tests (reference C10/C13 contracts)."""

import numpy as np
import jax.numpy as jnp

from otters_tpu.ops import bloom, hashing


def test_hash_stability():
    g1a, g2a = hashing.hash_string("hello")
    g1b, g2b = hashing.hash_string("hello")
    assert (g1a, g2a) == (g1b, g2b)
    g1c, _ = hashing.hash_string("hellp")
    assert g1c != g1a
    assert g2a % 2 == 1  # odd for double hashing


def test_hash_strings_vectorized_matches_scalar():
    strs = ["a", "bb", "ccc", "", "日本語", "hello world"]
    g1, g2 = hashing.hash_strings(strs)
    for i, s in enumerate(strs):
        a, b = hashing.hash_string(s)
        assert int(g1[i]) == a
        assert int(g2[i]) == b


def test_bloom_no_false_negatives():
    params = bloom.BloomParams.from_fpr(0.01, 100)
    strings = [f"item_{i}" for i in range(100)]
    g1, g2 = hashing.hash_strings(strings)
    nulls = np.zeros(100, dtype=bool)
    chunk_ids = np.zeros(100, dtype=np.int64)
    matrix = bloom.build_matrix(g1, g2, nulls, chunk_ids, 1, params)
    m = jnp.asarray(matrix)
    for s in strings:
        words, masks = bloom.probe_coords(s, params)
        hit = np.asarray(bloom.probe(m, jnp.asarray(words), jnp.asarray(masks)))
        assert bool(hit[0]), f"false negative for {s}"


def test_bloom_prunes_absent_strings():
    params = bloom.BloomParams.from_fpr(0.01, 10)
    strings = [f"present_{i}" for i in range(10)]
    g1, g2 = hashing.hash_strings(strings)
    nulls = np.zeros(10, dtype=bool)
    chunk_ids = np.zeros(10, dtype=np.int64)
    matrix = bloom.build_matrix(g1, g2, nulls, chunk_ids, 1, params)
    m = jnp.asarray(matrix)
    fp = 0
    trials = 200
    for i in range(trials):
        words, masks = bloom.probe_coords(f"absent_{i}", params)
        hit = np.asarray(bloom.probe(m, jnp.asarray(words), jnp.asarray(masks)))
        fp += int(hit[0])
    assert fp < trials * 0.1  # ~1% expected


def test_bloom_null_rows_not_inserted():
    params = bloom.BloomParams.from_fpr(0.01, 4)
    strings = ["a", "", "b", ""]
    g1, g2 = hashing.hash_strings(strings)
    nulls = np.array([False, True, False, True])
    chunk_ids = np.zeros(4, dtype=np.int64)
    matrix = bloom.build_matrix(g1, g2, nulls, chunk_ids, 1, params)
    # empty string was only present as a null -> should (almost surely) miss
    m = jnp.asarray(matrix)
    words, masks = bloom.probe_coords("", params)
    hit = np.asarray(bloom.probe(m, jnp.asarray(words), jnp.asarray(masks)))
    assert not bool(hit[0])


def test_bloom_params_sizing():
    p = bloom.BloomParams.from_fpr(0.01, 1024)
    assert p.bits % 32 == 0
    assert p.bits >= 1024 * 9  # ~9.6 bits/item at 1% fpr
    assert 1 <= p.k_hashes <= 16
    p2 = bloom.BloomParams.from_bits(100, 10)
    assert p2.bits >= 64 and p2.bits % 32 == 0


def test_device_bloom_matrix_parity_random_hashes():
    """Device scatter build == host numpy build, bit for bit, over random
    uint64 hashes (round-3: the 64-bit mod-bits arithmetic in 32-bit device
    math must match the host's native uint64 computation exactly)."""
    import numpy as np

    from otters_tpu.ops import bloom as bloom_ops

    rng = np.random.default_rng(17)
    n, chunk = 5000, 256
    n_chunks = -(-n // chunk)
    g1 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    g2 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64) | np.uint64(1)
    nulls = rng.random(n) < 0.05
    for params in (
        bloom_ops.BloomParams.from_fpr(0.01, chunk),
        bloom_ops.BloomParams.from_bits(800, chunk),
        bloom_ops.BloomParams.from_fpr(0.5, chunk),
    ):
        chunk_ids = np.arange(n, dtype=np.int64) // chunk
        want = bloom_ops.build_matrix(
            g1, g2, nulls, chunk_ids, n_chunks, params
        )
        got = np.asarray(
            bloom_ops.build_matrix_device(
                g1, g2, nulls, chunk, n_chunks, params
            )
        )
        np.testing.assert_array_equal(got, want)


def test_device_bloom_store_build_parity(monkeypatch):
    """A store built with OTTERS_BLOOM_DEVICE=1 carries the identical Bloom
    matrix (and prunes identically) to the host-built store."""
    import numpy as np

    from otters_tpu import Column, DataType, Metric, MetaStore, col

    monkeypatch.setenv("OTTERS_BLOOM_DEVICE", "1")
    rng = np.random.default_rng(23)
    n, d, chunk = 2048, 16, 128
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tags = [
        None if i % 97 == 0 else f"tag_{(i // chunk) % 7}" for i in range(n)
    ]
    cols = [Column("tag", DataType.String).from_values(tags)]
    dev_store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .build()
    )
    monkeypatch.delenv("OTTERS_BLOOM_DEVICE")
    host_store = (
        MetaStore.from_columns(cols)
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .build()
    )
    np.testing.assert_array_equal(
        np.asarray(dev_store._device_cols["tag"]["bloom"]),
        np.asarray(host_store._device_cols["tag"]["bloom"]),
    )
    q = rng.normal(size=d).astype(np.float32)
    r = (
        dev_store.query(q, Metric.Cosine)
        .meta_filter(col("tag").eq("tag_3"))
        .take(5)
        .collect()
    )
    assert all(tags[i] == "tag_3" for i in r.indices)
    st = dev_store.last_query_stats()
    # only chunks whose (i // chunk) % 7 == 3 may survive
    want_chunks = sum(1 for c in range(n // chunk) if c % 7 == 3)
    assert st.evaluated_chunks == want_chunks
