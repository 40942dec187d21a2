"""Hamming + Jaccard metrics (reference roadmap 'More Metrics')."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, VecStore, col


def test_hamming_binary_exact():
    rng = np.random.default_rng(81)
    n, d = 2000, 64
    vectors = rng.integers(0, 2, (n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.integers(0, 2, d).astype(np.float32)
    got = store.query(q, Metric.Hamming).take(10).collect()
    ref = (vectors != q).sum(axis=1)
    order = np.argsort(ref, kind="stable")[:10]
    assert [r.index for r in got] == order.tolist()
    np.testing.assert_array_equal([r.score for r in got], ref[order])
    # default direction is ascending (distance)
    scores = [r.score for r in got]
    assert scores == sorted(scores)


def test_hamming_identical_vector_zero():
    store = VecStore(4)
    store.add_vectors([[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 0.0, 4.0]])
    got = store.query([1.0, 2.0, 3.0, 4.0], Metric.Hamming).take(2).collect()
    assert got[0].index == 0 and got[0].score == 0.0
    assert got[1].score == 1.0


def test_jaccard_binary_exact():
    rng = np.random.default_rng(82)
    n, d = 1500, 48
    vectors = rng.integers(0, 2, (n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.integers(0, 2, d).astype(np.float32)
    got = store.query(q, Metric.Jaccard).take(8).collect()
    inter = np.minimum(vectors, q).sum(axis=1)
    union = np.maximum(vectors, q).sum(axis=1)
    ref = np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)
    order = np.argsort(-ref, kind="stable")[:8]
    assert [r.index for r in got] == order.tolist()
    np.testing.assert_allclose(
        [r.score for r in got], ref[order], rtol=1e-6, atol=1e-7
    )
    # default direction is descending (similarity)
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_jaccard_zero_vectors_score_zero():
    store = VecStore(3)
    store.add_vectors([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    got = store.query([0.0, 0.0, 0.0], Metric.Jaccard).take(2).collect()
    assert all(r.score == 0.0 for r in got)


def test_hamming_jaccard_with_meta_filter():
    rng = np.random.default_rng(83)
    n, d = 600, 16
    vectors = rng.integers(0, 2, (n, d)).astype(np.float32)
    tag = Column("tag", DataType.Int32).from_values(
        (np.arange(n) % 3).astype(np.int32)
    )
    meta = (
        MetaStore.from_columns([tag])
        .with_vectors(vectors)
        .with_chunk_size(64)
        .build()
    )
    q = rng.integers(0, 2, d).astype(np.float32)
    for metric in (Metric.Hamming, Metric.Jaccard):
        r = meta.query(q, metric).meta_filter(col("tag").eq(1)).take(5).collect()
        assert len(r) == 5
        assert all(i % 3 == 1 for i in r.indices)
        if metric is Metric.Hamming:
            ref = (vectors != q).sum(axis=1).astype(float)
            keep = np.array([i for i in range(n) if i % 3 == 1])
            want = keep[np.argsort(ref[keep], kind="stable")[:5]]
        else:
            inter = np.minimum(vectors, q).sum(axis=1)
            union = np.maximum(vectors, q).sum(axis=1)
            ref = np.where(union > 0, inter / np.where(union > 0, union, 1), 0)
            keep = np.array([i for i in range(n) if i % 3 == 1])
            want = keep[np.argsort(-ref[keep], kind="stable")[:5]]
        assert r.indices == want.tolist(), metric


def test_large_n_scan_path_hamming():
    """Exercise the lax.scan block path with a remainder."""
    rng = np.random.default_rng(84)
    n, d, b = 20_000, 256, 16
    vectors = rng.integers(0, 2, (n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.integers(0, 2, (b, d)).astype(np.float32)
    got = store.query(q, Metric.Hamming).take(6).collect()
    ref = (vectors[None, :, :] != q[:, None, :]).sum(axis=2).reshape(-1)
    want = np.sort(ref)[:6]
    np.testing.assert_array_equal([r.score for r in got], want)


def test_exact_rerank_hamming_jaccard():
    from otters_tpu.evaluate import exact_rerank

    vecs = np.array(
        [[1, 1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 1]], np.float32
    )
    q = np.array([[1, 1, 0, 0]], np.float32)
    rows, _ = exact_rerank(
        q, [0, 1, 2], lambda i: vecs[np.asarray(i)], Metric.Hamming, 1
    )
    assert rows == [0]
    rows, scores = exact_rerank(
        q, [0, 1, 2], lambda i: vecs[np.asarray(i)], Metric.Jaccard, 2
    )
    assert rows == [0, 1] and scores[0] == 1.0


def test_hamming_jaccard_on_bf16_storage():
    """bf16 storage: queries must be rounded to the stored precision, so a
    row compared against its own f32 source scores 0 (Hamming) / 1 (Jaccard)
    instead of all-components-unequal garbage."""
    rng = np.random.default_rng(85)
    n, d = 300, 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vectors)
        .with_storage_dtype("bfloat16")
        .build()
    )
    r = store.query(vectors[7], Metric.Hamming).take(1).collect()
    assert r.indices == [7] and r.scores[0] == 0.0
    pos = np.abs(vectors)  # Jaccard needs non-negative data
    store2 = (
        MetaStore.from_columns([])
        .with_vectors(pos)
        .with_storage_dtype("bfloat16")
        .build()
    )
    r2 = store2.query(pos[3], Metric.Jaccard).take(1).collect()
    assert r2.indices == [3] and abs(r2.scores[0] - 1.0) < 1e-6
