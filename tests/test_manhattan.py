"""Manhattan (L1) metric — beyond the reference's metric set."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, VecStore, col


def test_manhattan_exact_vs_numpy():
    rng = np.random.default_rng(71)
    n, d = 1000, 24
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.normal(size=d).astype(np.float32)
    got = store.query(q, Metric.Manhattan).take(10).collect()
    ref = np.abs(vectors - q).sum(axis=1)
    want_idx = np.argsort(ref, kind="stable")[:10]
    assert [r.index for r in got] == want_idx.tolist()
    np.testing.assert_allclose(
        [r.score for r in got], np.sort(ref)[:10], rtol=1e-5, atol=1e-4
    )
    # default direction is ascending (distance)
    scores = [r.score for r in got]
    assert scores == sorted(scores)


def test_manhattan_identical_vector_zero():
    store = VecStore(3)
    store.add_vectors([[1.0, 2.0, 3.0], [4.0, 6.0, 3.0]])
    got = store.query([1.0, 2.0, 3.0], Metric.Manhattan).take(2).collect()
    assert got[0].index == 0 and abs(got[0].score) < 1e-6
    assert abs(got[1].score - 7.0) < 1e-5  # |1-4|+|2-6|+|3-3|


def test_manhattan_with_meta_filter():
    rng = np.random.default_rng(72)
    n, d = 500, 8
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    tag = Column("tag", DataType.String).from_values(
        ["a" if i % 2 else "b" for i in range(n)]
    )
    meta = (
        MetaStore.from_columns([tag])
        .with_vectors(vectors)
        .with_chunk_size(64)
        .build()
    )
    q = rng.normal(size=d).astype(np.float32)
    r = meta.query(q, Metric.Manhattan).meta_filter(col("tag").eq("a")).take(5).collect()
    ref = np.abs(vectors - q).sum(axis=1)
    odd = np.array([i for i in range(n) if i % 2])
    want = odd[np.argsort(ref[odd], kind="stable")[:5]]
    assert r.indices == want.tolist()


@pytest.mark.parametrize("n", [8192 * 2])  # forces the scan/panel machinery
def test_manhattan_large_paths(n):
    rng = np.random.default_rng(73)
    d = 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.normal(size=(4, d)).astype(np.float32)
    got = store.query(q, Metric.Manhattan).take(6).collect()
    ref = np.abs(vectors[None, :, :] - q[:, None, :]).sum(axis=2).reshape(-1)
    want = np.sort(ref)[:6]
    np.testing.assert_allclose([r.score for r in got], want, rtol=1e-5, atol=1e-4)


def test_manhattan_block_scan_with_remainder():
    """Large b*d forces _manhattan_scores onto the lax.scan block path with a
    non-multiple remainder; results must match the single-block math."""
    rng = np.random.default_rng(74)
    n, d, b = 20_000, 256, 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    store = VecStore(d)
    store.add_vectors(vectors)
    q = rng.normal(size=(b, d)).astype(np.float32)
    got = store.query(q, Metric.Manhattan).take(7).collect()
    ref = np.abs(vectors[None, :, :] - q[:, None, :]).sum(axis=2).reshape(-1)
    order = np.argsort(ref, kind="stable")[:7]
    assert [r.index for r in got] == (order % n).tolist()
    np.testing.assert_allclose(
        [r.score for r in got], ref[order], rtol=1e-5, atol=1e-3
    )
