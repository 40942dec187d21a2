"""int8 quantized cosine storage (reference roadmap: vector quantization)."""

import numpy as np
import pytest

from otters_tpu import Metric, MetaStore, OttersError, VecStore
from otters_tpu.evaluate import mean_recall_at_k, recall_at_k


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(101)
    vectors = rng.normal(size=(3000, 64)).astype(np.float32)
    queries = rng.normal(size=(10, 64)).astype(np.float32)
    return vectors, queries


def test_int8_cosine_high_recall(data):
    vectors, queries = data
    exact = VecStore(64)
    exact.add_vectors(vectors)
    quant = VecStore(64, dtype="int8")
    quant.add_vectors(vectors)

    exact_lists, approx_lists = [], []
    for q in queries:
        e = exact.query(q, Metric.Cosine).take(10).collect()
        a = quant.query(q, Metric.Cosine).take(10).collect()
        exact_lists.append([r.index for r in e])
        approx_lists.append([r.index for r in a])
    r = mean_recall_at_k(exact_lists, approx_lists)
    assert r >= 0.8, f"int8 recall@10 too low: {r}"
    # top-1 should essentially always survive quantization
    top1 = mean_recall_at_k([e[:1] for e in exact_lists], [a[:3] for a in approx_lists])
    assert top1 == 1.0


def test_int8_meta_store_and_metric_guard(data):
    vectors, queries = data
    store = (
        MetaStore.from_columns([])
        .with_vectors(vectors)
        .with_storage_dtype("int8")
        .build()
    )
    r = store.query(queries[0], Metric.Cosine).take(5).collect()
    assert len(r) == 5
    with pytest.raises(OttersError, match="Cosine metric only"):
        store.query(queries[0], Metric.Euclidean).take(5).collect()
    with pytest.raises(OttersError, match="Cosine metric only"):
        vs = VecStore(64, dtype="int8")
        vs.add_vectors(vectors)
        vs.query(queries[0], Metric.DotProduct).take(5).collect()


def test_int8_save_load_identical(data, tmp_path):
    """Re-quantizing quantized rows is the identity (row max maps to 127),
    so int8 stores round-trip to IDENTICAL results."""
    vectors, queries = data
    store = (
        MetaStore.from_columns([])
        .with_vectors(vectors)
        .with_storage_dtype("int8")
        .build()
    )
    path = str(tmp_path / "q.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    a = store.query(queries[0], Metric.Cosine).take(10).collect()
    b = loaded.query(queries[0], Metric.Cosine).take(10).collect()
    assert a.indices == b.indices
    assert a.scores == b.scores


def test_recall_helpers():
    assert recall_at_k([1, 2, 3], [3, 2, 9]) == pytest.approx(2 / 3)
    assert recall_at_k([], []) == 1.0
    assert mean_recall_at_k([[1], [2]], [[1], [3]]) == 0.5
