"""Extended string predicates: contains / starts_with / ends_with."""

import numpy as np
import pytest

from otters_tpu import (
    Column,
    DataType,
    Metric,
    MetaStore,
    OttersError,
    TypeMismatch,
    col,
)


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(61)
    n, d = 400, 8
    names = [
        f"widget_{i}" if i % 3 == 0 else (f"gadget_{i}" if i % 3 == 1 else None)
        for i in range(n)
    ]
    price = list(rng.uniform(0, 10, n))
    cols = [
        Column("name", DataType.String).from_values(names),
        Column("price", DataType.Float64).from_values(price),
    ]
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    return (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(64)
        .build(),
        names,
    )


def test_contains(store):
    s, names = store
    r = (
        s.query(np.ones(8, np.float32), Metric.Cosine)
        .meta_filter(col("name").contains("idget_1"))
        .take(400)
        .collect()
    )
    want = {i for i, nm in enumerate(names) if nm is not None and "idget_1" in nm}
    assert set(r.indices) == want


def test_starts_with_and_combination(store):
    s, names = store
    r = (
        s.query(np.ones(8, np.float32), Metric.Cosine)
        .meta_filter(col("name").starts_with("widget") & col("price").lt(5.0))
        .take(400)
        .collect()
    )
    for i in r.indices:
        assert names[i].startswith("widget")
    prices = r.column("price").f64_values()
    assert all(p < 5.0 for p in prices)


def test_ends_with(store):
    s, names = store
    r = (
        s.query(np.ones(8, np.float32), Metric.Cosine)
        .meta_filter(col("name").ends_with("_99"))
        .take(400)
        .collect()
    )
    want = {i for i, nm in enumerate(names) if nm is not None and nm.endswith("_99")}
    assert set(r.indices) == want


def test_or_with_device_predicates(store):
    s, names = store
    r = (
        s.query(np.ones(8, np.float32), Metric.Cosine)
        .meta_filter(col("name").eq("widget_0") | col("name").ends_with("_42"))
        .take(400)
        .collect()
    )
    want = {
        i
        for i, nm in enumerate(names)
        if nm is not None and (nm == "widget_0" or nm.endswith("_42"))
    }
    assert set(r.indices) == want


def test_chunk_pruning_for_extended_ops(store):
    s, names = store
    # "widget_1x" prefixes only exist in specific index ranges; at minimum the
    # exact host-computed chunk mask must not evaluate chunks with no match
    _ = (
        s.query(np.ones(8, np.float32), Metric.Cosine)
        .meta_filter(col("name").starts_with("widget_10"))
        .take(400)
        .collect()
    )
    stats = s.last_query_stats()
    assert stats.evaluated_chunks < stats.total_chunks


def test_extended_op_on_numeric_column_rejected(store):
    s, _ = store
    with pytest.raises(TypeMismatch):
        col("price").contains("x").compile(s.schema())
    plan = s.query(np.ones(8, np.float32), Metric.Cosine).meta_filter(
        col("price").starts_with("1")
    )
    with pytest.raises(OttersError, match="meta_filter compile error"):
        plan.collect()


def test_hostmask_cache_reused(store):
    s, _ = store
    q = np.ones(8, np.float32)
    for _ in range(2):
        s.query(q, Metric.Cosine).meta_filter(col("name").contains("widget")).take(
            3
        ).collect()
    assert any(k[1].name == "Contains" for k in s._hostmask_cache)
