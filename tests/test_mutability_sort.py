"""Sort-by clustering, tombstone deletes, append (reference roadmap items)."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, OttersError, col


@pytest.fixture()
def base():
    rng = np.random.default_rng(51)
    n, d = 600, 16
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    price = rng.permutation(n).astype(np.float64)  # shuffled 0..n-1
    tag = [f"t{int(p) % 5}" for p in price]
    cols = [
        Column("price", DataType.Float64).from_values(list(price)),
        Column("tag", DataType.String).from_values(tag),
    ]
    return vectors, price, cols


def test_sort_by_improves_pruning_and_keeps_original_ids(base):
    vectors, price, cols = base
    rng = np.random.default_rng(1)
    q = rng.normal(size=16).astype(np.float32)

    unsorted = (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(list(price)),
                Column("tag", DataType.String).from_values(
                    [f"t{int(p) % 5}" for p in price]
                ),
            ]
        )
        .with_vectors(vectors)
        .with_chunk_size(100)
        .build()
    )
    clustered = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(100)
        .with_sort_by("price")
        .build()
    )

    expr = col("price").lt(100.0)
    r_u = unsorted.query(q, Metric.Cosine).meta_filter(expr).take(10).collect()
    s_u = unsorted.last_query_stats()
    r_c = clustered.query(q, Metric.Cosine).meta_filter(expr).take(10).collect()
    s_c = clustered.last_query_stats()

    # identical results with ORIGINAL row ids, despite physical reordering
    assert sorted(r_c.indices) == sorted(r_u.indices)
    np.testing.assert_allclose(
        sorted(r_c.scores), sorted(r_u.scores), rtol=1e-6, atol=1e-6
    )
    # clustering makes zonemaps selective: price<100 fits in 1 chunk of 100
    assert s_c.evaluated_chunks == 1
    assert s_u.evaluated_chunks > 1
    # metadata materialization matches the returned rows
    by_idx = dict(zip(r_c.indices, r_c.column("price").f64_values()))
    for i, p in by_idx.items():
        assert float(price[i]) == float(p)


def test_sort_descending(base):
    vectors, price, cols = base
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(100)
        .with_sort_by("price", descending=True)
        .build()
    )
    _ = (
        store.query(np.ones(16, np.float32), Metric.Cosine)
        .meta_filter(col("price").gte(500.0))
        .take(5)
        .collect()
    )
    assert store.last_query_stats().evaluated_chunks == 1


def test_delete_rows_tombstones(base):
    vectors, price, cols = base
    store = MetaStore.from_columns(cols).with_vectors(vectors).build()
    q = vectors[17]
    top = store.query(q, Metric.Cosine).take(1).collect()
    assert top.indices == [17]
    store.delete_rows([17])
    assert len(store) == 599
    top2 = store.query(q, Metric.Cosine).take(1).collect()
    assert top2.indices != [17]
    # delete is idempotent
    store.delete_rows([17])
    assert len(store) == 599
    with pytest.raises(OttersError):
        store.delete_rows([10_000])


def test_delete_rows_on_sorted_store_uses_original_ids(base):
    vectors, price, cols = base
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_sort_by("price")
        .build()
    )
    q = vectors[42]
    assert store.query(q, Metric.Cosine).take(1).collect().indices == [42]
    store.delete_rows([42])
    assert store.query(q, Metric.Cosine).take(1).collect().indices != [42]


def test_append_compacts_and_extends(base):
    vectors, price, cols = base
    store = MetaStore.from_columns(cols).with_vectors(vectors).build()
    store.delete_rows([0, 1, 2])
    new_vecs = np.eye(3, 16, dtype=np.float32) * 5.0
    new = store.append(
        new_vecs,
        {"price": [1000.0, 1001.0, 1002.0], "tag": ["new", "new", None]},
    )
    assert len(new) == 600 - 3 + 3
    # appended rows are searchable
    r = new.query(new_vecs[0], Metric.Cosine).take(1).collect()
    assert abs(r.scores[0] - 1.0) < 1e-5
    assert r.column("price").f64_values()[0] == 1000.0
    # old store untouched
    assert len(store) == 597


def test_append_validates(base):
    vectors, price, cols = base
    store = MetaStore.from_columns(cols).with_vectors(vectors).build()
    with pytest.raises(OttersError, match="needs 1 appended values"):
        store.append(np.zeros((1, 16), np.float32), {"price": [1.0]})
    with pytest.raises(OttersError, match="appended vectors"):
        store.append(np.zeros((1, 7), np.float32), {"price": [1.0], "tag": ["x"]})


def test_sorted_store_roundtrip_with_deletes(base, tmp_path):
    vectors, price, cols = base
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(100)
        .with_sort_by("price")
        .build()
    )
    store.delete_rows([5, 6])
    path = str(tmp_path / "sorted.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    assert len(loaded) == 598
    q = np.random.default_rng(3).normal(size=16).astype(np.float32)
    a = store.query(q, Metric.Cosine).meta_filter(col("price").lt(50.0)).take(8).collect()
    b = loaded.query(q, Metric.Cosine).meta_filter(col("price").lt(50.0)).take(8).collect()
    assert a.indices == b.indices
    assert a.scores == b.scores
