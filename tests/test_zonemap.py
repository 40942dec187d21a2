"""Zonemap pruning precision tests, porting reference tests/meta_zonemap_tests.rs.

The pruned/evaluated chunk counts asserted here are the pruning-correctness
oracle (SURVEY.md §4): chunk masks are computed on device from zonemap arrays
and must match the reference's exact semantics.
"""

from otters_tpu import Column, DataType, Metric, MetaStore, col


def build_store() -> MetaStore:
    """Three chunks (chunk_size=3):
    val   : [1, 2, NULL] [10, 11, 12] [NULL, NULL, NULL]
    ts    : [2024-01-01, NULL, 2024-06-01] [2026-01-01, 2026-06-01,
            2024-12-31T23:59:59] [NULL x3]
    grade : ["A", "B", NULL] ["C", "A", "A"] [NULL x3]
    """
    vectors = [[1.0, 0.0]] * 9
    val = Column("val", DataType.Int32).from_values(
        [1, 2, None, 10, 11, 12, None, None, None]
    )
    ts = Column("ts", DataType.DateTime).from_values(
        [
            "2024-01-01T00:00:00Z",
            None,
            "2024-06-01T00:00:00Z",
            "2026-01-01T00:00:00Z",
            "2026-06-01T00:00:00Z",
            "2024-12-31T23:59:59Z",
            None,
            None,
            None,
        ]
    )
    grade = Column("grade", DataType.String).from_values(
        ["A", "B", None, "C", "A", "A", None, None, None]
    )
    return (
        MetaStore.from_columns([val, ts, grade])
        .with_vectors(vectors)
        .with_chunk_size(3)
        .build()
    )


def test_zonemap_prunes_numeric_with_nulls():
    store = build_store()
    results = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(col("val").gt(5))
        .take(9)
        .collect()
    )
    assert set(results.indices) == {3, 4, 5}
    stats = store.last_query_stats()
    assert stats.total_chunks == 3
    assert stats.evaluated_chunks == 1, "Only middle chunk should remain"
    assert stats.pruned_chunks == 2


def test_zonemap_boundary_conditions():
    store = build_store()
    _ = (
        store.query([1.0, 0.0], Metric.Cosine)
        .meta_filter(col("val").gte(2))
        .take(9)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.total_chunks == 3
    assert stats.pruned_chunks == 1, "Only all-null chunk pruned"

    _ = (
        store.query([1.0, 0.0], Metric.Cosine)
        .meta_filter(col("val").gt(2))
        .take(9)
        .collect()
    )
    stats2 = store.last_query_stats()
    assert stats2.evaluated_chunks == 1
    assert stats2.pruned_chunks == 2


def test_zonemap_all_null_chunk_pruned_for_equality():
    store = build_store()
    _ = (
        store.query([1.0, 0.0], Metric.Cosine)
        .meta_filter(col("grade").eq("A"))
        .take(9)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.total_chunks == 3
    assert stats.pruned_chunks >= 1


def test_zonemap_and_clause_numeric_datetime():
    store = build_store()
    results = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(col("val").gt(5) & col("ts").lt("2025-01-01T00:00:00Z"))
        .take(9)
        .collect()
    )
    assert len(results) == 1
    assert results.indices[0] == 5
    stats = store.last_query_stats()
    assert stats.total_chunks == 3
    assert stats.evaluated_chunks == 1
    assert stats.pruned_chunks == 2


def test_zonemap_ne_comparator_with_null_only_chunk():
    store = build_store()
    _ = (
        store.query([1.0, 0.0], Metric.Cosine)
        .meta_filter(col("val").neq(1))
        .take(9)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.total_chunks == 3
    assert stats.pruned_chunks >= 1, "Null-only chunk should not survive Neq"


def test_zonemap_string_neq_keeps_nonempty_chunks():
    store = build_store()
    results = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(col("grade").neq("A"))
        .take(9)
        .collect()
    )
    # rows with grade != "A" and non-null: 1 ("B"), 3 ("C")
    assert set(results.indices) == {1, 3}
    stats = store.last_query_stats()
    assert stats.pruned_chunks >= 1  # all-null chunk dropped


def test_zonemap_datetime_prunes():
    store = build_store()
    results = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(col("ts").gte("2026-01-01T00:00:00Z"))
        .take(9)
        .collect()
    )
    assert set(results.indices) == {3, 4}
    stats = store.last_query_stats()
    # chunk0 max is 2024-06-01 -> pruned; chunk2 all-null -> pruned
    assert stats.evaluated_chunks == 1


def test_vectors_compared_counts_surviving_chunks_only():
    store = build_store()
    _ = (
        store.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(col("val").gt(5))
        .take(9)
        .collect()
    )
    stats = store.last_query_stats()
    # one surviving chunk of 3 rows x 1 query
    assert stats.vectors_compared == 3
