"""MetaStore end-to-end tests, porting reference tests/meta_tests.rs."""

import pytest

from otters_tpu import (
    Cmp,
    Column,
    DataType,
    Metric,
    MetaStore,
    OttersError,
    col,
)


def test_meta_basic_pruning_and_stats():
    vectors = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.5, 0.5, 0.0],
        [0.0, 0.0, 1.0],
    ]
    age = Column("age", DataType.Int32).from_values([10, 20, 30, None])
    grade = Column("grade", DataType.String).from_values(["A", "B", "A", "C"])
    meta = (
        MetaStore.from_columns([age, grade])
        .with_vectors(vectors)
        .with_chunk_size(2)
        .build()
    )

    results = (
        meta.query([1.0, 0.0, 0.0], Metric.Cosine)
        .meta_filter(col("age").gt(15) & col("grade").eq("A"))
        .take(4)
        .collect()
    )
    assert set(results.indices) == {2}

    stats = meta.last_query_stats()
    assert stats is not None
    assert stats.total_chunks == 2
    assert stats.evaluated_chunks >= 1


def test_meta_string_eq_prunes_chunks():
    vectors = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 1.0],
        [0.5, 0.5, 0.0],
    ]
    ages = Column("age", DataType.Int32).from_values([10, 11, 12, 20, 21, 22])
    grades = Column("grade", DataType.String).from_values(
        ["B", "C", "B+", "A", "A", "C"]
    )
    meta = (
        MetaStore.from_columns([ages, grades])
        .with_vectors(vectors)
        .with_chunk_size(3)
        .build()
    )
    _ = (
        meta.query([1.0, 0.0, 0.0], Metric.Cosine)
        .meta_filter(col("grade").eq("A"))
        .take(6)
        .collect()
    )
    stats = meta.last_query_stats()
    assert stats.total_chunks == 2
    assert stats.pruned_chunks >= 1


def test_meta_datetime_range_filter():
    vectors = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    ts = Column("ts", DataType.DateTime).from_values(
        ["2023-01-01T00:00:00Z", "2023-06-01T00:00:00Z", "2024-01-01T00:00:00Z"]
    )
    meta = (
        MetaStore.from_columns([ts]).with_vectors(vectors).with_chunk_size(2).build()
    )
    results = (
        meta.query([1.0, 0.0], Metric.DotProduct)
        .meta_filter(
            col("ts").gte("2023-01-01T00:00:00Z")
            & col("ts").lt("2024-01-01T00:00:00Z")
        )
        .take(3)
        .collect()
    )
    assert set(results.indices) == {0, 1}


def test_meta_global_scope_merge_and_vec_threshold():
    vectors = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 0.0]]
    grade = Column("grade", DataType.String).from_values(["A", "B", "A", "A"])
    meta = (
        MetaStore.from_columns([grade])
        .with_vectors(vectors)
        .with_chunk_size(2)
        .build()
    )
    results = (
        meta.query_batch([[1.0, 0.0], [0.0, 1.0]], Metric.DotProduct)
        .meta_filter(col("grade").eq("A"))
        .vec_filter(0.5, Cmp.Gt)
        .take(2)
        .collect()
    )
    assert len(results) <= 2
    stats = meta.last_query_stats()
    assert stats.evaluated_chunks <= stats.total_chunks


def test_meta_build_mismatched_column_len_errors():
    vectors = [[1.0], [2.0]]
    bad_col = Column("age", DataType.Int32).from_values([1])
    with pytest.raises(OttersError, match="does not match vectors length"):
        (
            MetaStore.from_columns([bad_col])
            .with_vectors(vectors)
            .with_chunk_size(2)
            .build()
        )


def test_meta_stats_without_meta_filter():
    vectors = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    meta = (
        MetaStore.from_columns([]).with_vectors(vectors).with_chunk_size(2).build()
    )
    _ = meta.query([1.0, 0.0], Metric.Cosine).take(3).collect()
    stats = meta.last_query_stats()
    assert stats.vectors_compared > 0


def test_meta_filter_compile_error_deferred():
    vectors = [[1.0, 0.0], [0.0, 1.0]]
    age = Column("age", DataType.Int32).from_values([1, 2])
    meta = MetaStore.from_columns([age]).with_vectors(vectors).build()
    plan = meta.query([1.0, 0.0], Metric.Cosine).meta_filter(col("missing").gt(1))
    with pytest.raises(OttersError, match="meta_filter compile error"):
        plan.collect()


def test_meta_results_materialization():
    vectors = [[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]]
    name = Column("name", DataType.String).from_values(["a", "b", None])
    price = Column("price", DataType.Float64).from_values([1.5, None, 3.25])
    meta = (
        MetaStore.from_columns([name, price])
        .with_vectors(vectors)
        .with_chunk_size(2)
        .build()
    )
    results = meta.query([1.0, 0.0], Metric.DotProduct).take(3).collect()
    assert results.columns == ["name", "price"]  # sorted names
    assert len(results) == 3
    assert results.indices[0] == 0
    name_col = results.column("name")
    price_col = results.column("price")
    # row order follows result order (descending dot product)
    assert name_col.string_values()[0] == "a"
    assert abs(float(price_col.f64_values()[0]) - 1.5) < 1e-12
    # null propagation
    i_of_2 = results.indices.index(2)
    assert bool(name_col.null_mask()[i_of_2])
    i_of_1 = results.indices.index(1)
    assert bool(price_col.null_mask()[i_of_1])


def test_meta_vec_filter_euclidean_min():
    vectors = [[0.0, 0.0], [1.0, 0.0], [3.0, 4.0]]
    meta = MetaStore.from_columns([]).with_vectors(vectors).build()
    results = (
        meta.query([0.0, 0.0], Metric.Euclidean)
        .vec_filter(10.0, Cmp.Lt)
        .take(3)
        .collect()
    )
    # Euclidean -> ascending; 25.0 filtered out by Lt 10
    assert results.indices == [0, 1]
    assert results.scores[0] <= results.scores[1]


def test_meta_take_default_is_all_rows():
    vectors = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    meta = MetaStore.from_columns([]).with_vectors(vectors).build()
    results = meta.query([1.0, 0.0], Metric.DotProduct).collect()
    assert len(results) == 3


def test_meta_int64_large_values():
    # values outside int32 range exercise the wide64 (hi, lo) device path
    vectors = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.5, 0.5]]
    big = Column("big", DataType.Int64).from_values(
        [2**40, -(2**40), 2**40 + 1, 0]
    )
    meta = (
        MetaStore.from_columns([big])
        .with_vectors(vectors)
        .with_chunk_size(2)
        .build()
    )
    results = (
        meta.query([1.0, 1.0], Metric.DotProduct)
        .meta_filter(col("big").gt(2**40))
        .take(4)
        .collect()
    )
    assert set(results.indices) == {2}
    results = (
        meta.query([1.0, 1.0], Metric.DotProduct)
        .meta_filter(col("big").gte(2**40))
        .take(4)
        .collect()
    )
    assert set(results.indices) == {0, 2}


def test_meta_float64_precision():
    # thresholds that differ below f32 resolution exercise the Dekker pairs
    vectors = [[1.0, 0.0], [0.0, 1.0]]
    v = 1.0 + 2**-40
    c = Column("x", DataType.Float64).from_values([1.0, v])
    meta = MetaStore.from_columns([c]).with_vectors(vectors).build()
    results = (
        meta.query([1.0, 1.0], Metric.DotProduct)
        .meta_filter(col("x").gt(1.0))
        .take(2)
        .collect()
    )
    assert set(results.indices) == {1}
    results = (
        meta.query([1.0, 1.0], Metric.DotProduct)
        .meta_filter(col("x").lte(1.0))
        .take(2)
        .collect()
    )
    assert set(results.indices) == {0}


def test_meta_head_and_stats_printing(capsys):
    vectors = [[1.0, 0.0], [0.0, 1.0]]
    name = Column("name", DataType.String).from_values(["a", "b"])
    meta = MetaStore.from_columns([name]).with_vectors(vectors).build()
    meta.head()
    meta.print_build_stats()
    _ = meta.query([1.0, 0.0], Metric.Cosine).take(1).collect()
    meta.print_last_query_stats()
    out = capsys.readouterr().out
    assert "MetaStore" in out
    assert "build_total_ms" in out
    assert "vectors_compared" in out


def test_meta_query_results_display():
    vectors = [[1.0, 0.0]]
    name = Column("name", DataType.String).from_values(["thing"])
    meta = MetaStore.from_columns([name]).with_vectors(vectors).build()
    results = meta.query([1.0, 0.0], Metric.Cosine).take(1).collect()
    text = str(results)
    assert "index" in text and "score" in text and "thing" in text
