"""pandas / Arrow / Parquet adapters."""

import numpy as np
import pandas as pd
import pytest

from otters_tpu import DataType, Metric, col
from otters_tpu.adapters import (
    builder_from_pandas,
    builder_from_parquet,
    column_from_series,
)


@pytest.fixture()
def df():
    return pd.DataFrame(
        {
            "name": ["ada", "bob", None, "cleo"],
            "price": [1.5, None, 3.0, 4.25],
            "count": pd.array([1, 2, None, 4], dtype="Int64"),
            "small": np.array([1, 2, 3, 4], dtype=np.int16),
            "when": pd.to_datetime(
                ["2024-01-01", "2024-06-01", None, "2025-01-01"]
            ),
        }
    )


def test_column_from_series_dtypes(df):
    assert column_from_series(df["name"]).dtype is DataType.String
    assert column_from_series(df["price"]).dtype is DataType.Float64
    assert column_from_series(df["count"]).dtype is DataType.Int64
    assert column_from_series(df["small"]).dtype is DataType.Int32
    assert column_from_series(df["when"]).dtype is DataType.DateTime

    c = column_from_series(df["count"])
    assert list(c.null_mask()) == [False, False, True, False]
    assert int(c.i64_values()[3]) == 4

    w = column_from_series(df["when"])
    from otters_tpu.column import parse_datetime

    assert int(w.datetime_values()[0]) == parse_datetime("2024-01-01")


def test_builder_from_pandas_end_to_end(df):
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(4, 8)).astype(np.float32)
    store = builder_from_pandas(df, vectors).with_chunk_size(2).build()
    r = (
        store.query(vectors[0], Metric.Cosine)
        .meta_filter(col("price").lt(4.0) & col("when").gte("2024-01-01"))
        .take(4)
        .collect()
    )
    assert set(r.indices) == {0}  # row1 price null, row2 when null


def test_builder_from_parquet(df, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "meta.parquet")
    pq.write_table(pa.Table.from_pandas(df), path)
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(4, 8)).astype(np.float32)
    store = builder_from_parquet(path, vectors).build()
    r = (
        store.query(vectors[3], Metric.Cosine)
        .meta_filter(col("name").eq("cleo"))
        .take(4)
        .collect()
    )
    assert r.indices == [3]


def test_length_mismatch(df):
    with pytest.raises(Exception, match="does not match vectors length"):
        builder_from_pandas(df, np.zeros((3, 4), np.float32))


def test_results_to_pandas_and_arrow():
    """MetaQueryResults exports to pandas/Arrow with null-faithful dtypes."""
    import numpy as np
    import pandas as pd

    from otters_tpu import Column, DataType, Metric, MetaStore

    rng = np.random.default_rng(51)
    n = 64
    cols = [
        Column("price", DataType.Float64).from_values(
            [None if i % 7 == 0 else float(i) for i in range(n)]
        ),
        Column("tag", DataType.String).from_values(
            [None if i % 5 == 0 else f"t{i % 3}" for i in range(n)]
        ),
        Column("ok", DataType.Bool).from_values(
            [None if i % 11 == 0 else (i % 2 == 0) for i in range(n)]
        ),
        Column("cnt", DataType.Int64).from_values(list(range(n))),
        Column("when", DataType.DateTime).from_values(
            [1704067200000 + i * 86_400_000 for i in range(n)]
        ),
    ]
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(rng.normal(size=(n, 8)).astype(np.float32))
        .with_chunk_size(16)
        .build()
    )
    r = store.query(rng.normal(size=8).astype(np.float32), Metric.Cosine).take(20).collect()
    df = r.to_pandas()
    assert list(df.columns) == ["index", "score", "cnt", "ok", "price", "tag", "when"]
    assert len(df) == 20
    assert df["index"].tolist() == r.indices
    for i, gi in enumerate(r.indices):
        if gi % 7 == 0:
            assert np.isnan(df["price"][i])
        else:
            assert df["price"][i] == float(gi)
        if gi % 5 == 0:
            assert pd.isna(df["tag"][i])
        else:
            assert df["tag"][i] == f"t{gi % 3}"
        if gi % 11 == 0:
            assert pd.isna(df["ok"][i])
        assert df["cnt"][i] == gi
    assert str(df["when"].dtype).startswith("datetime64")
    try:
        import pyarrow  # noqa: F401
    except ImportError:
        return
    table = r.to_arrow()
    assert table.num_rows == 20
    assert "score" in table.column_names
