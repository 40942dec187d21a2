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
