"""Column tests, porting the assertions of reference tests/column_tests.rs."""

import math

import numpy as np
import pytest

from otters_tpu import Column, ColumnParseError, ColumnTypeMismatch, DataType


def test_column_creation():
    c = Column("test", DataType.Int32)
    assert c.name == "test"
    assert c.dtype is DataType.Int32
    assert len(c) == 0
    assert c.is_empty()


def test_unified_push_int32():
    c = Column("integers", DataType.Int32)
    c.push(42)
    assert len(c) == 1
    c.push(100)
    assert len(c) == 2
    c.push(None)
    assert len(c) == 3
    nm = c.null_mask()
    assert not nm[0] and not nm[1] and nm[2]


def test_unified_push_int64():
    c = Column("big_integers", DataType.Int64)
    c.push(42).push(100).push(None)
    assert len(c) == 3


def test_unified_push_float32():
    c = Column("floats", DataType.Float32)
    c.push(math.pi).push(2.71).push(None)
    assert len(c) == 3


def test_unified_push_float64():
    c = Column("doubles", DataType.Float64)
    c.push(math.pi).push(math.e).push(None)
    assert len(c) == 3


def test_unified_push_string():
    c = Column("strings", DataType.String)
    c.push("hello").push("world").push("rust").push("programming").push(None)
    assert len(c) == 5


def test_unified_push_datetime_auto_format():
    c = Column("timestamps", DataType.DateTime)
    c.push("2024-01-15T10:30:00Z")
    c.push("2024-02-20 15:45:30")
    c.push("2024-03-10")
    c.push(None)
    assert len(c) == 4


def test_datetime_millis_values():
    c = Column("ts", DataType.DateTime)
    c.push("1970-01-01")  # epoch
    c.push("1970-01-01T00:00:01Z")  # 1s
    vals = c.datetime_values()
    assert int(vals[0]) == 0
    assert int(vals[1]) == 1000


def test_unified_push_datetime_custom_format():
    c = Column("events", DataType.DateTime).with_datetime_fmt("%m/%d/%Y")
    c.push("01/15/2024").push("02/20/2024").push(None)
    assert len(c) == 3


def test_type_mismatch_errors():
    c = Column("integers", DataType.Int32)
    c.push(42)
    with pytest.raises(ColumnTypeMismatch):
        c.push("not an int")
    f = Column("floats", DataType.Float32)
    f.push(math.pi)
    with pytest.raises(ColumnTypeMismatch):
        f.push("x")


def test_from_method_int32():
    c = Column("integers", DataType.Int32).from_values([1, 2, 3, 4, 5])
    assert len(c) == 5


def test_from_method_mixed_optionals():
    c = Column("mixed", DataType.Int32).from_values([1, None, 3, None, 5])
    assert len(c) == 5
    nm = c.null_mask()
    assert list(nm) == [False, True, False, True, False]


def test_from_method_strings():
    c = Column("names", DataType.String).from_values(["Alice", "Bob", "Charlie"])
    assert len(c) == 3


def test_from_method_datetime_with_format():
    c = (
        Column("dates", DataType.DateTime)
        .with_datetime_fmt("%Y-%m-%d")
        .from_values(["2024-01-15", "2024-02-20", None, "2024-03-10"])
    )
    assert len(c) == 4


def test_datetime_parse_errors():
    c = Column("bad_dates", DataType.DateTime)
    with pytest.raises(ColumnParseError):
        c.push("invalid-date-format")


def test_datetime_custom_format_errors():
    c = Column("custom_dates", DataType.DateTime).with_datetime_fmt("%Y-%m-%d")
    with pytest.raises(ColumnParseError):
        c.push("01/15/2024")


def test_mixed_operations():
    c = Column("mixed_ops", DataType.Float64)
    c.push(1.1).push(2.2)
    c.from_values([3.3, 4.4, 5.5])
    c.push(None)
    assert len(c) == 6


def test_column_data_access():
    c = Column("test_data", DataType.Int32).from_values([1, 2, 3])
    vals = c.i32_values()
    assert vals is not None and len(vals) == 3
    assert c.f32_values() is None
    assert c.string_values() is None


def test_null_sentinels():
    c = Column("s", DataType.Int32).from_values([1, None])
    assert int(c.i32_values()[1]) == np.iinfo(np.int32).min
    f = Column("f", DataType.Float32).from_values([1.0, None])
    assert np.isnan(f.f32_values()[1])
    s = Column("str", DataType.String).from_values(["a", None])
    assert s.string_values()[1] == ""


def test_empty_from_operations():
    c = Column("empty_test", DataType.Int32).from_values([])
    assert len(c) == 0
    assert c.is_empty()


def test_large_dataset():
    c = Column("large", DataType.Int32).from_values(list(range(1000)))
    assert len(c) == 1000
    c.from_values([x for x in range(1000, 1500)])
    assert len(c) == 1500


def test_datetime_from_strings():
    c = Column("dates", DataType.DateTime)
    c.push("2024-01-15T10:30:00Z").push("2024-02-20").push(None)
    assert len(c) == 3


def test_values_method():
    c = Column("test_values", DataType.Int32).from_values([1, 2, 3, 4, 5])
    assert len(c.values()) == 5
    f = Column("float_values", DataType.Float64).from_values([1.1, 2.2, 3.3])
    assert len(f.values()) == 3
    s = Column("string_values", DataType.String).from_values(["hello", "world"])
    assert len(s.values()) == 2


def test_method_chaining():
    """reference column_tests.rs:301-311: push/from return self."""
    c = (
        Column("c", DataType.Int32)
        .from_values([1, 2])
        .push(3)
        .push(None)
    )
    assert len(c) == 4
    assert list(c.values())[:3] == [1, 2, 3]
    assert bool(c.null_mask()[3])


# ---- bulk datetime ingest (vectorized fast path) ----------------------------


def test_bulk_datetime_parse_matches_per_row_fuzz():
    """_parse_datetime_bulk must be bit-equivalent to parse_datetime on the
    strict auto-format shapes, across random datetimes and all four forms."""
    import datetime as dt

    import numpy as np

    from otters_tpu.column import parse_datetime

    rng = np.random.default_rng(7)
    base = dt.datetime(1970, 1, 1)
    forms = (
        lambda d: d.strftime("%Y-%m-%d"),
        lambda d: d.strftime("%Y-%m-%dT%H:%M:%S"),
        lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
        lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ"),
    )
    vals = []
    for _ in range(3000):
        d = base + dt.timedelta(
            days=int(rng.integers(-30000, 80000)),
            seconds=int(rng.integers(0, 86400)),
        )
        vals.append(forms[int(rng.integers(0, 4))](d))
    # edge dates
    vals += ["0001-01-01", "9999-12-31T23:59:59Z", "1969-12-31 23:59:59",
             "1970-01-01", "2000-02-29T00:00:00"]
    col = Column("d", DataType.DateTime).from_values(vals)
    want = [parse_datetime(v) for v in vals]
    assert list(col.values()) == want
    assert not any(col.null_mask())


def test_bulk_datetime_fallback_shapes_still_exact():
    """Rows outside the strict shapes (offsets, fractional seconds) must
    fall back to the per-row parser and still land exact values; bad rows
    raise the reference error."""
    from otters_tpu.column import parse_datetime
    from otters_tpu.errors import ColumnParseError

    mixed = [
        "2024-06-15T12:34:56+05:00",   # offset: numpy can't, fromisoformat can
        "2024-06-15T12:34:56.250Z",    # fractional seconds
        "2024-06-15T12:34:56",
    ]
    col = Column("d", DataType.DateTime).from_values(mixed)
    assert list(col.values()) == [parse_datetime(v) for v in mixed]
    with pytest.raises(ColumnParseError):
        Column("d", DataType.DateTime).from_values(
            ["2024-01-01", "not-a-date"]
        )
    # a custom format skips the bulk path entirely (strptime semantics)
    c = Column("d", DataType.DateTime).with_datetime_fmt("%d/%m/%Y")
    c.from_values(["15/06/2024", "01/01/1970"])
    assert list(c.values())[1] == 0
    with pytest.raises(ColumnParseError):
        Column("d", DataType.DateTime).with_datetime_fmt(
            "%d/%m/%Y"
        ).from_values(["2024-01-01"])
