"""Typed columnar storage with null masks.

TPU-native equivalent of the reference ``Column`` (src/col.rs:195-503):
- typed backing storage per DataType with **sentinel values for nulls**
  (i32::MIN, i64::MIN, NaN, "" — col.rs:238-326) plus a null bitmask;
- unified ``push`` accepting Python values / None (col.rs:358-390);
- bulk ``from_values`` (col.rs:393-401);
- datetime strings parsed to epoch-millis int64, auto formats RFC3339 /
  ``%Y-%m-%d`` / ``%Y-%m-%d %H:%M:%S`` (col.rs:506-527) or a custom format via
  ``with_datetime_fmt`` (col.rs:352-355, 529-545);
- typed accessors ``*_values`` / ``null_mask`` / ``values`` (col.rs:446-502).

Host-side the column stages values in numpy-growable buffers; numeric and
datetime columns are shipped to the device (HBM) by MetaStore at build time,
strings stay host-side but are hashed so equality predicates run on device.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable, Optional

import numpy as np

from .errors import ColumnParseError, ColumnTypeMismatch
from .types import DataType

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _to_millis(dt: _dt.datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return round((dt - _EPOCH).total_seconds() * 1000)


def parse_datetime(s: str) -> int:
    """Parse a datetime string to epoch milliseconds (UTC).

    Accepts RFC3339/ISO-8601, ``YYYY-MM-DD``, ``YYYY-MM-DD HH:MM:SS``
    (reference col.rs:506-527). Naive timestamps are treated as UTC.
    """
    # RFC3339 / ISO-8601 (fromisoformat in py3.11+ handles 'Z' and offsets).
    try:
        return _to_millis(_dt.datetime.fromisoformat(s))
    except (ValueError, TypeError):
        pass
    for fmt in ("%Y-%m-%d", "%Y-%m-%d %H:%M:%S"):
        try:
            return _to_millis(_dt.datetime.strptime(s, fmt))
        except ValueError:
            continue
    raise ColumnParseError(
        f"Cannot parse '{s}' as datetime. Supported formats: ISO 8601, "
        "YYYY-MM-DD, YYYY-MM-DD HH:MM:SS"
    )


def parse_datetime_fmt(s: str, fmt: str) -> int:
    """Parse with an explicit strptime format (reference col.rs:529-545)."""
    try:
        return _to_millis(_dt.datetime.strptime(s, fmt))
    except ValueError:
        raise ColumnParseError(f"Cannot parse '{s}' with format '{fmt}'") from None


def _parse_datetime_bulk(arr: np.ndarray) -> Optional[np.ndarray]:
    """Vectorized epoch-millis parse for the strict auto-format shapes:
    ``YYYY-MM-DD`` (len 10), ``YYYY-MM-DD[T ]HH:MM:SS`` (len 19), and the
    RFC3339 UTC form ``...Z`` (len 20). Bit-equivalent to ``parse_datetime``
    on these shapes (property-fuzzed in tests/test_column.py); any row
    outside them returns None and the caller keeps the exact per-row loop
    (which also produces the reference error messages). ~10x faster than
    fromisoformat row by row — a 10M-row ingest drops from ~16 s to ~2 s."""
    if arr.dtype.kind != "U" or arr.ndim != 1 or arr.size == 0:
        return None
    lens = np.char.str_len(arr)
    if not np.isin(lens, (10, 19, 20)).all():
        return None
    # numpy no longer parses timezone designators: a trailing 'Z' (UTC) is
    # stripped, and it must appear on exactly the length-20 rows
    ends_z = np.char.endswith(arr, "Z")
    if not np.array_equal(ends_z, lens == 20):
        return None
    if ends_z.any():
        # rstrip is the identity on the (verified) non-Z rows
        arr = np.char.rstrip(arr, "Z")
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # tz-parse deprecations -> loop
            ms = arr.astype("datetime64[ms]")
    except Exception:
        return None
    if np.isnat(ms).any():
        return None
    return ms.astype(np.int64)


class _Buf:
    """Growable numpy buffer (amortized O(1) append)."""

    def __init__(self, dtype):
        self._arr = np.empty(16, dtype=dtype)
        self._len = 0

    def push(self, v):
        if self._len == len(self._arr):
            self._arr = np.resize(self._arr, max(32, self._len * 2))
        self._arr[self._len] = v
        self._len += 1

    def extend(self, values: np.ndarray):
        n = len(values)
        if self._len + n > len(self._arr):
            self._arr = np.resize(self._arr, max(self._len + n, self._len * 2))
        self._arr[self._len : self._len + n] = values
        self._len += n

    def view(self) -> np.ndarray:
        return self._arr[: self._len]

    def __len__(self):
        return self._len


class Column:
    """Typed column with a null mask (reference Column, col.rs:21-28)."""

    def __init__(self, name: str, dtype: DataType):
        self._name = name
        self._dtype = dtype
        if dtype is DataType.String:
            self._data: Any = []  # python list of str ("" sentinel for nulls)
        else:
            self._data = _Buf(dtype.numpy_dtype)
        self._null_mask = _Buf(np.bool_)
        self._datetime_format: Optional[str] = None

    # ---- accessors -------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def dtype(self) -> DataType:
        return self._dtype

    def __len__(self) -> int:
        return len(self._data)

    def is_empty(self) -> bool:
        return len(self) == 0

    def null_mask(self) -> np.ndarray:
        """Boolean array, True = null (reference col.rs:488-490)."""
        return self._null_mask.view()

    def _typed_values(self, dtype: DataType):
        if self._dtype is not dtype:
            return None
        if dtype is DataType.String:
            return self._data
        return self._data.view()

    def i32_values(self):
        return self._typed_values(DataType.Int32)

    def i64_values(self):
        return self._typed_values(DataType.Int64)

    def f32_values(self):
        return self._typed_values(DataType.Float32)

    def f64_values(self):
        return self._typed_values(DataType.Float64)

    def string_values(self):
        return self._typed_values(DataType.String)

    def datetime_values(self):
        return self._typed_values(DataType.DateTime)

    def bool_values(self):
        return self._typed_values(DataType.Bool)

    def values(self):
        """Raw stored values (sentinels included), like col.rs:493-502."""
        if self._dtype is DataType.String:
            return self._data
        return self._data.view()

    # ---- ingest ----------------------------------------------------------
    def with_datetime_fmt(self, fmt: str) -> "Column":
        self._datetime_format = fmt
        return self

    def push(self, value) -> "Column":
        """Unified push (reference col.rs:358-390). None means null."""
        dt = self._dtype
        if value is None:
            if dt is DataType.String:
                self._data.append("")
            else:
                self._data.push(dt.sentinel)
            self._null_mask.push(True)
            return self

        if dt is DataType.String:
            if not isinstance(value, str):
                raise ColumnTypeMismatch(dt, type(value).__name__)
            self._data.append(value)
        elif dt is DataType.DateTime:
            if isinstance(value, str):
                millis = (
                    parse_datetime_fmt(value, self._datetime_format)
                    if self._datetime_format
                    else parse_datetime(value)
                )
            elif isinstance(value, int) and not isinstance(value, bool):
                millis = value  # already epoch millis
            elif isinstance(value, _dt.datetime):
                millis = _to_millis(value)
            else:
                raise ColumnTypeMismatch(dt, type(value).__name__)
            self._data.push(np.int64(millis))
        elif dt is DataType.Bool:
            if not isinstance(value, (bool, np.bool_)):
                raise ColumnTypeMismatch(dt, type(value).__name__)
            self._data.push(bool(value))
        elif dt in (DataType.Int32, DataType.Int64):
            if isinstance(value, bool) or not isinstance(
                value, (int, np.integer)
            ):
                raise ColumnTypeMismatch(dt, type(value).__name__)
            self._data.push(value)
        elif dt in (DataType.Float32, DataType.Float64):
            if isinstance(value, bool) or not isinstance(
                value, (int, float, np.integer, np.floating)
            ):
                raise ColumnTypeMismatch(dt, type(value).__name__)
            self._data.push(value)
        else:  # pragma: no cover
            raise ColumnTypeMismatch(dt, type(value).__name__)
        self._null_mask.push(False)
        return self

    def _extend_fast(self, arr: np.ndarray) -> Optional["Column"]:
        """Vectorized non-null append of a 1-D numpy array.

        Returns None (caller falls back to the per-value ``push`` loop, which
        produces the exact reference error) when the array's dtype would not
        be accepted by ``push`` element-wise: int columns only take integer
        arrays (a float array would silently truncate), float columns take
        integer or floating arrays, DateTime takes integer epoch-millis.
        """
        dt = self._dtype
        if dt is DataType.Bool:
            if arr.ndim != 1 or arr.dtype != np.bool_:
                return None
            self._data.extend(arr)
            self._null_mask.extend(np.zeros(len(arr), dtype=np.bool_))
            return self
        if (
            dt is DataType.DateTime
            and arr.dtype.kind == "U"
            and self._datetime_format is None
        ):
            # bulk string parse for the strict auto-format shapes; any row
            # outside them (offsets, fractional seconds, custom formats)
            # falls back to the exact per-row loop
            ms = _parse_datetime_bulk(arr)
            if ms is None:
                return None
            self._data.extend(ms)
            self._null_mask.extend(np.zeros(len(ms), dtype=np.bool_))
            return self
        kind_ok = {
            DataType.Int32: (np.integer,),
            DataType.Int64: (np.integer,),
            DataType.DateTime: (np.integer,),
            DataType.Float32: (np.integer, np.floating),
            DataType.Float64: (np.integer, np.floating),
        }.get(dt)
        if (
            kind_ok is None
            or arr.ndim != 1
            or arr.dtype == np.bool_
            or not any(np.issubdtype(arr.dtype, k) for k in kind_ok)
        ):
            return None
        if dt in (DataType.Int32, DataType.Int64, DataType.DateTime):
            info = np.iinfo(dt.numpy_dtype)
            # compare through Python ints: numpy<2 compares uint64 vs int
            # via float64, where 2^63 and int64 max round together and the
            # guard would silently pass a wrapping cast
            if arr.size and (
                int(arr.min()) < info.min or int(arr.max()) > info.max
            ):
                return None  # push raises the overflow per-value
        self._data.extend(arr.astype(dt.numpy_dtype, copy=False))
        self._null_mask.extend(np.zeros(len(arr), dtype=np.bool_))
        return self

    def from_values(self, values: Iterable) -> "Column":
        """Bulk append; returns self for chaining (reference col.rs:393-401).

        Numpy arrays (and None-free numeric lists) take a vectorized path;
        element types are still validated against the column dtype, so e.g.
        a float array into an Int32 column raises ColumnTypeMismatch exactly
        like per-value ``push`` would.
        """
        if isinstance(values, np.ndarray):
            if self._extend_fast(values) is not None:
                return self
            values = list(values)
        else:
            values = list(values)
            if self._dtype is DataType.String and all(
                type(v) is str for v in values
            ):
                # bulk non-null string append (10M-row ingest would other-
                # wise pay a per-value push loop); mixed/None lists fall
                # through to push for the exact reference errors
                self._data.extend(values)
                self._null_mask.extend(np.zeros(len(values), dtype=np.bool_))
                return self
            if (
                self._dtype is not DataType.String
                and values
                and not any(v is None for v in values)
            ):
                try:
                    arr = np.asarray(values)
                except (ValueError, TypeError, OverflowError):
                    arr = np.asarray([], dtype=object)
                if arr.dtype != object and self._extend_fast(arr) is not None:
                    return self
        for v in values:
            self.push(v)
        return self

    # Alias matching the reference method name (``from`` is reserved in Python).
    from_ = from_values

    def _set_raw(self, values, null_mask: np.ndarray) -> "Column":
        """Bulk-load raw storage (sentinels included) + null mask.

        Internal fast path for persistence (otters_tpu.io): values are the
        already-sentineled backing data, so no per-value validation runs.
        """
        if len(self):
            raise ColumnTypeMismatch(self._dtype, "bulk load on non-empty column")
        if self._dtype is DataType.String:
            self._data = list(values)
        else:
            self._data.extend(np.asarray(values, dtype=self._dtype.numpy_dtype))
        self._null_mask.extend(np.asarray(null_mask, dtype=np.bool_))
        return self

    # ---- display ---------------------------------------------------------
    def head(self) -> None:
        self.head_n(5)

    def head_n(self, n: int) -> None:
        print(f"Column: {self._name} ({self._dtype!r})")
        limit = min(len(self), n)
        nulls = self.null_mask()
        for i in range(limit):
            if bool(nulls[i]):
                print(f"  [{i}]: NULL")
                continue
            dt = self._dtype
            if dt is DataType.String:
                print(f'  [{i}]: "{self._data[i]}"')
            elif dt in (DataType.Float32, DataType.Float64):
                print(f"  [{i}]: {float(self._data.view()[i]):.4f}")
            elif dt is DataType.DateTime:
                ms = int(self._data.view()[i])
                try:
                    s = _dt.datetime.fromtimestamp(
                        ms / 1000.0, tz=_dt.timezone.utc
                    ).strftime("%Y-%m-%d %H:%M:%S UTC")
                    print(f"  [{i}]: {s} ({ms})")
                except (OverflowError, OSError, ValueError):
                    print(f"  [{i}]: Invalid timestamp ({ms})")
            elif dt is DataType.Bool:
                print(f"  [{i}]: {'true' if self._data.view()[i] else 'false'}")
            else:
                print(f"  [{i}]: {int(self._data.view()[i])}")
        if len(self) > n:
            print(f"  ... ({len(self) - n} more rows)")
