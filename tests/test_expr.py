"""Expression DSL + CNF compiler tests, porting reference tests/expr_tests.rs."""

import pytest

from otters_tpu import (
    DataType,
    InvalidComparison,
    TypeMismatch,
    UnknownColumn,
    UnsupportedStringOp,
    col,
    lit,
)
from otters_tpu.column import parse_datetime
from otters_tpu.expr import CmpExpr, ColumnFilter
from otters_tpu.types import CmpOp


def schema():
    return {
        "age": DataType.Int64,
        "score": DataType.Float64,
        "name": DataType.String,
        "ts": DataType.DateTime,
    }


def test_numeric_gt_simple():
    cf = col("age").gt(25).compile(schema())
    assert cf.clauses == (
        (ColumnFilter("numeric", "age", CmpOp.Gt, 25, "i64"),),
    )


def test_literal_on_left_is_invalid():
    e = CmpExpr(lit(25), col("age"), CmpOp.Lt)
    with pytest.raises(InvalidComparison):
        e.compile(schema())


def test_string_eq_allowed():
    cf = col("name").eq("alice").compile(schema())
    assert cf.clauses == ((ColumnFilter("string", "name", CmpOp.Eq, "alice"),),)


def test_string_or_multiple_equalities():
    cf = (col("name").eq("Alice") | col("name").eq("Bob")).compile(schema())
    assert cf.clauses == (
        (
            ColumnFilter("string", "name", CmpOp.Eq, "Alice"),
            ColumnFilter("string", "name", CmpOp.Eq, "Bob"),
        ),
    )


def test_string_unsupported_op_err():
    e = CmpExpr(col("name"), lit("bob"), CmpOp.Gt)
    with pytest.raises(UnsupportedStringOp) as ei:
        e.compile(schema())
    assert ei.value.column == "name"


def test_type_mismatch_errs():
    with pytest.raises(TypeMismatch) as ei:
        col("age").eq("x").compile(schema())
    assert ei.value.column == "age" and ei.value.got == "string"

    with pytest.raises(TypeMismatch) as ei2:
        col("age").gt(25.5).compile(schema())
    assert ei2.value.column == "age" and ei2.value.got == "float"


def test_float_column_widen_int_literal():
    cf = col("score").gte(80).compile(schema())
    assert cf.clauses == (
        (ColumnFilter("numeric", "score", CmpOp.Gte, 80.0, "f64"),),
    )


def test_float_column_float_literal():
    cf = col("score").gt(80.5).compile(schema())
    assert cf.clauses == (
        (ColumnFilter("numeric", "score", CmpOp.Gt, 80.5, "f64"),),
    )


def test_and_yields_two_clauses():
    cf = (col("age").gt(25) & col("score").gte(80.0)).compile(schema())
    assert len(cf.clauses) == 2
    assert cf.clauses[0][0].is_numeric and cf.clauses[1][0].is_numeric


def test_or_yields_one_clause_with_two_leaves():
    cf = (col("age").gt(25) | col("age").lt(18)).compile(schema())
    assert len(cf.clauses) == 1
    assert len(cf.clauses[0]) == 2


def test_complex_cnf_distribution():
    a = col("age").gt(25)
    b = col("score").gte(80.0)
    c = col("age").lt(18)
    cf = (a & (b | c)).compile(schema())
    assert len(cf.clauses) == 2
    sizes = sorted(len(cl) for cl in cf.clauses)
    assert sizes == [1, 2]


def test_unknown_column_error():
    with pytest.raises(UnknownColumn) as ei:
        col("missing").eq(1).compile(schema())
    assert ei.value.column == "missing"


def test_datetime_string_literal_compiles():
    s = "2023-01-02T03:04:05Z"
    expected_ms = parse_datetime(s)
    cf = col("ts").gte(s).compile(schema())
    assert cf.clauses == (
        (ColumnFilter("numeric", "ts", CmpOp.Gte, expected_ms, "i64"),),
    )
    # cross-check against a hand-computed value
    assert expected_ms == 1672628645000


def test_datetime_non_string_literal_err():
    with pytest.raises(TypeMismatch) as ei:
        col("ts").eq(1700000000000).compile(schema())
    assert ei.value.column == "ts" and ei.value.got == "datetime string"


def test_tautology_in_or_clause_is_removed():
    e = (col("name").eq("bob") | col("name").neq("bob")) & col("age").gt(5)
    cf = e.compile(schema())
    assert len(cf.clauses) == 1
    assert cf.clauses[0][0].is_numeric
