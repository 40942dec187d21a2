"""Run module doctest examples (the analog of the reference's rustdoc tests)."""

import doctest

import otters_tpu.expr
import otters_tpu.evaluate


def test_expr_doctests():
    results = doctest.testmod(otters_tpu.expr, verbose=False)
    assert results.failed == 0
    assert results.attempted > 0


def test_evaluate_doctests():
    results = doctest.testmod(otters_tpu.evaluate, verbose=False)
    assert results.failed == 0
    assert results.attempted > 0
