"""On-device zonemap builder vs a host numpy reduceat oracle.

The oracle is the reference fold (meta_compute.rs:32-132) re-done in numpy:
skip nulls, f32/f64 folds also skip NaN, all-excluded chunks report
(+inf/-inf) / (i64 MAX/MIN) fills.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from otters_tpu.ops import wide64, zonemap as zm

I32 = np.iinfo(np.int32)
I64 = np.iinfo(np.int64)


def _offs(n, c):
    return np.arange(0, n, c, dtype=np.int64)


def _oracle_i64(vals, nulls, c):
    offs = _offs(len(vals), c)
    lo = np.where(nulls, I64.max, vals)
    hi = np.where(nulls, I64.min, vals)
    return np.minimum.reduceat(lo, offs), np.maximum.reduceat(hi, offs)


def test_i32_zonemaps_device():
    rng = np.random.default_rng(0)
    n, c = 1000, 128  # non-dividing chunk
    vals = rng.integers(I32.min, I32.max, n).astype(np.int32)
    nulls = rng.random(n) < 0.2
    nulls[:c] = True  # all-null chunk
    n_chunks = -(-n // c)
    out = zm.build_i32(
        jnp.asarray(vals), jnp.asarray(nulls), c=c, n_chunks=n_chunks,
        n_pad=1024,
    )
    offs = _offs(n, c)
    want_min = np.minimum.reduceat(np.where(nulls, I32.max, vals), offs)
    want_max = np.maximum.reduceat(np.where(nulls, I32.min, vals), offs)
    np.testing.assert_array_equal(np.asarray(out["zmin"]), want_min)
    np.testing.assert_array_equal(np.asarray(out["zmax"]), want_max)
    np.testing.assert_array_equal(
        np.asarray(out["non_null"]),
        np.add.reduceat((~nulls).astype(np.int32), offs),
    )
    assert np.asarray(out["vals"]).shape == (1024,)
    assert np.asarray(out["null"])[n:].all()


def test_f32_zonemaps_skip_nan_values():
    rng = np.random.default_rng(1)
    n, c = 512, 64
    vals = rng.normal(size=n).astype(np.float32)
    nulls = rng.random(n) < 0.15
    vals[5] = np.nan  # real NaN value (non-null)
    vals[64:128] = np.nan  # all-NaN chunk (values, not nulls)
    nulls[64:128] = False
    n_chunks = n // c
    out = zm.build_f32(
        jnp.asarray(vals), jnp.asarray(nulls), c=c, n_chunks=n_chunks,
        n_pad=512,
    )
    offs = _offs(n, c)
    filled = np.where(nulls, np.nan, vals)
    want_min = np.fmin.reduceat(filled, offs)
    want_max = np.fmax.reduceat(filled, offs)
    want_min = np.where(np.isnan(want_min), np.inf, want_min)
    want_max = np.where(np.isnan(want_max), -np.inf, want_max)
    np.testing.assert_array_equal(np.asarray(out["zmin"]), want_min)
    np.testing.assert_array_equal(np.asarray(out["zmax"]), want_max)
    # NaN values are non-null (they are values, not missing)
    assert int(np.asarray(out["non_null"])[1]) == 64


@pytest.mark.parametrize("extremes", [False, True])
def test_w64_zonemaps_lexicographic(extremes):
    rng = np.random.default_rng(2)
    n, c = 768, 256
    vals = rng.integers(-(2**62), 2**62, n)
    if extremes:
        vals[0], vals[1] = I64.min, I64.max
        vals[2], vals[3] = -1, 1  # hi boundary crossing
        vals[4] = 0
    nulls = rng.random(n) < 0.25
    nulls[256:512] = True  # all-null chunk
    hi, lo = wide64.split_i64(vals)
    out = zm.build_w64(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(nulls),
        c=c, n_chunks=3, n_pad=768,
    )
    want_min, want_max = _oracle_i64(vals, nulls, c)
    got_min = (
        np.asarray(out["zmin_hi"]).astype(np.int64) << 32
    ) | np.asarray(out["zmin_lo"]).astype(np.int64)
    got_max = (
        np.asarray(out["zmax_hi"]).astype(np.int64) << 32
    ) | np.asarray(out["zmax_lo"]).astype(np.int64)
    np.testing.assert_array_equal(got_min, want_min)
    np.testing.assert_array_equal(got_max, want_max)


def test_w64f_zonemaps_ordered_domain():
    rng = np.random.default_rng(3)
    n, c = 512, 128
    vals = rng.normal(scale=1e10, size=n)
    vals[0] = -np.inf
    vals[1] = np.inf
    vals[2] = 5e-324  # subnormal
    vals[3] = -0.0
    vals[10] = np.nan  # NaN value skipped by the fold
    nulls = rng.random(n) < 0.2
    nulls[10] = False
    nulls[128:256] = True  # all-null chunk -> (inf, -inf)
    hi, lo = wide64.split_f64(vals)
    # null rows are STORED as NaN sentinel (matches Column storage)
    stored = np.where(nulls, np.nan, vals)
    shi, slo = wide64.split_f64(stored)
    out = zm.build_w64f(
        jnp.asarray(shi), jnp.asarray(slo), jnp.asarray(nulls),
        c=c, n_chunks=4, n_pad=512,
    )
    offs = _offs(n, c)
    want_min = np.fmin.reduceat(stored, offs)
    want_max = np.fmax.reduceat(stored, offs)
    want_min = np.where(np.isnan(want_min), np.inf, want_min)
    want_max = np.where(np.isnan(want_max), -np.inf, want_max)
    wmin_hi, wmin_lo = wide64.split_f64(want_min)
    wmax_hi, wmax_lo = wide64.split_f64(want_max)
    np.testing.assert_array_equal(np.asarray(out["zmin_hi"]), wmin_hi)
    np.testing.assert_array_equal(np.asarray(out["zmin_lo"]), wmin_lo)
    np.testing.assert_array_equal(np.asarray(out["zmax_hi"]), wmax_hi)
    np.testing.assert_array_equal(np.asarray(out["zmax_lo"]), wmax_lo)


def test_empty_store_zonemaps():
    out = zm.build_i32(
        jnp.zeros(0, jnp.int32), jnp.zeros(0, bool), c=1024, n_chunks=0,
        n_pad=128,
    )
    assert np.asarray(out["zmin"]).shape == (0,)
    assert np.asarray(out["vals"]).shape == (128,)
    assert np.asarray(out["null"]).all()
