"""wide64 (hi, lo) pair semantics tests.

Replaces the behavioral contract of the reference's composite SIMD types
(tests/simd_types_tests.rs): exact 64-bit comparison semantics, here
implemented as lexicographic 32-bit pair compares on the VPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from otters_tpu.ops import wide64
from otters_tpu.types import CmpOp

I64_EDGE = [
    0,
    1,
    -1,
    2**31 - 1,
    2**31,
    -(2**31),
    -(2**31) - 1,
    2**40 + 123,
    -(2**40) - 123,
    2**62,
    -(2**62),
    np.iinfo(np.int64).max,
    np.iinfo(np.int64).min,
]

F64_EDGE = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    1.0 + 2**-40,
    1.0 - 2**-40,
    1e-300,
    -1e-300,
    1e30,
    -1e30,
    3.5,
    1234567.890123,
]


@pytest.mark.parametrize(
    "cmp",
    [CmpOp.Eq, CmpOp.Neq, CmpOp.Lt, CmpOp.Lte, CmpOp.Gt, CmpOp.Gte],
)
def test_i64_pair_cmp_matches_int64(cmp):
    vals = np.array(I64_EDGE, dtype=np.int64)
    thrs = np.array(I64_EDGE, dtype=np.int64)
    vhi, vlo = wide64.split_i64(vals)
    for t in thrs:
        thi, tlo = wide64.split_i64_scalar(int(t))
        got = np.asarray(
            wide64.pair_cmp(
                cmp, jnp.asarray(vhi), jnp.asarray(vlo), jnp.asarray(thi), jnp.asarray(tlo)
            )
        )
        expected = {
            CmpOp.Eq: vals == t,
            CmpOp.Neq: vals != t,
            CmpOp.Lt: vals < t,
            CmpOp.Lte: vals <= t,
            CmpOp.Gt: vals > t,
            CmpOp.Gte: vals >= t,
        }[cmp]
        np.testing.assert_array_equal(got, expected, err_msg=f"t={t} cmp={cmp}")


@pytest.mark.parametrize(
    "cmp",
    [CmpOp.Eq, CmpOp.Neq, CmpOp.Lt, CmpOp.Lte, CmpOp.Gt, CmpOp.Gte],
)
def test_f64_pair_cmp_matches_float64(cmp):
    vals = np.array(F64_EDGE, dtype=np.float64)
    vhi, vlo = wide64.split_f64(vals)
    for t in F64_EDGE:
        thi, tlo = wide64.split_f64_scalar(float(t))
        got = np.asarray(
            wide64.pair_cmp(
                cmp, jnp.asarray(vhi), jnp.asarray(vlo), jnp.asarray(thi), jnp.asarray(tlo)
            )
        )
        expected = {
            CmpOp.Eq: vals == t,
            CmpOp.Neq: vals != t,
            CmpOp.Lt: vals < t,
            CmpOp.Lte: vals <= t,
            CmpOp.Gt: vals > t,
            CmpOp.Gte: vals >= t,
        }[cmp]
        np.testing.assert_array_equal(got, expected, err_msg=f"t={t} cmp={cmp}")


def test_i64_random_roundtrip_order():
    rng = np.random.default_rng(0)
    vals = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 1000)
    hi, lo = wide64.split_i64(vals)
    # reconstruct
    back = (hi.astype(np.int64) << 32) | lo.astype(np.int64)
    np.testing.assert_array_equal(back, vals)


def test_f64_ordered_split_total_order():
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [
            rng.normal(scale=1e6, size=500),
            rng.normal(scale=1e-300, size=100),  # subnormal territory
            np.array([0.0, -0.0, np.inf, -np.inf, 5e-324, -5e-324]),
        ]
    )
    hi, lo = wide64.split_f64(vals)
    u = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    # sorting by ordered-integer code sorts the doubles
    assert np.all(np.diff(vals[np.argsort(u, kind="stable")]) >= 0)


def test_f64_negzero_compares_equal():
    # IEEE: -0.0 == 0.0; the split canonicalizes so both get one code
    hi0, lo0 = wide64.split_f64_scalar(0.0)
    hin, lon = wide64.split_f64_scalar(-0.0)
    assert (hi0, lo0) == (hin, lon)


def test_f64_nan_outside_ordered_range():
    hi, lo = wide64.split_f64(np.array([np.nan, -np.nan]))
    pin_hi, pin_lo = wide64.F64_ORD_PINF
    nin_hi, nin_lo = wide64.F64_ORD_NINF
    for h, l in zip(hi, lo):
        above = (h, l) > (pin_hi, pin_lo)
        below = (h, l) < (nin_hi, nin_lo)
        assert above or below


def test_pair_min_max():
    a = np.array([1, 2**40, -5], dtype=np.int64)
    b = np.array([2, 2**40 + 1, -6], dtype=np.int64)
    ahi, alo = wide64.split_i64(a)
    bhi, blo = wide64.split_i64(b)
    mn_hi, mn_lo = wide64.pair_min(
        jnp.asarray(ahi), jnp.asarray(alo), jnp.asarray(bhi), jnp.asarray(blo)
    )
    back = (np.asarray(mn_hi).astype(np.int64) << 32) | np.asarray(mn_lo).astype(
        np.int64
    )
    np.testing.assert_array_equal(back, np.minimum(a, b))
    mx_hi, mx_lo = wide64.pair_max(
        jnp.asarray(ahi), jnp.asarray(alo), jnp.asarray(bhi), jnp.asarray(blo)
    )
    back = (np.asarray(mx_hi).astype(np.int64) << 32) | np.asarray(mx_lo).astype(
        np.int64
    )
    np.testing.assert_array_equal(back, np.maximum(a, b))


def test_i64_lo_boundary_crossings():
    """simd_types_tests edge contract: values straddling the 32-bit split
    boundary (same hi, different lo / adjacent hi) compare exactly."""
    vals = np.array(
        [2**32 - 1, 2**32, 2**32 + 1, -(2**32) - 1, -(2**32), -(2**32) + 1],
        dtype=np.int64,
    )
    hi, lo = wide64.split_i64(vals)
    for cmp in (CmpOp.Eq, CmpOp.Neq, CmpOp.Lt, CmpOp.Lte, CmpOp.Gt, CmpOp.Gte):
        for t in vals:
            thi, tlo = wide64.split_i64_scalar(int(t))
            got = np.asarray(
                wide64.pair_cmp(cmp, jnp.asarray(hi), jnp.asarray(lo), thi, tlo)
            )
            py = {
                CmpOp.Eq: lambda a, b: a == b,
                CmpOp.Neq: lambda a, b: a != b,
                CmpOp.Lt: lambda a, b: a < b,
                CmpOp.Lte: lambda a, b: a <= b,
                CmpOp.Gt: lambda a, b: a > b,
                CmpOp.Gte: lambda a, b: a >= b,
            }[cmp]
            want = np.asarray([py(int(v), int(t)) for v in vals])
            np.testing.assert_array_equal(got, want, err_msg=f"{cmp} {t}")


def test_u64_large_values_unsigned_semantics():
    """simd_types_tests.rs:317-330: values past the signed midpoint must
    compare as UNSIGNED in the ordered u32-pair domain (the f64 map's)."""
    big1 = np.uint64(2**63 + 100)
    big2 = np.uint64(2**63 + 50)
    h1, l1 = np.uint32(big1 >> np.uint64(32)), np.uint32(big1 & np.uint64(0xFFFFFFFF))
    h2, l2 = np.uint32(big2 >> np.uint64(32)), np.uint32(big2 & np.uint64(0xFFFFFFFF))
    assert bool(wide64.pair_lt(h2, l2, h1, l1))
    assert not bool(wide64.pair_lt(h1, l1, h2, l2))
    assert not bool(wide64.pair_eq(h1, l1, h2, l2))


def test_signed_unsigned_consistency_small_values():
    """simd_types_tests.rs:338-356: small positive values compare the same
    through the signed i64 split and the unsigned f64 ordered split."""
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int64)
    b = np.array([2, 1, 4, 3, 6, 5, 8, 7], dtype=np.int64)
    ia = wide64.split_i64(a)
    ib = wide64.split_i64(b)
    fa = wide64.split_f64(a.astype(np.float64))
    fb = wide64.split_f64(b.astype(np.float64))
    for cmp in (CmpOp.Gt, CmpOp.Lt, CmpOp.Eq):
        gi = np.asarray(wide64.pair_cmp(cmp, *map(jnp.asarray, ia), *map(jnp.asarray, ib)))
        gf = np.asarray(wide64.pair_cmp(cmp, *map(jnp.asarray, fa), *map(jnp.asarray, fb)))
        np.testing.assert_array_equal(gi, gf, err_msg=str(cmp))


def test_min_max_cross_type_consistency():
    """simd_types_tests.rs:356-397: pair_min/pair_max agree across the i64
    and f64 representations for positive values."""
    v1 = np.array([5, 2, 7, 1, 9, 3, 8, 4], dtype=np.int64)
    v2 = np.array([3, 6, 4, 8, 2, 7, 1, 9], dtype=np.int64)
    want_min = np.minimum(v1, v2)
    want_max = np.maximum(v1, v2)
    ih1, il1 = map(jnp.asarray, wide64.split_i64(v1))
    ih2, il2 = map(jnp.asarray, wide64.split_i64(v2))
    mh, ml = wide64.pair_min(ih1, il1, ih2, il2)
    got = (np.asarray(mh).astype(np.int64) << 32) | np.asarray(ml).astype(np.int64)
    np.testing.assert_array_equal(got, want_min)
    mh, ml = wide64.pair_max(ih1, il1, ih2, il2)
    got = (np.asarray(mh).astype(np.int64) << 32) | np.asarray(ml).astype(np.int64)
    np.testing.assert_array_equal(got, want_max)
    # f64 representation agrees
    fh1, fl1 = map(jnp.asarray, wide64.split_f64(v1.astype(np.float64)))
    fh2, fl2 = map(jnp.asarray, wide64.split_f64(v2.astype(np.float64)))
    wmin_h, wmin_l = wide64.split_f64(want_min.astype(np.float64))
    gh, gl = wide64.pair_min(fh1, fl1, fh2, fl2)
    np.testing.assert_array_equal(np.asarray(gh), wmin_h)
    np.testing.assert_array_equal(np.asarray(gl), wmin_l)
