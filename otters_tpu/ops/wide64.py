"""Exact 64-bit scalar semantics on 32-bit TPU hardware.

TPUs have no f64 datapath and s64 is emulated; otters-tpu therefore stores
Int64 / DateTime / Float64 column values on device as exact (hi, lo) pairs of
32-bit arrays whose **lexicographic order equals the numeric order**:

- int64  x  ->  hi = int32(x >> 32), lo = uint32(x & 0xffffffff)
- float64 x ->  order-preserving integer mapping of the IEEE-754 bits
  (sign bit flipped for positives, all bits flipped for negatives), then the
  same (hi, lo) split. Exact for every double including subnormals and
  infinities; NaNs map outside the [-inf, +inf] ordered range and are
  detected with two extra pair-compares so IEEE comparison semantics hold
  (NaN cmp t is false for everything except Neq).

This replaces the reference's native 64-bit SIMD compare kernels
(``src/type_utils.rs:21-301``: i64x8/f64x8/u64x8 composite types) with a
TPU-native formulation: every comparison lowers to two vectorized 32-bit
compares on the VPU, no x64 mode and no emulated s64 arithmetic needed.

Splits run host-side in numpy at ingest (cheap bitwise/round ops); comparisons
run on device in jnp.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..types import CmpOp

# ---------------------------------------------------------------------------
# Host-side splits (numpy, exact)
# ---------------------------------------------------------------------------


def split_i64(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """int64 array -> (hi int32, lo uint32), lexicographic == numeric order."""
    x = np.asarray(x, dtype=np.int64)
    hi = (x >> 32).astype(np.int32)
    lo = (x & np.int64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


def split_i64_scalar(v: int) -> Tuple[np.int32, np.uint32]:
    hi, lo = split_i64(np.array([v], dtype=np.int64))
    return hi[0], lo[0]


def _f64_ordered_u64(x: np.ndarray) -> np.ndarray:
    """Monotonic f64 -> uint64: u(a) < u(b) iff a < b (NaNs land outside)."""
    x = np.asarray(x, dtype=np.float64) + 0.0  # canonicalize -0.0 -> +0.0
    b = x.view(np.uint64)
    sign = (b >> np.uint64(63)) != 0
    return np.where(sign, ~b, b | np.uint64(0x8000000000000000))


def split_f64(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """float64 array -> ordered (hi uint32, lo uint32) pair."""
    u = _f64_ordered_u64(x)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


def split_f64_scalar(v: float) -> Tuple[np.uint32, np.uint32]:
    hi, lo = split_f64(np.array([v], dtype=np.float64))
    return hi[0], lo[0]


# Ordered-domain bounds of the finite+inf range; values outside are NaNs.
F64_ORD_PINF = split_f64_scalar(np.inf)
F64_ORD_NINF = split_f64_scalar(-np.inf)


# ---------------------------------------------------------------------------
# Device-side comparisons (jnp; work elementwise on (hi, lo) pairs)
# ---------------------------------------------------------------------------


def pair_lt(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def pair_le(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def pair_eq(ahi, alo, bhi, blo):
    return (ahi == bhi) & (alo == blo)


def pair_cmp(cmp: CmpOp, ahi, alo, bhi, blo):
    """Elementwise `a cmp b` for (hi, lo) pairs."""
    if cmp is CmpOp.Eq:
        return pair_eq(ahi, alo, bhi, blo)
    if cmp is CmpOp.Neq:
        return ~pair_eq(ahi, alo, bhi, blo)
    if cmp is CmpOp.Lt:
        return pair_lt(ahi, alo, bhi, blo)
    if cmp is CmpOp.Lte:
        return pair_le(ahi, alo, bhi, blo)
    if cmp is CmpOp.Gt:
        return pair_lt(bhi, blo, ahi, alo)
    if cmp is CmpOp.Gte:
        return pair_le(bhi, blo, ahi, alo)
    raise ValueError(f"unknown cmp {cmp}")


def pair_min(ahi, alo, bhi, blo):
    take_a = pair_le(ahi, alo, bhi, blo)
    return jnp.where(take_a, ahi, bhi), jnp.where(take_a, alo, blo)


def pair_max(ahi, alo, bhi, blo):
    take_a = pair_le(bhi, blo, ahi, alo)
    return jnp.where(take_a, ahi, bhi), jnp.where(take_a, alo, blo)
