"""On-device zonemap construction (segmented min/max/non-null per chunk).

TPU-native replacement for the reference's host-side zonemap fold
(``src/meta_compute.rs:32-132``): column values land on the device once (they
are needed there anyway for row-mask predicates) and the per-chunk statistics
are computed as reshape-reductions over a ``[n_chunks, chunk]`` view — one
VPU pass per column instead of a host loop over chunks.

Semantics match the host/reference fold exactly:
- null rows never contribute (min-fold fill = +max, max-fold fill = -min);
- f32/f64 folds also skip NaN *values* (the reference uses f64::min/max which
  propagate the fold's init when only NaNs are seen); an all-null/NaN chunk
  reports (min=+inf, max=-inf) and non_null counts only real values;
- 64-bit types reduce lexicographically over their exact (hi, lo) pairs
  (see ops/wide64.py) — a two-pass min/max (hi first, then lo among the
  hi-winners) that vectorizes on 32-bit hardware.

All programs are jitted with static (chunk, n_chunks, n_pad, n) so stores of
equal geometry share one compilation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import wide64

_I32 = np.iinfo(np.int32)
_U32_MAX = np.uint32(0xFFFFFFFF)


def _aot_call(name: str, jitted, args, statics):
    """Route a zonemap program through the AOT executable cache: build-time
    compiles persist to disk like the query programs (otters_tpu.aot), so a
    fresh process's store build does not wait on the compile service."""
    from .. import aot

    key = aot.signature(name, repr(sorted(statics.items())), args, {})
    compiled = aot.lookup(key) or aot.load_or_compile(key, jitted, args, statics)
    return compiled(*args)


def _chunk_view(x, excl_fill, *, c: int, n_chunks: int):
    """Pad [n] -> [n_chunks * c] with excl_fill and reshape to [n_chunks, c]."""
    L = n_chunks * c
    n = x.shape[0]
    if L != n:
        x = jnp.pad(x, (0, L - n), constant_values=excl_fill)
    return x.reshape(n_chunks, c)


def _pad_rows(x, n_pad: int, fill):
    n = x.shape[0]
    if n_pad == n:
        return x
    return jnp.pad(x, (0, n_pad - n), constant_values=fill)


def _non_null(nulls, *, c: int, n_chunks: int):
    nn = _chunk_view(~nulls, False, c=c, n_chunks=n_chunks)
    return nn.sum(axis=1, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("c", "n_chunks", "n_pad"))
def _build_i32_jit(vals, nulls, *, c: int, n_chunks: int, n_pad: int):
    lo = jnp.where(nulls, jnp.int32(_I32.max), vals)
    hi = jnp.where(nulls, jnp.int32(_I32.min), vals)
    zmin = _chunk_view(lo, jnp.int32(_I32.max), c=c, n_chunks=n_chunks).min(1)
    zmax = _chunk_view(hi, jnp.int32(_I32.min), c=c, n_chunks=n_chunks).max(1)
    return {
        "vals": _pad_rows(vals, n_pad, jnp.int32(_I32.min)),
        "null": _pad_rows(nulls, n_pad, True),
        "zmin": zmin,
        "zmax": zmax,
        "non_null": _non_null(nulls, c=c, n_chunks=n_chunks),
    }


@partial(jax.jit, static_argnames=("c", "n_chunks", "n_pad"))
def _build_f32_jit(vals, nulls, *, c: int, n_chunks: int, n_pad: int):
    # null sentinel is NaN; real NaN values are skipped by the fold too,
    # exactly like np.fmin/np.fmax (reference meta_compute.rs:84-98)
    excl = nulls | jnp.isnan(vals)
    lo = jnp.where(excl, jnp.float32(jnp.inf), vals)
    hi = jnp.where(excl, jnp.float32(-jnp.inf), vals)
    zmin = _chunk_view(lo, jnp.float32(jnp.inf), c=c, n_chunks=n_chunks).min(1)
    zmax = _chunk_view(hi, jnp.float32(-jnp.inf), c=c, n_chunks=n_chunks).max(1)
    return {
        "vals": _pad_rows(vals, n_pad, jnp.float32(jnp.nan)),
        "null": _pad_rows(nulls, n_pad, True),
        "zmin": zmin,
        "zmax": zmax,
        "non_null": _non_null(nulls, c=c, n_chunks=n_chunks),
    }


def _pair_chunk_min(hi, lo, excl, fill_hi, fill_lo, lo_max, *, c, n_chunks):
    """Lexicographic per-chunk min over (hi, lo) pairs, excl rows skipped."""
    hi_f = jnp.where(excl, fill_hi, hi)
    lo_f = jnp.where(excl, fill_lo, lo)
    hi2 = _chunk_view(hi_f, fill_hi, c=c, n_chunks=n_chunks)
    lo2 = _chunk_view(lo_f, fill_lo, c=c, n_chunks=n_chunks)
    zhi = hi2.min(axis=1)
    # lo among the hi-winners only; fill with the fold's own fill so an
    # all-excluded chunk reports exactly (fill_hi, fill_lo)
    zlo = jnp.where(hi2 == zhi[:, None], lo2, lo_max).min(axis=1)
    return zhi, zlo


def _pair_chunk_max(hi, lo, excl, fill_hi, fill_lo, lo_min, *, c, n_chunks):
    hi_f = jnp.where(excl, fill_hi, hi)
    lo_f = jnp.where(excl, fill_lo, lo)
    hi2 = _chunk_view(hi_f, fill_hi, c=c, n_chunks=n_chunks)
    lo2 = _chunk_view(lo_f, fill_lo, c=c, n_chunks=n_chunks)
    zhi = hi2.max(axis=1)
    zlo = jnp.where(hi2 == zhi[:, None], lo2, lo_min).max(axis=1)
    return zhi, zlo


# (hi, lo) split constants of i64 MAX / MIN (the host fold's null fills)
_I64MAX_HI, _I64MAX_LO = jnp.int32(_I32.max), jnp.uint32(_U32_MAX)
_I64MIN_HI, _I64MIN_LO = jnp.int32(_I32.min), jnp.uint32(0)


@partial(jax.jit, static_argnames=("c", "n_chunks", "n_pad"))
def _build_w64_jit(hi, lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    """Int64 / DateTime zonemaps over exact (hi i32, lo u32) pairs."""
    zmin_hi, zmin_lo = _pair_chunk_min(
        hi, lo, nulls, _I64MAX_HI, _I64MAX_LO, jnp.uint32(_U32_MAX),
        c=c, n_chunks=n_chunks,
    )
    zmax_hi, zmax_lo = _pair_chunk_max(
        hi, lo, nulls, _I64MIN_HI, _I64MIN_LO, jnp.uint32(0),
        c=c, n_chunks=n_chunks,
    )
    return {
        "hi": _pad_rows(hi, n_pad, jnp.int32(_I32.min)),
        "lo": _pad_rows(lo, n_pad, jnp.uint32(0)),
        "null": _pad_rows(nulls, n_pad, True),
        "zmin_hi": zmin_hi,
        "zmin_lo": zmin_lo,
        "zmax_hi": zmax_hi,
        "zmax_lo": zmax_lo,
        "non_null": _non_null(nulls, c=c, n_chunks=n_chunks),
    }


_PINF_HI = jnp.uint32(wide64.F64_ORD_PINF[0])
_PINF_LO = jnp.uint32(wide64.F64_ORD_PINF[1])
_NINF_HI = jnp.uint32(wide64.F64_ORD_NINF[0])
_NINF_LO = jnp.uint32(wide64.F64_ORD_NINF[1])


@partial(jax.jit, static_argnames=("c", "n_chunks", "n_pad"))
def _build_w64f_jit(hi, lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    """Float64 zonemaps over the ordered-integer (hi u32, lo u32) domain.

    Nulls are stored as NaN (ordered domain > +inf) and real NaN values are
    skipped like the host fmin/fmax fold: an all-null/NaN chunk reports
    (min=+inf, max=-inf), matching meta.py's host build exactly."""
    is_nan = wide64.pair_lt(_PINF_HI, _PINF_LO, hi, lo) | wide64.pair_lt(
        hi, lo, _NINF_HI, _NINF_LO
    )
    excl = nulls | is_nan
    zmin_hi, zmin_lo = _pair_chunk_min(
        hi, lo, excl, _PINF_HI, _PINF_LO, jnp.uint32(_U32_MAX),
        c=c, n_chunks=n_chunks,
    )
    zmax_hi, zmax_lo = _pair_chunk_max(
        hi, lo, excl, _NINF_HI, _NINF_LO, jnp.uint32(0),
        c=c, n_chunks=n_chunks,
    )
    return {
        "hi": _pad_rows(hi, n_pad, jnp.uint32(0)),
        "lo": _pad_rows(lo, n_pad, jnp.uint32(0)),
        "null": _pad_rows(nulls, n_pad, True),
        "zmin_hi": zmin_hi,
        "zmin_lo": zmin_lo,
        "zmax_hi": zmax_hi,
        "zmax_lo": zmax_lo,
        "non_null": _non_null(nulls, c=c, n_chunks=n_chunks),
    }


@partial(jax.jit, static_argnames=("c", "n_chunks", "n_pad"))
def _build_str_rows_jit(rh_hi, rh_lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    """String row state: padded identity-hash halves + per-chunk non-null.

    (The Bloom bit matrix itself is built from host-side string hashes —
    strings never live on device; see ops/bloom.py.)"""
    zero = jnp.uint32(0)
    return {
        "rh_hi": _pad_rows(jnp.where(nulls, zero, rh_hi), n_pad, zero),
        "rh_lo": _pad_rows(jnp.where(nulls, zero, rh_lo), n_pad, zero),
        "null": _pad_rows(nulls, n_pad, True),
        "non_null": _non_null(nulls, c=c, n_chunks=n_chunks),
    }


def build_i32(vals, nulls, *, c: int, n_chunks: int, n_pad: int):
    return _aot_call(
        "zm_build_i32", _build_i32_jit, (vals, nulls),
        dict(c=c, n_chunks=n_chunks, n_pad=n_pad),
    )


def build_f32(vals, nulls, *, c: int, n_chunks: int, n_pad: int):
    return _aot_call(
        "zm_build_f32", _build_f32_jit, (vals, nulls),
        dict(c=c, n_chunks=n_chunks, n_pad=n_pad),
    )


def build_w64(hi, lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    return _aot_call(
        "zm_build_w64", _build_w64_jit, (hi, lo, nulls),
        dict(c=c, n_chunks=n_chunks, n_pad=n_pad),
    )


def build_w64f(hi, lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    return _aot_call(
        "zm_build_w64f", _build_w64f_jit, (hi, lo, nulls),
        dict(c=c, n_chunks=n_chunks, n_pad=n_pad),
    )


def build_str_rows(rh_hi, rh_lo, nulls, *, c: int, n_chunks: int, n_pad: int):
    return _aot_call(
        "zm_build_str_rows", _build_str_rows_jit, (rh_hi, rh_lo, nulls),
        dict(c=c, n_chunks=n_chunks, n_pad=n_pad),
    )
