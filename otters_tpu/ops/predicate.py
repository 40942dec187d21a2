"""Device-side predicate evaluation: chunk masks and row masks.

TPU-native replacement for the reference's pruning kernels:
- chunk-mask-over-zonemaps SIMD loops (``type_utils.rs:446-584,739-889`` +
  orchestration ``meta.rs:405-544``) become one vectorized pass over
  `[n_chunks]` zonemap arrays resident in HBM;
- row-mask SIMD loops (``type_utils.rs:306-444,587-736`` +
  ``meta_compute.rs:194-318``) become fused elementwise predicates over
  `[N_pad]` column arrays, consumed by the scoring program as a row mask.

Semantics mirror the reference exactly:
- chunk rules: Eq -> min<=t<=max, Lt -> min<t, Lte -> min<=t, Gt -> max>t,
  Gte -> max>=t, Neq -> keep; a chunk with zero non-null values never
  survives (type_utils.rs:446-584);
- string chunks: Eq -> Bloom "maybe contains", Neq -> keep (meta.rs:523-544);
- row rules: value cmp threshold with null rows always excluded; string rows
  compare by 64-bit identity hash (Eq verified host-side afterwards).

A compiled plan is an AND of OR-clauses; leaves carry a static descriptor
``(repr, column, cmp)`` where repr in {'i32','f32','w64','str'} selects the
device compare, and a traced parameter tuple (thresholds / hash + Bloom probe
coordinates) so repeated queries with different literals reuse one XLA
compilation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import CmpOp
from . import bloom as bloom_ops
from . import wide64

# Static leaf descriptor: (repr, column_name, CmpOp)
# Traced leaf params:
#   'i32' / 'f32' : (thr,)
#   'w64'         : (thr_hi, thr_lo)
#   'str'         : (rh_hi, rh_lo, bloom_words, bloom_masks)
#   'hostmask'    : (row_mask[n_pad], chunk_any[n_chunks])
#   'null'        : (chunk_lens[n_chunks],)


def _leaf_row_mask(leaf, params, cols):
    rep, name, cmp = leaf
    if rep == "hostmask":
        # extended string predicate (or a synthetic exact-mask plan from the
        # collision fallback): evaluated host-side, no column arrays needed
        return params[0]
    c = cols[name]
    not_null = ~c["null"]
    if rep == "null":
        # is_null / is_not_null: the only predicates that can select nulls.
        # Padding rows read as null but the scoring core's validity mask
        # excludes them regardless (scoring.py: ok = valid[None, :]).
        return c["null"] if cmp is CmpOp.IsNull else not_null
    if rep in ("i32", "f32"):
        (thr,) = params
        v = c["vals"]
        if cmp is CmpOp.Eq:
            ok = v == thr
        elif cmp is CmpOp.Neq:
            ok = v != thr
        elif cmp is CmpOp.Lt:
            ok = v < thr
        elif cmp is CmpOp.Lte:
            ok = v <= thr
        elif cmp is CmpOp.Gt:
            ok = v > thr
        else:
            ok = v >= thr
        return ok & not_null
    if rep == "w64":
        thr_hi, thr_lo = params
        ok = wide64.pair_cmp(cmp, c["hi"], c["lo"], thr_hi, thr_lo)
        return ok & not_null
    if rep == "w64f":
        # f64 in the ordered-integer domain; NaN values sit outside the
        # [-inf, +inf] ordered range and follow IEEE semantics (only Neq true)
        thr_hi, thr_lo = params
        vhi, vlo = c["hi"], c["lo"]
        pin_hi, pin_lo = wide64.F64_ORD_PINF
        nin_hi, nin_lo = wide64.F64_ORD_NINF
        is_nan = wide64.pair_lt(pin_hi, pin_lo, vhi, vlo) | wide64.pair_lt(
            vhi, vlo, nin_hi, nin_lo
        )
        base = wide64.pair_cmp(cmp, vhi, vlo, thr_hi, thr_lo)
        ok = (base | is_nan) if cmp is CmpOp.Neq else (base & ~is_nan)
        return ok & not_null
    if rep == "nanthr":
        # predicate against a NaN literal: IEEE-false for all ops except Neq
        if cmp is CmpOp.Neq:
            return not_null
        return jnp.zeros_like(not_null)
    # string: identity-hash compare (two uint32 halves = one 64-bit compare)
    rh_hi, rh_lo, _, _ = params
    eq = (c["rh_hi"] == rh_hi) & (c["rh_lo"] == rh_lo)
    if cmp is CmpOp.Eq:
        return eq & not_null
    if cmp is CmpOp.Neq:
        return (~eq) & not_null
    # other comparators are rejected at compile time (UnsupportedStringOp);
    # reference row kernels treat them as never-satisfied (meta_compute.rs:308-312)
    return jnp.zeros_like(not_null)


def _leaf_chunk_mask(leaf, params, cols):
    rep, name, cmp = leaf
    if rep == "hostmask":
        return params[1]  # exact per-chunk any(), computed host-side
    c = cols[name]
    has_values = c["non_null"] > 0
    if rep == "null":
        # params = (chunk_lens,): a chunk with no null rows is pruned for
        # is_null; one with no values is pruned for is_not_null. Padded
        # chunks have len == non_null == 0 and never survive either.
        if cmp is CmpOp.IsNull:
            (clens,) = params
            return clens.astype(jnp.int32) > c["non_null"].astype(jnp.int32)
        return has_values
    if rep == "nanthr":
        if cmp is CmpOp.Neq:
            return has_values
        return jnp.zeros_like(has_values)
    if rep == "str":
        if cmp is CmpOp.Eq:
            _, _, words, masks = params
            return bloom_ops.probe(c["bloom"], words, masks) & has_values
        return has_values  # Neq conservatively keeps non-empty chunks
    if rep in ("i32", "f32"):
        (thr,) = params
        zmin, zmax = c["zmin"], c["zmax"]
        if cmp is CmpOp.Eq:
            ok = (zmin <= thr) & (zmax >= thr)
        elif cmp is CmpOp.Lt:
            ok = zmin < thr
        elif cmp is CmpOp.Lte:
            ok = zmin <= thr
        elif cmp is CmpOp.Gt:
            ok = zmax > thr
        elif cmp is CmpOp.Gte:
            ok = zmax >= thr
        else:  # Neq keeps every non-empty chunk
            ok = jnp.ones_like(has_values)
        return ok & has_values
    # w64
    thr_hi, thr_lo = params
    zmin_hi, zmin_lo = c["zmin_hi"], c["zmin_lo"]
    zmax_hi, zmax_lo = c["zmax_hi"], c["zmax_lo"]
    if cmp is CmpOp.Eq:
        ok = wide64.pair_le(zmin_hi, zmin_lo, thr_hi, thr_lo) & wide64.pair_le(
            thr_hi, thr_lo, zmax_hi, zmax_lo
        )
    elif cmp is CmpOp.Lt:
        ok = wide64.pair_lt(zmin_hi, zmin_lo, thr_hi, thr_lo)
    elif cmp is CmpOp.Lte:
        ok = wide64.pair_le(zmin_hi, zmin_lo, thr_hi, thr_lo)
    elif cmp is CmpOp.Gt:
        ok = wide64.pair_lt(thr_hi, thr_lo, zmax_hi, zmax_lo)
    elif cmp is CmpOp.Gte:
        ok = wide64.pair_le(thr_hi, thr_lo, zmax_hi, zmax_lo)
    else:
        ok = jnp.ones_like(has_values)
    return ok & has_values


def _fold_plan(plan_static, plan_params, cols, leaf_fn, ones):
    """AND over clauses of (OR over leaves). Empty plan keeps everything."""
    acc = ones
    for clause, clause_params in zip(plan_static, plan_params):
        clause_mask = None
        for leaf, params in zip(clause, clause_params):
            m = leaf_fn(leaf, params, cols)
            clause_mask = m if clause_mask is None else (clause_mask | m)
        if clause_mask is not None:
            acc = acc & clause_mask
    return acc


def row_mask(plan_static, plan_params, cols, n_pad):
    ones = jnp.ones((n_pad,), dtype=jnp.bool_)
    return _fold_plan(plan_static, plan_params, cols, _leaf_row_mask, ones)


def chunk_mask(plan_static, plan_params, cols, n_chunks):
    ones = jnp.ones((n_chunks,), dtype=jnp.bool_)
    return _fold_plan(plan_static, plan_params, cols, _leaf_chunk_mask, ones)
