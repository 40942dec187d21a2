"""MetaStore: vector search with metadata pruning, TPU-native.

Re-design of the reference ``src/meta.rs`` + ``src/meta_compute.rs`` for TPU:

The reference chunks vectors into per-chunk VecStores, builds per-chunk
zonemaps (min/max/non-null + Bloom filters), prunes chunks host-side, then
rayon-scores surviving chunks. Here the whole store is **one device-resident
pytree**:

- vectors `[N_pad, D]` + norms in HBM (one array, not per-chunk stores);
- per-column value arrays + null masks `[N_pad]` on device (64-bit types as
  exact (hi, lo) 32-bit pairs, strings as 64-bit identity hashes);
- zonemaps as `[n_chunks]` device arrays; Bloom filters as one
  `uint32[n_chunks, words]` bit matrix per string column.

A query runs three device programs: (1) chunk-mask pruning over zonemaps
(produces the pruned/evaluated stats — pruning never leaves the TPU),
(2) row-mask predicate evaluation fused with (3) MXU scoring + exact global
top-k. The per-chunk rayon fork-join (meta.rs:678-691) is replaced by the
XLA grid within a device and mesh sharding across devices (otters_tpu.parallel).

Exactness: string equality evaluates by 64-bit hash on device and the k
returned rows are re-verified host-side against the actual strings; a hash
collision that falsely INCLUDES a row (p ~ 2^-64) is detected and the query
transparently re-runs with an exact host-computed row mask. The dual case —
a collision falsely EXCLUDING a row from an Eq match or wrongly satisfying a
Neq — is not detectable from the returned rows and is accepted at the same
2^-64 odds (see hashing.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from .column import Column
from .display import format_build_stats, format_query_stats, metastore_head
from .errors import ExprError, OttersError
from .expr import ColumnFilter, CompiledFilter, Expr
from .ops import bloom as bloom_ops
from .ops import hashing, predicate, scoring, wide64
from .types import (
    NEGATED_CMP,
    NEGATED_STRING_OPS,
    STRING_EXTENDED_OPS,
    VPU_METRICS,
    Cmp,
    CmpOp,
    DataType,
    Metric,
    TakeType,
    default_take_type,
)

_I32 = np.iinfo(np.int32)


# ---------------------------------------------------------------------------
# Stats / results types (reference meta.rs:23-46, 832-852)
# ---------------------------------------------------------------------------


@dataclass
class MetaQueryStats:
    total_chunks: int
    pruned_chunks: int
    evaluated_chunks: int
    vectors_compared: int
    prune_duration: float  # seconds
    score_duration: float
    merge_duration: float
    total_duration: float
    # int8 exactness certificate (take(k, rerank_from=...) on int8 storage):
    # None = certificate not applicable to this query; True = recall 1.0 by
    # construction; False = widening hit its cap (see take() docstring)
    certified: Optional[bool] = None
    # scan width that produced the final candidates (>= rerank_from when the
    # certificate auto-widened)
    scan_k_wide: Optional[int] = None


@dataclass
class MetaBuildStats:
    n_rows: int
    dim: int
    n_chunks: int
    vectors_ingest_duration: float
    zonemap_build_duration: float
    build_total_duration: float


class MetaQueryResults:
    """Query results with materialized metadata columns (meta.rs:23-40)."""

    def __init__(
        self,
        columns: List[str],
        data: Dict[str, Column],
        indices: List[int],
        scores: List[float],
    ):
        self.columns = columns
        self.data = data
        self.indices = indices
        self.scores = scores

    def __len__(self) -> int:
        return len(self.indices)

    def is_empty(self) -> bool:
        return not self.indices

    def column(self, name: str) -> Optional[Column]:
        return self.data.get(name)

    def __str__(self) -> str:
        from .display import AsciiTable, format_cell

        headers = ["index", "score"] + list(self.columns)
        rows = []
        for i in range(len(self)):
            line = [str(self.indices[i]), f"{self.scores[i]:.6f}"]
            for c in self.columns:
                col = self.data.get(c)
                line.append(format_cell(col, i) if col is not None else "")
            rows.append(line)
        return AsciiTable(headers, rows).render()

    def __repr__(self) -> str:
        return str(self)

    def to_pandas(self):
        """-> pandas DataFrame (index, score, metadata columns; nullable
        dtypes for nulls). See otters_tpu.adapters.results_to_pandas."""
        from .adapters import results_to_pandas

        return results_to_pandas(self)

    def to_arrow(self):
        """-> pyarrow.Table. See otters_tpu.adapters.results_to_arrow."""
        from .adapters import results_to_arrow

        return results_to_arrow(self)


# ---------------------------------------------------------------------------
# Device state construction
# ---------------------------------------------------------------------------


class _LruCache(dict):
    """Tiny LRU dict: ``get`` refreshes recency; inserting beyond capacity
    evicts the least-recently-used entry. Hit/miss/eviction counters make
    a thrashing workload visible (``MetaStore.cache_stats()``) instead of
    silently recomputing forever."""

    def __init__(self, cap: int):
        super().__init__()
        self.cap = cap
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get(self, key, default=None):
        if key in self:
            self.hits += 1
            val = super().pop(key)
            super().__setitem__(key, val)  # move to most-recent
            return val
        self.misses += 1
        return default

    def __setitem__(self, key, val):
        if key in self:
            super().pop(key)
        elif len(self) >= self.cap:
            super().pop(next(iter(self)))  # least-recently-used
            self.evictions += 1
        super().__setitem__(key, val)


def _chunk_offsets(n: int, c: int) -> np.ndarray:
    return np.arange(0, n, c, dtype=np.int64)


def _sort_permutation(col: Column, n: int, descending: bool) -> np.ndarray:
    """Stable permutation ordering rows by a column, nulls always last."""
    nulls = np.asarray(col.null_mask(), dtype=bool)[:n]
    idx_nn = np.flatnonzero(~nulls)
    if col.dtype is DataType.String:
        vals = np.asarray(list(col.values())[:n], dtype=object)
    else:
        vals = np.asarray(col.values())[:n]
    sub = idx_nn[np.argsort(vals[idx_nn], kind="stable")]
    if descending:
        sub = sub[::-1]
    return np.concatenate([sub, np.flatnonzero(nulls)]).astype(np.int64)


def _zorder_permutation(columns, names, n: int) -> np.ndarray:
    """Stable permutation ordering rows along a Z-order (Morton) curve over
    several columns — the reference's roadmap item "Ability to reorder
    metadata for better pruning (Something like Z-ordering)".

    Each column is reduced to a dense-rank code (equal values share a code;
    robust to skew, works for every dtype including String via lexicographic
    ranks) scaled to ``b = min(16, 64 // k)`` bits, and the codes are
    bit-interleaved into one uint64 key. Nulls take the maximum code, so
    they cluster in the high corner of the curve (and all-null runs still
    prune via the zonemap non-null counts)."""
    k = len(names)
    b = min(16, 64 // k)
    top = (1 << b) - 1
    codes = []
    for nm in names:
        colo = columns[nm]
        nulls = np.asarray(colo.null_mask(), dtype=bool)[:n]
        if colo.dtype is DataType.String:
            vals = np.asarray(list(colo.values())[:n], dtype=object)
        else:
            vals = np.asarray(colo.values())[:n]
        code = np.full(n, top, dtype=np.uint64)
        idx_nn = np.flatnonzero(~nulls)
        if idx_nn.size:
            _, ranks = np.unique(vals[idx_nn], return_inverse=True)
            u = int(ranks.max()) if ranks.size else 0
            scaled = (
                (ranks.astype(np.float64) * (top / u)).round().astype(np.uint64)
                if u > 0
                else np.zeros(idx_nn.size, dtype=np.uint64)
            )
            code[idx_nn] = scaled
        codes.append(code)
    key = np.zeros(n, dtype=np.uint64)
    for j in range(b):
        for i, code in enumerate(codes):
            key |= ((code >> np.uint64(j)) & np.uint64(1)) << np.uint64(j * k + i)
    return np.argsort(key, kind="stable").astype(np.int64)


def _permute_column(col: Column, perm: np.ndarray) -> Column:
    new = Column(col.name, col.dtype)
    nulls = np.asarray(col.null_mask(), dtype=bool)[perm]
    if col.dtype is DataType.String:
        vals = col.values()
        new._set_raw([vals[i] for i in perm], nulls)
    else:
        new._set_raw(np.asarray(col.values())[perm], nulls)
    return new


def _build_device_column(
    col: Column, n: int, n_pad: int, chunk_size: int, n_chunks: int, bloom_cfg
):
    """-> (repr, device dict of jnp arrays, host aux) for one column.

    The host only stages raw values (plus the cheap (hi, lo) bit-splits for
    64-bit types) and ships them to HBM — they are needed there anyway for
    row-mask predicates. All zonemap statistics (per-chunk min/max/non-null)
    are computed ON DEVICE by ops/zonemap.py segmented reductions, replacing
    the reference's host fold (meta_compute.rs:32-132)."""
    import jax.numpy as jnp

    from .ops import zonemap as zm

    nulls_np = np.asarray(col.null_mask(), dtype=bool)[:n]
    nulls = jnp.asarray(nulls_np)
    dt = col.dtype
    kw = dict(c=chunk_size, n_chunks=n_chunks, n_pad=n_pad)
    aux = None

    if dt is DataType.Int32:
        vals = jnp.asarray(np.asarray(col.values(), dtype=np.int32)[:n])
        dev = dict(zm.build_i32(vals, nulls, **kw))
        rep = "i32"
    elif dt is DataType.Bool:
        # 0/1 int32 on device: zonemap min/max prune chunks for Eq literals
        # (an all-False chunk skips eq(True)); Neq keeps every non-empty
        # chunk, matching the reference rule (type_utils.rs:446-584)
        vals = jnp.asarray(
            np.asarray(col.values(), dtype=np.bool_)[:n].astype(np.int32)
        )
        dev = dict(zm.build_i32(vals, nulls, **kw))
        rep = "i32"
    elif dt is DataType.Float32:
        vals = jnp.asarray(np.asarray(col.values(), dtype=np.float32)[:n])
        dev = dict(zm.build_f32(vals, nulls, **kw))
        rep = "f32"
    elif dt in (DataType.Int64, DataType.DateTime):
        vhi, vlo = wide64.split_i64(np.asarray(col.values(), dtype=np.int64)[:n])
        dev = dict(zm.build_w64(jnp.asarray(vhi), jnp.asarray(vlo), nulls, **kw))
        rep = "w64"
    elif dt is DataType.Float64:
        vhi, vlo = wide64.split_f64(np.asarray(col.values(), dtype=np.float64)[:n])
        dev = dict(zm.build_w64f(jnp.asarray(vhi), jnp.asarray(vlo), nulls, **kw))
        rep = "w64f"
    else:  # String: hashes + Bloom bits come from the host (strings never
        # live on device); padding + non-null counts run on device
        strings = list(col.values())[:n]
        g1, g2 = hashing.hash_strings(strings)
        rh_hi, rh_lo = hashing.identity_halves(g1)
        dev = dict(
            zm.build_str_rows(
                jnp.asarray(rh_hi), jnp.asarray(rh_lo), nulls, **kw
            )
        )
        kind, val = bloom_cfg
        if kind == "fpr":
            params = bloom_ops.BloomParams.from_fpr(val, chunk_size)
        else:
            params = bloom_ops.BloomParams.from_bits(val, chunk_size)
        import os

        # OTTERS_BLOOM_DEVICE: unset/"0"/"false"/"" = host build (the
        # native C++ scatter wins 20x on hardware: 0.27 s vs 5.85 s at
        # 10M rows, hwlogs/bloom.log 2026-08-19 — the scatter is tiny
        # next to the shared host-side hashing, and the device XLA
        # scatter burns a dispatch per chunk-group); any other value =
        # force the device scatter (kept for meshes where host memory,
        # not time, is the constraint, and for parity tests)
        _env = os.environ.get("OTTERS_BLOOM_DEVICE")
        use_device = (
            _env is not None
            and _env.lower() not in ("0", "false", "")
            and bloom_ops.device_build_ok(params, n_chunks)
        )
        if use_device:
            # TPU path: the bit scatter runs on device from the pre-hashed
            # (g1, g2) arrays — host work is hashing only (SURVEY C10)
            dev["bloom"] = bloom_ops.build_matrix_device(
                g1, g2, nulls_np, chunk_size, n_chunks, params
            )
        else:
            chunk_ids = np.arange(n, dtype=np.int64) // chunk_size
            matrix = bloom_ops.build_matrix(
                g1, g2, nulls_np, chunk_ids, n_chunks, params,
                chunk_size=chunk_size,
            )
            dev["bloom"] = jnp.asarray(matrix)
        aux = params
        rep = "str"

    return rep, dev, aux


# ---------------------------------------------------------------------------
# Jitted mask programs
# ---------------------------------------------------------------------------


def _jit_meta_program():
    import jax

    @partial(
        jax.jit,
        static_argnames=(
            "plan_static",
            "metric",
            "k",
            "take_min",
            "cmp",
            "prec",
            "tile",
            "chunk_size",
            "fast",
            "certify",
        ),
    )
    def meta_query(
        dv,
        cols,
        chunk_lens,
        queries,
        plan_params,
        thr,
        *,
        plan_static,
        metric,
        k,
        take_min,
        cmp,
        prec,
        tile,
        chunk_size=0,
        fast=False,
        certify=False,
    ):
        """The whole meta query as ONE device program (single dispatch):

        zonemap chunk-mask pruning + stats -> row-mask predicate tensors ->
        MXU scoring with fused masking -> exact global top-k. This is the
        fusion of the reference's prune/score/merge phases (meta.rs:632-709)
        into a single XLA computation; nothing round-trips to the host.

        certify=True (int8 + rerank): the 5th output is a sound upper bound
        on the true cosine of every row NOT among the returned candidates
        (see ops/pallas_topk certification notes); -inf otherwise.
        """
        import jax.numpy as jnp

        n_pad = dv.vectors.shape[0]
        n_chunks = chunk_lens.shape[0]
        if plan_static:
            cmask = predicate.chunk_mask(plan_static, plan_params, cols, n_chunks)
            evaluated = cmask.sum(dtype=np.int32)
            rows_eval = (chunk_lens * cmask).sum(dtype=np.int32)
            rmask = predicate.row_mask(plan_static, plan_params, cols, n_pad)
        else:
            evaluated = jnp_int32(n_chunks)
            rows_eval = chunk_lens.sum(dtype=np.int32)
            rmask = None

        # certification slack for the NON-pallas paths: one global term
        # (the pallas kernel composes tighter per-query/per-row terms
        # itself). Certified scans run MIXED (bf16-rounded queries x stored
        # rows, see ops/scoring.cert_query_coeffs) — signaled to
        # _score_block by the bf16 query dtype — so the query-side slack
        # term is bf16 rounding (~2e-3), not int8 quantization (~1e-2).
        cert_slack = None
        thr_core = thr
        q_core = queries
        if certify and tile != "pallas":
            d_ = dv.vectors.shape[1]
            qh32, c0, c1, c2 = scoring.cert_query_coeffs(metric, queries, d_)
            lane_a, lane_b = scoring.cert_row_lanes(
                metric, dv.vectors.dtype, dv.resid, dv.inv_norms,
                dv.norms_sq, d_,
            )
            cert_slack = scoring.cert_global_slack(
                c0, c1, c2, lane_a, lane_b, dv.norms_sq
            )
            if cmp in (Cmp.Gt, Cmp.Gte):
                # loosen so no truly passing row is dropped on its scan
                # score (the rerank re-applies the exact filter)
                thr_core = thr - cert_slack
            elif cmp in (Cmp.Lt, Cmp.Lte):
                thr_core = thr + cert_slack
            q_core = qh32.astype(jnp.bfloat16)

        args = (
            dv.vectors,
            dv.norms_sq,
            dv.inv_norms,
            dv.valid,
            q_core,
            rmask,
            thr_core,
        )
        kwargs = dict(metric=metric, k=k, take_min=take_min, cmp=cmp, prec=prec)
        if tile == "pallas":
            # fused Pallas kernel: pruned chunks cost neither HBM nor MXU
            from .ops import pallas_topk as pk

            t_rows = pk.choose_tile(
                dv.vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]),
                chunk=chunk_size,
            )
            if plan_static:
                alive = pk.tiles_alive_from_chunk_mask(
                    cmask, chunk_size, n_pad, t_rows
                )
            else:
                alive = jnp.ones(n_pad // t_rows, dtype=jnp.bool_)
            rows, scores, ok, check, bound = pk.pallas_topk(
                dv.vectors,
                dv.norms_sq,
                dv.inv_norms,
                dv.valid,
                queries,
                rmask,
                thr,
                alive,
                fast=fast,
                certify=certify,
                resid=dv.resid if certify else None,
                resid_bin=dv.resid_bin if certify else None,
                **kwargs,
            )
            return rows, scores, ok, check, bound, evaluated, rows_eval
        if tile == "scan_pruned":
            # pruning for the VPU metrics (and any non-Pallas backend):
            # dead tiles cost neither HBM reads nor VPU work
            from .ops import pallas_topk as pk

            if plan_static:
                alive = pk.tiles_alive_from_chunk_mask(
                    cmask, chunk_size, n_pad, scoring.SCAN_TILE
                )
            else:
                alive = jnp.ones(n_pad // scoring.SCAN_TILE, dtype=jnp.bool_)
            rows, scores, ok = scoring.scan_pruned_topk_core(
                *args, alive, tile=scoring.SCAN_TILE, **kwargs
            )
            return (
                rows, scores, ok, jnp.bool_(True), jnp.float32(-jnp.inf),
                evaluated, rows_eval,
            )
        if tile == "panel":
            rows, scores, ok = scoring.panel_topk_core(*args, **kwargs)
        elif tile == "scan":
            rows, scores, ok = scoring.scan_topk_core(
                *args, tile=scoring.SCAN_TILE, **kwargs
            )
        else:
            rows, scores, ok = scoring.direct_topk_core(*args, **kwargs)
        if certify:
            # global-bound certificate: every unreturned candidate's scan
            # KEY (negated score for take_min) <= the k-th returned one
            # (exact global top-k); with fewer than k valid candidates
            # EVERY passing row was returned and nothing is unexamined
            kth_key = -scores[-1] if take_min else scores[-1]
            bound = jnp.where(
                ok[-1], kth_key + cert_slack, jnp.float32(-jnp.inf)
            )
        else:
            bound = jnp.float32(-jnp.inf)
        return rows, scores, ok, jnp.bool_(True), bound, evaluated, rows_eval

    return meta_query


def jnp_int32(x):
    import jax.numpy as jnp

    return jnp.int32(x)


_meta_query_program = _jit_meta_program()


def _jit_rerank_program():
    import jax

    @partial(jax.jit, static_argnames=("metric", "k", "take_min", "cmp"))
    def rerank_program(qs, vecs, pos, valid_m, thr, *, metric, k, take_min, cmp):
        """Batched exact-f32 re-rank on device: P in-flight queries' widened
        candidate sets scored and top-k'd in ONE dispatch (resolve() fetches
        only [P, k] winners — the host matmul + megabyte candidate fetch per
        batch otherwise dominates pipelined serving).

        qs: P-tuple of [B, D] query arrays (stacked in-program so the whole
        rerank is one dispatch); vecs [U, D] union candidate vectors;
        pos [P, M] positions into vecs (padded); valid_m [P, M] marks real
        candidate slots. Exact per the rerank contract: f32 at HIGHEST
        precision, same formulas as evaluate.exact_rerank, ties
        lower-flat-index-first."""
        import jax.numpy as jnp

        q = jnp.stack([x.astype(jnp.float32) for x in qs])
        v = jnp.take(vecs.astype(jnp.float32), pos, axis=0)  # [P, M, D]
        dots = jnp.einsum(
            "pbd,pmd->pbm", q, v, precision=jax.lax.Precision.HIGHEST
        )
        if metric is Metric.Cosine:
            qn = jnp.sqrt((q * q).sum(-1))
            vn = jnp.sqrt((v * v).sum(-1))
            qi = jnp.where(qn > 0, 1.0 / jnp.where(qn > 0, qn, 1.0), 0.0)
            vi = jnp.where(vn > 0, 1.0 / jnp.where(vn > 0, vn, 1.0), 0.0)
            s = dots * qi[:, :, None] * vi[:, None, :]
        elif metric is Metric.Euclidean:
            s = (
                (q * q).sum(-1)[:, :, None]
                + (v * v).sum(-1)[:, None, :]
                - 2.0 * dots
            )
        else:  # DotProduct
            s = dots
        ok = valid_m[:, None, :] & ~jnp.isnan(s)
        if cmp is not None:
            ok = ok & scoring._filter_ok(s, thr, cmp)
        key = jnp.where(ok, s, jnp.inf if take_min else -jnp.inf)
        if take_min:
            key = -key
        P, B, M = key.shape
        flat = key.reshape(P, B * M)
        _, sel = jax.lax.top_k(flat, k)
        out_s = jnp.take_along_axis(s.reshape(P, B * M), sel, axis=1)
        out_ok = jnp.take_along_axis(ok.reshape(P, B * M), sel, axis=1)
        return (sel % M).astype(np.int32), out_s, out_ok

    return rerank_program


_rerank_program = _jit_rerank_program()


def _call_rerank_program(args, static_kwargs):
    """Dispatch the batched device rerank through the AOT executable cache.

    The rerank program's shape signature depends on the resolve() group
    size P and the candidate-union pad bucket — shapes the single-query
    warm-up never exercises, so the FIRST pipelined resolve() of a fresh
    process paid a multi-second mid-serving compile (hwlogs/warmup.log:
    ~4 s at 2M) that the meta-query AOT layer couldn't see. Same idiom as
    MetaStore._prepare_program: serve from the serialized executable,
    background-warm jit for the signature, switch when ready."""
    import os

    from . import aot

    if os.environ.get("OTTERS_DISABLE_AOT"):
        return _rerank_program(*args, **static_kwargs)
    key = aot.signature(
        "rerank_program",
        repr(sorted(static_kwargs.items(), key=str)),
        args,
        {},
    )
    if aot.jit_is_ready(key):
        return _rerank_program(*args, **static_kwargs)
    compiled = aot.lookup(key) or aot.load_or_compile(
        key, _rerank_program, args, static_kwargs
    )
    aot.ensure_jit_warm(key, _rerank_program, args, static_kwargs)
    return compiled(*args)


def _pad_bucket(n: int, floor: int = 64) -> int:
    """Smallest quarter-octave bucket >= n: prev_pow2 * {1.25, 1.5, 1.75,
    2}. Keeps the compiled-shape count small (4 per octave) while capping
    pad waste at 25% (pure power-of-two padding wastes up to 100%)."""
    if n <= floor:
        return floor
    p = 1 << (n - 1).bit_length()  # next power of two
    base = p >> 1
    for num in (5, 6, 7):  # base * 1.25 / 1.5 / 1.75
        cand = (base * num) >> 2
        if cand >= n:
            return cand
    return p


def _device_rerank_dispatch(store: "MetaStore", plist):
    """Enqueue ONE device rerank for a group of compatible pendings (same
    store/batch shape/metric/filter/k) WITHOUT waiting for it. Returns
    (plist, cands, raw_outputs) for _device_rerank_finish, or None -> host
    fallback. Splitting dispatch from fetch lets resolve() enqueue every
    group's program first and drain them with ONE device->host roundtrip
    (per-group fetches cost ~31 ms each on a tunneled device)."""
    import jax.numpy as jnp

    plan0 = plist[0]._plan
    metric = plan0._metric
    if metric in VPU_METRICS:
        return None  # [P,B,M,D] broadcast would blow memory; host path
    k_final = plan0._take_count
    take_min = plist[0]._take_type is TakeType.Min
    cands = []
    for p in plist:
        rows, _, valid = p._fetched[0], p._fetched[1], p._fetched[2]
        idx = np.asarray(rows)[np.asarray(valid, dtype=bool)].astype(np.int64)
        if store._index_map is not None:
            idx = store._index_map[idx]
        # dedup preserving FIRST-SEEN (scan output) order — tie-breaking in
        # the rerank follows this slot order, so it must match what a
        # sequential collect() would feed exact_rerank
        _, first = np.unique(idx, return_index=True)
        cand = idx[np.sort(first)]
        if cand.size == 0:
            return None
        cands.append(cand)
    M = max(len(c) for c in cands)
    M = max(8, 1 << (M - 1).bit_length())  # few distinct compiled shapes
    # SORTED union: np.unique + searchsorted beat a Python dict by ~100x at
    # serving-sized unions, and an ascending id order makes the user's
    # fetch a locality-friendly gather. Union order is free to choose —
    # per-pending tie-breaking follows the slot order inside each cand
    # (scan output order), which is untouched.
    ids_arr = np.unique(np.concatenate(cands))
    # pad the union to a quarter-octave bucket (repeat a real id): a
    # handful of compiled shapes per octave, but at most 25% of the
    # fetch + h2d transfer wasted on padding (a pure power of two wastes
    # up to 100% — that is ~60 MB of extra f32 rows per 16x256-query
    # resolve at k'=100)
    u_pad = _pad_bucket(len(ids_arr))
    ids_padded = np.full(u_pad, ids_arr[0], dtype=np.int64)
    ids_padded[: len(ids_arr)] = ids_arr
    vecs = store._rerank_fetch(ids_padded)
    P = len(plist)
    pos = np.zeros((P, M), dtype=np.int32)
    valid_m = np.zeros((P, M), dtype=bool)
    for j, cand in enumerate(cands):
        pos[j, : len(cand)] = np.searchsorted(ids_arr, cand).astype(np.int32)
        valid_m[j, : len(cand)] = True
    qs = tuple(jnp.asarray(p._queries, dtype=jnp.float32) for p in plist)
    thr, cmp = (
        (0.0, None) if plan0._vec_filter is None else plan0._vec_filter
    )
    b = qs[0].shape[0]
    raw = _call_rerank_program(
        (
            qs,
            jnp.asarray(vecs),
            jnp.asarray(pos),
            jnp.asarray(valid_m),
            jnp.float32(thr),
        ),
        dict(
            metric=metric,
            k=min(k_final, b * M),
            take_min=take_min,
            cmp=cmp,
        ),
    )
    return plist, cands, raw


def _device_rerank_finish(plist, cands, fetched) -> None:
    """Assign the fetched rerank outputs back onto each pending."""
    m_idx, out_s, out_ok = fetched
    for p, cand, mi, so, oo in zip(plist, cands, m_idx, out_s, out_ok):
        oo = np.asarray(oo, dtype=bool)
        rows_orig = cand[np.asarray(mi)[oo]]
        p._device_rerank = (
            frozenset(cand.tolist()),
            rows_orig.tolist(),
            np.asarray(so)[oo].tolist(),
        )


def _device_rerank_group(store: "MetaStore", plist) -> bool:
    """Dispatch + fetch one group synchronously (the single-pending path in
    result(); resolve() pipelines dispatches itself). False -> host path."""
    import jax

    state = _device_rerank_dispatch(store, plist)
    if state is None:
        return False
    plist, cands, raw = state
    _device_rerank_finish(plist, cands, jax.device_get(raw))
    return True


def _jit_mask_program():
    import jax

    @partial(jax.jit, static_argnames=("plan_static", "n_pad"))
    def mask_program(cols, chunk_lens, plan_params, *, plan_static, n_pad):
        """Standalone pruning program for the windowed take-all path: the
        row mask stays on device (consumed window by window) and the stats
        come back as two scalars."""
        n_chunks = chunk_lens.shape[0]
        cmask = predicate.chunk_mask(plan_static, plan_params, cols, n_chunks)
        ev = cmask.sum(dtype=np.int32)
        re_ = (chunk_lens * cmask).sum(dtype=np.int32)
        rmask = predicate.row_mask(plan_static, plan_params, cols, n_pad)
        return rmask, ev, re_

    return mask_program


_mask_program = _jit_mask_program()


# ---------------------------------------------------------------------------
# MetaStore + builder
# ---------------------------------------------------------------------------


class MetaStoreBuilder:
    """Builder (reference meta.rs:62-110, 113-148)."""

    def __init__(self, schema: Dict[str, DataType], columns: Dict[str, Column]):
        self._schema = dict(schema)
        self._columns = dict(columns)
        self._vectors = None
        self._vectors_n = None
        self._chunk_size = 1024
        self._bloom: Tuple[str, float] = ("fpr", 0.01)
        self._sort_by = None
        self._z_order = None
        self._storage_dtype = "float32"
        self._rerank = None

    def with_rerank_source(
        self, fetch_vectors=None, keep_host_f32: bool = False
    ) -> "MetaStoreBuilder":
        """Attach a source of TRUE f32 vectors for exact re-ranking.

        The bfloat16/int8 storage knobs trade exactness for HBM; recall is
        recovered by ``.take(k, rerank_from=k_wide)`` on the query plan: the
        quantized scan returns ``k_wide`` candidates, the true rows are
        fetched from this source, and the final top-k is exact-f32-scored
        host-side (the reference's exactness contract,
        vec_compute.rs:77-294, restored on top of approximate storage).

        Exactly one of:
        - ``fetch_vectors(indices) -> [m, d] float32`` — called with
          ORIGINAL ingestion-order row ids (host store, disk, regeneration).
          May return a device ``jax.Array``: ``resolve()``'s batched device
          rerank then scores candidates without ever fetching them to the
          host;
        - ``keep_host_f32=True`` — keep the ingested f32 rows host-side
          (costs n*d*4 bytes of host RAM; unavailable for pre-built
          DeviceVecs, whose f32 form never existed).
        """
        if (fetch_vectors is None) == (not keep_host_f32):
            raise OttersError(
                "with_rerank_source takes exactly one of fetch_vectors / "
                "keep_host_f32=True"
            )
        self._rerank = (fetch_vectors, bool(keep_host_f32))
        return self

    def with_vectors(self, vectors, n_rows=None) -> "MetaStoreBuilder":
        """Supply vectors: a [n, d] numpy array / list of rows, or a
        device-resident jax.Array (zero host roundtrip). For huge device
        arrays, pre-pad to ``scoring.pad_rows(n)`` rows and pass the logical
        row count via ``n_rows`` — ingestion is then zero-copy (no duplicate
        HBM buffer during build). A pre-built ``scoring.DeviceVecs`` (e.g.
        from ``scoring.materialize_int8_slabs`` for stores too large to ever
        exist in f32) is adopted as-is; ``n_rows`` is required then."""
        self._vectors = vectors
        self._vectors_n = n_rows
        return self

    def with_chunk_size(self, chunk_size: int) -> "MetaStoreBuilder":
        self._chunk_size = max(1, int(chunk_size))
        return self

    def with_sort_by(self, column: str, descending: bool = False) -> "MetaStoreBuilder":
        """Cluster rows by a column before chunking (the reference's
        roadmap "Z-ordering" item): zonemap pruning only bites when rows
        are clustered by common filter columns. Result indices still refer
        to the ORIGINAL ingestion order."""
        self._sort_by = (column, bool(descending))
        return self

    def with_z_order(self, columns) -> "MetaStoreBuilder":
        """Cluster rows along a Z-order (Morton) curve over several columns
        before chunking (the reference's roadmap item verbatim): every
        listed column gets locality, so zonemaps prune filters on ANY of
        them — where ``with_sort_by`` only helps its one column. Result
        indices still refer to the ORIGINAL ingestion order. Mutually
        exclusive with ``with_sort_by``; 1-8 columns."""
        if isinstance(columns, str):
            columns = [columns]  # a lone name, not its characters
        names = [str(c) for c in columns]
        if not 1 <= len(names) <= 8:
            raise OttersError("with_z_order takes between 1 and 8 columns")
        if len(set(names)) != len(names):
            raise OttersError("with_z_order columns must be distinct")
        self._z_order = tuple(names)
        return self

    def with_storage_dtype(self, dtype: str) -> "MetaStoreBuilder":
        """HBM storage dtype for vectors.

        "float32"  (default): exact.
        "bfloat16": half the HBM; scores computed in f32 from bf16-rounded
                    vectors — rankings may differ at the ulp.
        "int8"    : quarter the HBM; per-row symmetric quantization,
                    Cosine-only and approximate (measure with
                    otters_tpu.evaluate.recall_at_k)."""
        if dtype not in ("float32", "bfloat16", "int8"):
            raise OttersError(f"unsupported storage dtype {dtype!r}")
        self._storage_dtype = dtype
        return self

    def with_bloom_fpr(self, fpr: float) -> "MetaStoreBuilder":
        f = float(fpr)
        f = min(max(f, 1e-2), 0.5) if np.isfinite(f) else 0.01
        self._bloom = ("fpr", f)
        return self

    def with_bloom_bits(self, bits: int) -> "MetaStoreBuilder":
        self._bloom = ("bits", max(64, int(bits)))
        return self

    def with_column(self, name: str, column: Column) -> "MetaStoreBuilder":
        if name not in self._schema:
            raise OttersError(f"unknown column '{name}' not present in schema")
        if self._schema[name] is not column.dtype:
            raise OttersError(
                f"dtype mismatch for column '{name}': schema "
                f"{self._schema[name]!r}, got {column.dtype!r}"
            )
        self._columns[name] = column
        return self

    def with_columns(self, columns: List[Tuple[str, Column]]) -> "MetaStoreBuilder":
        for name, c in columns:
            self.with_column(name, c)
        return self

    def build_sharded(self, mesh) -> "MetaStore":
        """Build a ShardedMetaStore by DIRECT sharded ingest over ``mesh``:
        every array is placed straight into per-shard HBM, so capacity
        scales with the mesh (the store never exists on one device). See
        otters_tpu.parallel.meta_sharded.build_sharded."""
        from .parallel.meta_sharded import build_sharded

        return build_sharded(self, mesh)

    def build(self) -> "MetaStore":
        if self._vectors is None:
            raise OttersError("vectors must be provided to build MetaStore")
        vectors = self._vectors
        import jax

        pre_built = isinstance(vectors, scoring.DeviceVecs)
        if pre_built:
            if self._vectors_n is None:
                raise OttersError(
                    "with_vectors(DeviceVecs) requires n_rows (the logical "
                    "row count; the buffers are padded)"
                )
            if self._sort_by is not None or self._z_order is not None:
                raise OttersError(
                    "with_sort_by / with_z_order are not supported for "
                    "pre-built DeviceVecs (generate the slabs in sorted "
                    "order instead)"
                )
            n_rows = int(self._vectors_n)
            dim = int(vectors.vectors.shape[1])
            import jax.numpy as _j8

            if vectors.vectors.dtype == _j8.int8:
                self._storage_dtype = "int8"
            elif vectors.vectors.dtype == _j8.bfloat16:
                self._storage_dtype = "bfloat16"
        from_device = (not pre_built) and isinstance(vectors, jax.Array)
        if pre_built:
            pass  # n_rows / dim set above; buffers adopted in the ingest step
        elif from_device:
            # TPU-native ingestion: vectors already in HBM (generated or
            # streamed on device); no host round-trip.
            n_rows, dim = int(vectors.shape[0]), int(vectors.shape[1])
            if self._vectors_n is not None:
                n_rows = int(self._vectors_n)  # pre-padded zero-copy ingest
        elif not isinstance(vectors, np.ndarray):
            vecs_list = [np.asarray(v, dtype=np.float32) for v in vectors]
            n_rows = len(vecs_list)
            dim = vecs_list[0].shape[0] if n_rows else 0
            for i, v in enumerate(vecs_list):
                if v.shape[0] != dim:
                    raise OttersError(
                        f"vector at index {i} has dim {v.shape[0]}, expected {dim}"
                    )
            vectors = (
                np.stack(vecs_list, axis=0)
                if n_rows
                else np.zeros((0, dim), np.float32)
            )
        else:
            vectors = vectors.astype(np.float32, copy=False)
            n_rows, dim = vectors.shape if vectors.ndim == 2 else (len(vectors), 0)
        if dim == 0 and n_rows > 0:
            raise OttersError("vector dimension cannot be zero")

        for name in self._schema:
            colo = self._columns.get(name)
            if colo is None:
                raise OttersError(f"missing column '{name}' in builder columns")
            if len(colo) != n_rows:
                raise OttersError(
                    f"column '{name}' length {len(colo)} does not match vectors "
                    f"length {n_rows}"
                )

        rerank_fetch = None
        if self._rerank is not None:
            fetch, keep = self._rerank
            if keep:
                if pre_built:
                    raise OttersError(
                        "keep_host_f32 is unavailable for pre-built "
                        "DeviceVecs (their f32 form never existed); pass "
                        "fetch_vectors instead"
                    )
                # snapshot BEFORE any sort/z-order permutation: rerank ids
                # are ORIGINAL ingestion-order row ids
                host_f32 = np.asarray(vectors, dtype=np.float32)[:n_rows]

                def rerank_fetch(ids, _hf=host_f32):
                    return _hf[np.asarray(ids, dtype=np.int64)]

            else:
                rerank_fetch = fetch

        build_start = time.perf_counter()

        index_map = None
        orig_columns = None
        perm = None
        if self._sort_by is not None and self._z_order is not None:
            raise OttersError(
                "with_sort_by and with_z_order are mutually exclusive"
            )
        if self._sort_by is not None:
            sort_col, desc = self._sort_by
            if sort_col not in self._schema:
                raise OttersError(
                    f"unknown column '{sort_col}' not present in schema"
                )
            perm = _sort_permutation(self._columns[sort_col], n_rows, desc)
        elif self._z_order is not None:
            for nm in self._z_order:
                if nm not in self._schema:
                    raise OttersError(
                        f"unknown column '{nm}' not present in schema"
                    )
            perm = _zorder_permutation(self._columns, self._z_order, n_rows)
        if perm is not None:
            orig_columns = self._columns
            self._columns = {
                name: _permute_column(c, perm)
                for name, c in self._columns.items()
            }
            if from_device:
                import jax.numpy as _j

                perm_full = np.concatenate(
                    [perm, np.arange(n_rows, int(vectors.shape[0]))]
                )
                vectors = _j.take(vectors, _j.asarray(perm_full), axis=0)
            else:
                vectors = vectors[perm]
            index_map = perm  # new position -> original row id

        # vector ingest: host -> HBM + on-device norm computation
        ingest_start = time.perf_counter()
        import jax.numpy as _jnp

        _dtype = {
            "bfloat16": _jnp.bfloat16,
            "int8": _jnp.int8,
            "float32": _jnp.float32,
        }[self._storage_dtype]
        if pre_built:
            dv = vectors  # adopted as-is (e.g. materialize_int8_slabs)
        elif from_device:
            dv = scoring.materialize_from_device(
                vectors, n_valid=n_rows, dtype=_dtype
            )
        else:
            dv = scoring.materialize(vectors, dtype=_dtype)
        jax.block_until_ready(dv)
        ingest_dur = time.perf_counter() - ingest_start

        n_pad = dv.vectors.shape[0]
        c = self._chunk_size
        n_chunks = -(-n_rows // c) if n_rows else 0

        zstart = time.perf_counter()
        device_cols: Dict[str, Dict] = {}
        col_reprs: Dict[str, str] = {}
        bloom_params: Dict[str, bloom_ops.BloomParams] = {}
        for name in self._schema:
            rep, devcol, aux = _build_device_column(
                self._columns[name], n_rows, n_pad, c, n_chunks, self._bloom
            )
            device_cols[name] = devcol
            col_reprs[name] = rep
            if aux is not None:
                bloom_params[name] = aux
        chunk_lens = np.minimum(
            np.full(n_chunks, c, dtype=np.int32),
            n_rows - np.arange(n_chunks, dtype=np.int64) * c,
        ).astype(np.int32)
        if device_cols:
            jax.block_until_ready(device_cols)  # honest zonemap-phase timing
        zonemap_dur = time.perf_counter() - zstart

        store = MetaStore(self._schema)
        store._columns = self._columns
        store._chunk_size = c
        store._n_rows = n_rows
        store._dim = dim
        store._n_chunks = n_chunks
        store._dv = dv
        store._device_cols = device_cols
        store._col_reprs = col_reprs
        store._bloom_params = bloom_params
        import jax.numpy as jnp

        store._chunk_lens = jnp.asarray(chunk_lens)
        store._bloom_config = self._bloom
        store._index_map = index_map
        store._orig_columns = orig_columns
        store._sort_by = self._sort_by
        store._z_order = self._z_order
        store._storage_dtype = self._storage_dtype
        store._rerank_fetch = rerank_fetch
        store._rerank_config = self._rerank
        if self._rerank is not None and self._rerank[1]:
            store._rerank_host = host_f32  # direct ref: save/append reuse it
        store._build_stats = MetaBuildStats(
            n_rows=n_rows,
            dim=dim,
            n_chunks=n_chunks,
            vectors_ingest_duration=ingest_dur,
            zonemap_build_duration=zonemap_dur,
            build_total_duration=time.perf_counter() - build_start,
        )
        return store


class MetaStore:
    """Device-resident vector+metadata store (reference meta.rs:49-577)."""

    # the windowed take-all path streams per-window scores host-side; the
    # sharded store runs its own SPMD program instead (meta_sharded.py)
    _supports_windowed = True

    def __init__(self, schema):
        if isinstance(schema, dict):
            self._schema = dict(schema)
        else:
            self._schema = {name: dt for name, dt in schema}
        self._columns = {
            name: Column(name, dt) for name, dt in self._schema.items()
        }
        self._chunk_size = 1024
        self._n_rows = 0
        self._dim = 0
        self._n_chunks = 0
        self._dv: Optional[scoring.DeviceVecs] = None
        self._device_cols: Dict[str, Dict] = {}
        self._col_reprs: Dict[str, str] = {}
        self._bloom_params: Dict[str, bloom_ops.BloomParams] = {}
        self._chunk_lens = None
        self._index_map = None  # set when built with with_sort_by/with_z_order
        self._z_order = None
        self._orig_columns = None
        self._sort_by = None
        self._storage_dtype = "float32"
        self._n_deleted = 0
        self._rerank_fetch = None  # set via builder.with_rerank_source
        self._rerank_config = None  # the builder's (fetch, keep) tuple
        self._rerank_host = None  # keep_host_f32 snapshot (original order)
        # per-(filter, vec_filter, k) widths that recently certified — see
        # MetaQueryPlan take()/result(); LRU so literal churn can't grow it
        self._cert_kwide_hint = _LruCache(64)
        # LRU caches (bounded; a long-lived server cycling more distinct
        # plans/literals than the cap evicts oldest-used instead of
        # silently thrashing invisible recompute — see cache_stats())
        self._plan_cache: Dict = _LruCache(256)
        self._aot_key_cache: Dict = _LruCache(512)
        self._hostmask_cache: Dict = _LruCache(128)
        self._str_arena_cache: Dict = {}
        self._bloom_config = ("fpr", 0.01)
        self._build_stats: Optional[MetaBuildStats] = None
        self._last_stats: Optional[MetaQueryStats] = None
        self.precision: str = "highest"

    # -- constructors ------------------------------------------------------
    @staticmethod
    def new(schema) -> "MetaStore":
        return MetaStore(schema)

    @staticmethod
    def from_columns(columns: List[Column]) -> MetaStoreBuilder:
        schema = {c.name: c.dtype for c in columns}
        return MetaStoreBuilder(schema, {c.name: c for c in columns})

    @staticmethod
    def from_schema(schema) -> MetaStoreBuilder:
        schema_map = {name: dt for name, dt in schema}
        cols = {name: Column(name, dt) for name, dt in schema_map.items()}
        return MetaStoreBuilder(schema_map, cols)

    # -- accessors ----------------------------------------------------------
    def schema(self) -> Dict[str, DataType]:
        return self._schema

    def columns(self) -> Dict[str, Column]:
        return self._columns

    def n_chunks(self) -> int:
        return self._n_chunks

    def chunk_size(self) -> int:
        return self._chunk_size

    @property
    def n_rows(self) -> int:
        return self._n_rows

    def __len__(self) -> int:
        return self._n_rows - self._n_deleted

    def last_query_stats(self) -> Optional[MetaQueryStats]:
        return self._last_stats

    def cache_stats(self) -> Dict[str, Dict[str, int]]:
        """Size/hit/miss/eviction counters for the per-store LRU caches
        (plan lowering, AOT signature memo, hostmask string predicates).
        A growing ``evictions`` count on a steady workload means the
        working set exceeds the cap and dispatches are paying recompute."""
        return {
            name: {
                "size": len(c),
                "capacity": c.cap,
                "hits": c.hits,
                "misses": c.misses,
                "evictions": c.evictions,
            }
            for name, c in (
                ("plan", self._plan_cache),
                ("aot_key", self._aot_key_cache),
                ("hostmask", self._hostmask_cache),
            )
        }

    def build_stats(self) -> Optional[MetaBuildStats]:
        return self._build_stats

    def cert_hints(self) -> Dict[str, int]:
        """Certificate scan-width hints that certified for this store, keyed
        per plan shape (filter, vec_filter, k). Persisted with the store by
        ``io.save_meta`` so a fresh process skips the widen discovery (each
        failed width costs a full wasted scan + rerank)."""
        return dict(self._cert_kwide_hint)

    def _restore_cert_hints(self, hints) -> None:
        for key, width in (hints or {}).items():
            self._cert_kwide_hint[str(key)] = int(width)

    # -- mutability (reference roadmap: "add/remove rows after build") -------
    def delete_rows(self, indices) -> None:
        """Tombstone rows in place: deleted rows are never returned.

        O(deleted) device update; zonemaps stay conservative (a chunk whose
        only matching rows were deleted may still be evaluated, but its rows
        are excluded by the validity mask). ``append`` compacts tombstones.
        """
        import jax.numpy as jnp

        idx = np.unique(np.asarray(list(indices), dtype=np.int64))
        if idx.size == 0:
            return
        if idx.min() < 0 or idx.max() >= self._n_rows:
            raise OttersError(
                f"delete index out of range 0..{self._n_rows - 1}"
            )
        if self._index_map is not None:
            inv = np.empty(self._n_rows, dtype=np.int64)
            inv[self._index_map] = np.arange(self._n_rows)
            idx = inv[idx]  # original ids -> current positions
        valid = self._host_valid().copy()
        newly = int(valid[idx].sum())
        valid[idx] = False
        self._dv = self._dv._replace(valid=self._place_valid(valid))
        self._n_deleted += newly

    def _host_valid(self) -> np.ndarray:
        """[n_pad] validity mask on the host. On multi-process meshes the
        mask spans non-addressable devices; the sharded override gathers it
        with a replicating collective (every process must call this
        together — delete/append/save are collective there)."""
        return self._host_gather(self._dv.valid)

    def _host_gather(self, arr) -> np.ndarray:
        """Device array -> host. Sharded override replicate-gathers
        non-addressable arrays (collective)."""
        return np.asarray(arr)

    def _place_resid(self, resid_host: np.ndarray):
        """Place an [n_pad] residual array back on device and re-derive
        bins/max. Sharded override keeps the row sharding."""
        import jax.numpy as jnp

        r = jnp.where(self._dv.valid, jnp.asarray(resid_host), 0.0)
        rbin, rmax = scoring.finalize_resid(r)
        self._dv = self._dv._replace(resid=r, resid_bin=rbin, resid_max=rmax)

    def _carry_resid_forward(self, new: "MetaStore") -> None:
        """Quantized append without keep_host_f32: the rebuild re-quantizes
        the CODES (int8: idempotent; bf16: exact), so the new store's
        recomputed residuals collapse toward 0 — sound versus the codes,
        but NOT the original-source bounds the certificate/persistence
        machinery documents. Surviving rows therefore keep their ORIGINAL
        residuals (always >= the recomputed ones); appended rows keep the
        rebuild's fresh true-source values."""
        if (
            self._storage_dtype not in ("int8", "bfloat16")
            or self._rerank_config is not None
            or self._dv is None
            or self._dv.resid is None
            or new._dv is None
            or new._dv.resid is None
        ):
            return
        n = self._n_rows
        old_resid = self._host_gather(self._dv.resid)[:n]
        valid = self._host_valid()[:n]
        if self._index_map is not None:
            inv = np.empty(n, dtype=np.int64)
            inv[self._index_map] = np.arange(n)
            old_resid = old_resid[inv]  # device -> original order
            valid = valid[inv]
        carried = old_resid[np.flatnonzero(valid)]
        n_keep = len(carried)
        resid_new = new._host_gather(new._dv.resid).copy()
        if new._index_map is not None:
            orig = np.asarray(new._index_map, dtype=np.int64)
            sel = orig < n_keep
            dev_pos = np.flatnonzero(sel)
            resid_new[dev_pos] = carried[orig[dev_pos]]
        else:
            resid_new[:n_keep] = carried
        new._place_resid(resid_new)

    def _place_valid(self, valid: np.ndarray):
        """Place the updated [n_pad] validity mask on device. Sharded
        subclasses override to keep the mask on its row sharding."""
        import jax.numpy as jnp

        return jnp.asarray(valid)

    def append(self, vectors, column_values: Dict[str, list]) -> "MetaStore":
        """Return a NEW store with rows appended (tombstones compacted).

        Rebuilds chunking/zonemaps/Bloom with the same configuration; row
        ids in the new store are fresh (0..n-1 over surviving + new rows).
        A ``keep_host_f32`` rerank source carries over (the true-f32
        snapshot is re-sourced, NOT the quantized storage, so the exactness
        contract survives int8/bf16 appends); a ``fetch_vectors`` source
        cannot — ids change under compaction and the fetch knows nothing of
        the new rows — so append raises then (rebuild with an updated
        fetch instead).
        """
        new = self._append_builder(vectors, column_values).build()
        new.precision = self.precision
        self._carry_resid_forward(new)
        return new

    def _append_prep(self, vectors, column_values):
        """Shared append validation + column assembly (host side):
        -> (keep, inv_order, new_vecs, cols, cfg). ``keep`` holds the
        surviving row positions in ORIGINAL ingestion order."""
        n = self._n_rows
        valid = self._host_valid()[:n]
        src_cols = (
            self._orig_columns if self._orig_columns is not None else self._columns
        )
        inv_order = None
        if self._index_map is not None:
            # device arrays are in sorted order; restore original order
            inv_order = np.empty(n, dtype=np.int64)
            inv_order[self._index_map] = np.arange(n)
            valid = valid[inv_order]
        cfg = self._rerank_config
        if cfg is not None and not cfg[1]:
            raise OttersError(
                "append on a store with a fetch_vectors rerank source: row "
                "ids change under compaction and the fetch cannot describe "
                "the appended rows; rebuild via MetaStore.from_columns(...)"
                ".with_rerank_source(fetch) with an updated fetch"
            )
        keep = np.flatnonzero(valid)
        new_vecs = np.asarray(vectors, dtype=np.float32)
        if new_vecs.ndim != 2 or (n and new_vecs.shape[1] != self._dim):
            raise OttersError(
                f"appended vectors must be [m, {self._dim}]"
            )
        m = new_vecs.shape[0]
        cols = []
        for name, dt in self._schema.items():
            src = src_cols[name]
            vals_new = column_values.get(name)
            if vals_new is None or len(vals_new) != m:
                raise OttersError(
                    f"column '{name}' needs {m} appended values"
                )
            kept = _permute_column(src, keep)
            for v in vals_new:
                kept.push(v)
            cols.append(kept)
        return keep, inv_order, new_vecs, cols, cfg

    def _append_configured_builder(self, cols) -> "MetaStoreBuilder":
        """A builder carrying this store's configuration (no vectors yet)."""
        builder = MetaStore.from_columns(cols).with_chunk_size(
            self._chunk_size
        )
        kind, val = self._bloom_config
        builder = (
            builder.with_bloom_fpr(val) if kind == "fpr"
            else builder.with_bloom_bits(int(val))
        )
        if self._sort_by is not None:
            builder = builder.with_sort_by(self._sort_by[0], self._sort_by[1])
        if self._z_order is not None:
            builder = builder.with_z_order(self._z_order)
        return builder.with_storage_dtype(self._storage_dtype)

    def _append_builder(self, vectors, column_values) -> "MetaStoreBuilder":
        """Shared append logic: a configured builder over surviving + new
        rows in original ingestion order (tombstones compacted). ``build()``
        for a single-device result; ``build_sharded(mesh)`` for a sharded
        one (ShardedMetaStore.append overrides with a streaming rebuild
        for unsorted stores).

        Quantized stores without ``keep_host_f32`` re-source the int8
        CODES as the rebuild input: re-quantizing codes is IDEMPOTENT
        (each row's max |code| is exactly 127 by construction, so the
        requantization scale is 1 and every code rounds to itself) —
        surviving rows' codes are bit-identical across append generations
        (pinned by tests/test_append_streaming.py)."""
        n = self._n_rows
        keep, inv_order, new_vecs, cols, cfg = self._append_prep(
            vectors, column_values
        )
        if cfg is not None:
            # keep_host_f32: re-source the TRUE f32 rows (original order)
            # so the rebuilt snapshot is not the quantized storage; use the
            # direct snapshot ref when present (no n x d transient copy)
            old_vecs = (
                self._rerank_host[:n]
                if self._rerank_host is not None
                else np.asarray(
                    self._rerank_fetch(np.arange(n, dtype=np.int64)),
                    dtype=np.float32,
                )
            )
        else:
            old_vecs = np.asarray(self._dv.vectors)[:n]
            if inv_order is not None:
                old_vecs = old_vecs[inv_order]
        builder = self._append_configured_builder(cols).with_vectors(
            np.concatenate(
                [old_vecs[keep].astype(np.float32), new_vecs], axis=0
            )
        )
        if cfg is not None:
            builder = builder.with_rerank_source(keep_host_f32=True)
        return builder

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        """Serialize to disk (otters_tpu.io; .npz, no pickling)."""
        from . import io

        io.save_meta(self, path)

    @staticmethod
    def load(path: str, mesh=None) -> "MetaStore":
        """Load a saved store; with ``mesh``, rebuild it by direct sharded
        ingest onto that mesh (never staged on a single device)."""
        from . import io

        return io.load_meta(path, mesh=mesh)

    # -- display -------------------------------------------------------------
    def head(self) -> None:
        self.head_n(5)

    def head_n(self, n: int) -> None:
        print(metastore_head(self, n))

    def print_build_stats(self) -> None:
        if self._build_stats is not None:
            print(format_build_stats(self._build_stats))
        else:
            print("(no build stats)")

    def print_last_query_stats(self) -> None:
        if self._last_stats is not None:
            print(format_query_stats(self._last_stats))
        else:
            print("(no query stats)")

    def print_last_stats(self) -> None:
        self.print_build_stats()
        self.print_last_query_stats()

    def _column_arena(self, name: str):
        """Packed UTF-8 (data, offsets) arena for a string column, built
        once and cached — every extended-predicate literal on the column
        shares it (packing 10M strings costs more than scanning them)."""
        cached = self._str_arena_cache.get(name)
        if cached is None:
            from .native import pack_utf8_arena

            n = self._n_rows
            vals = self.columns()[name].values()
            cached = pack_utf8_arena(
                [v if isinstance(v, str) else "" for v in vals[:n]]
            )
            self._str_arena_cache[name] = cached
        return cached

    def _hostmask_for(self, leaf):
        """Row/chunk masks for extended string predicates (contains /
        starts_with / ends_with). Strings live host-side only, so these are
        evaluated once on the host, cached per (column, op, literal), and
        fed to the device program as mask tensors — including an exact
        per-chunk any() so pruning still works."""
        import jax.numpy as jnp

        key = (leaf.column, leaf.cmp, leaf.rhs)
        cached = self._hostmask_cache.get(key)
        if cached is not None:
            return cached
        colo = self.columns()[leaf.column]
        n = self._n_rows
        nulls = np.asarray(colo.null_mask(), dtype=bool)[:n]
        rhs = leaf.rhs
        negated = leaf.cmp in NEGATED_STRING_OPS
        base_cmp = NEGATED_CMP[leaf.cmp] if negated else leaf.cmp
        _modes = {
            CmpOp.Contains: "contains",
            CmpOp.StartsWith: "starts_with",
            CmpOp.EndsWith: "ends_with",
        }
        if base_cmp in _modes:
            # native C++ arena scan (OpenMP; memchr/memcmp inner loops) or
            # the vectorized numpy fallback — the reference's tight-loop
            # string rows, meta_compute.rs:291-318. The arena is packed
            # once per column and shared across literals and with fuzzy.
            from .ops import strscan

            data, offsets = self._column_arena(leaf.column)
            m = strscan.substr_mask(data, offsets, rhs, _modes[base_cmp])
            m = np.asarray(m, dtype=bool) & ~nulls
        else:  # Fuzzy: one vectorized (native C++ when available) pass
            from .ops import strmatch

            pattern, max_dist = rhs
            m = strmatch.fuzzy_mask(
                colo.values()[:n], nulls, pattern, max_dist
            )
        if negated:
            # De Morgan leaves keep the nulls-excluded convention
            m = ~np.asarray(m, dtype=bool) & ~nulls
        n_pad = self._dv.vectors.shape[0]
        row = np.zeros(n_pad, dtype=bool)
        row[:n] = m
        offs = _chunk_offsets(n, self._chunk_size)
        chunk_any = (
            np.logical_or.reduceat(m, offs) if n else np.zeros(0, bool)
        )
        # pad to the store's chunk-array length (sharded stores re-pad the
        # chunk axis so it splits evenly across shards)
        n_chunks_dev = int(self._chunk_lens.shape[0])
        if n_chunks_dev != len(chunk_any):
            pad = np.zeros(n_chunks_dev, dtype=bool)
            pad[: len(chunk_any)] = chunk_any
            chunk_any = pad
        cached = (jnp.asarray(row), jnp.asarray(chunk_any))
        self._hostmask_cache[key] = cached
        return cached

    # -- windowed take-all hook (overridden by ShardedMetaStore) -------------
    def _windowed_collect(
        self, cols_sub, queries, plan_params, plan_static, k_eff,
        metric, take_min, thr, cmp,
    ):
        """Single-device take-all: device pruning + windowed score
        streaming. -> (rows, scores, valid, check, evaluated, rows_eval)."""
        import jax

        dv = self._dv
        n_pad = dv.vectors.shape[0]
        if plan_static:
            rmask, ev, re_ = _mask_program(
                cols_sub, self._chunk_lens, plan_params,
                plan_static=plan_static, n_pad=n_pad,
            )
            ev, re_ = jax.device_get((ev, re_))
        else:
            rmask = None
            ev = np.int32(self.n_chunks())
            re_ = np.int32(self.n_rows)
        rows, scores, valid = scoring.collect_all(
            dv,
            queries,
            metric,
            k_eff,
            take_min=take_min,
            cmp=cmp,
            thr=thr,
            row_mask=rmask,
            prec=self.precision,
        )
        return rows, scores, valid, np.bool_(True), np.float32(-np.inf), ev, re_

    # -- device program hook (overridden by ShardedMetaStore) ----------------
    def _prepare_program(
        self, cols_sub, queries, plan_params, thr, plan_static, metric, k,
        take_min, cmp, strict=False, certify=False,
    ):
        """-> (compiled_executable, dynamic_args). Routed through the AOT
        cache (otters_tpu.aot): the first compile per signature persists the
        serialized executable so later PROCESSES skip the minutes-long
        Mosaic/XLA compile entirely."""
        import jax.numpy as jnp

        from . import aot

        dv = self._dv
        n_pad = dv.vectors.shape[0]
        b = queries.shape[0]
        k_eff = min(k, b * n_pad)
        if dv.vectors.dtype == jnp.int8 and metric is not Metric.Cosine:
            raise OttersError(
                "int8 quantized storage supports the Cosine metric only"
            )
        tile = scoring.choose_mode(n_pad, b, k_eff)
        fast = False
        if (
            metric in VPU_METRICS
            and plan_static
            and n_pad % scoring.SCAN_TILE == 0
            and n_pad >= 4 * scoring.SCAN_TILE
            and k_eff <= scoring.SCAN_K_MAX
        ):
            # filtered VPU-metric query at scale: skip pruned tiles (the
            # dense paths would still scan every row; meta.rs:647-691
            # prunes independent of the metric)
            tile = "scan_pruned"
        if tile == "panel" and metric not in VPU_METRICS:
            from .ops import pallas_topk as pk

            if pk.pallas_ok(n_pad, dv.vectors.shape[1], b, k_eff):
                tile = "pallas"
                fast = (
                    not strict
                    and dv.vectors.dtype != jnp.int8
                    and pk.fast_ok(metric, take_min, cmp, k_eff, self.precision)
                )
        certify = (
            certify
            and not strict
            and self._certify_supported(metric, take_min, cmp)
            and tile != "scan_pruned"  # its program returns no bound
            and (tile != "pallas" or dv.resid_bin is not None)
        )
        # certify and fast are disjoint kernel modes; certify wins (the
        # stronger guarantee, and its mixed scan already runs at bf16 rate)
        fast = fast and not certify
        static_kwargs = dict(
            plan_static=plan_static,
            metric=metric,
            k=k_eff,
            take_min=take_min,
            cmp=cmp,
            prec=self.precision,
            tile=tile,
            chunk_size=self._chunk_size,
            fast=fast,
            certify=certify,
        )
        args = (
            dv,
            cols_sub,
            self._chunk_lens,
            jnp.asarray(queries),
            plan_params,
            jnp.float32(thr),
        )
        import os

        if os.environ.get("OTTERS_DISABLE_AOT"):
            return partial(_meta_query_program, **static_kwargs), args
        # the signature is invariant per (plan, batch size, knobs) for a
        # given store; memoize it so steady-state dispatch skips the pytree
        # flatten + sha256 on every query
        memo = (plan_static, queries.shape[0], str(queries.dtype), k_eff,
                metric, take_min, cmp, self.precision, tile, fast, certify)
        key = self._aot_key_cache.get(memo)
        if key is None:
            key = aot.signature(
                "meta_query",
                repr(sorted(static_kwargs.items(), key=str)),
                args,
                {},
            )
            self._aot_key_cache[memo] = key
        if aot.jit_is_ready(key):
            # steady state: jit's C++ dispatch pipelines ~4x better than the
            # Compiled call path
            return partial(_meta_query_program, **static_kwargs), args
        compiled = aot.lookup(key) or aot.load_or_compile(
            key, _meta_query_program, args, static_kwargs
        )
        # serve this query from the AOT executable; warm the jit cache for
        # the same signature in the background and switch when ready
        aot.ensure_jit_warm(key, _meta_query_program, args, static_kwargs)
        return compiled, args

    def _run_query_program(
        self, cols_sub, queries, plan_params, thr, plan_static, metric, k,
        take_min, cmp, strict=False, certify=False,
    ):
        compiled, args = self._prepare_program(
            cols_sub, queries, plan_params, thr, plan_static, metric, k,
            take_min, cmp, strict=strict, certify=certify,
        )
        return compiled(*args)

    def _certify_supported(self, metric, take_min, cmp) -> bool:
        """Can the exactness certificate cover this plan shape?

        int8 storage (cosine-only scoring): Cosine + take-max + no/Gt/Gte
        filter. bfloat16 storage: Cosine and DotProduct (take-max,
        no/Gt/Gte) AND Euclidean (take-min, no/Lt/Lte) — the generalized
        residual fold (ops/scoring.cert_query_coeffs) covers all three,
        matching the reference's exactness across metrics
        (/root/reference/src/vec_compute.rs:9-54). f32 storage is exact by
        construction and needs no certificate."""
        import jax.numpy as jnp

        dv = self._dv
        if dv.resid is None:
            return False
        if dv.vectors.dtype == jnp.int8:
            return (
                metric is Metric.Cosine
                and not take_min
                and cmp in (None, Cmp.Gt, Cmp.Gte)
            )
        if dv.vectors.dtype == jnp.bfloat16:
            if metric in (Metric.Cosine, Metric.DotProduct):
                return not take_min and cmp in (None, Cmp.Gt, Cmp.Gte)
            if metric is Metric.Euclidean:
                return take_min and cmp in (None, Cmp.Lt, Cmp.Lte)
        return False

    def _direct_k_ok(self, k: int, b: int) -> bool:
        """Can ``_run_query_program`` run take(k) for a ``b``-query batch?

        False means this k belongs to the windowed take-all regime, which
        streams score windows to the host and returns no certificate bound
        (and whose device sort a direct dispatch must never attempt). The
        certificate widen loop checks this before every re-scan — execute()
        routed the ORIGINAL k, but widening happens after the fact."""
        n_pad = self._dv.vectors.shape[0]
        k_eff = min(k, b * n_pad)
        return not (
            self._supports_windowed and scoring.needs_windowed(n_pad, b, k_eff)
        )

    def _run_exact_mask_query(
        self, queries, exact_mask, metric, k, take_min, cmp, thr
    ):
        """Hash-collision fallback: re-run with an exact host-computed row
        mask. Returns HOST (rows, scores, valid). ShardedMetaStore overrides
        this to route the mask through its SPMD program (an unsharded
        re-dispatch over mesh-sharded arrays would gather the store onto one
        device)."""
        return scoring.run_vec_topk(
            self._dv,
            queries,
            metric,
            k,
            take_min=take_min,
            cmp=cmp,
            thr=thr,
            row_mask=exact_mask,
            prec=self.precision,
        )

    def precompile(
        self,
        filters=None,
        batch_sizes=(1, 256),
        k: int = 10,
        metric: Metric = Metric.Cosine,
        with_vec_filter: bool = False,
        rerank_from: Optional[int] = None,
        pipeline_depths=(1,),
        cert_widths: bool = True,
    ) -> int:
        """Ready (compile or AOT-load) the device programs a deployment
        serves, off the query path. ``filters`` is a list of expressions
        (None = unfiltered); each is combined with every batch size. The
        first process pays the compiles and persists serialized executables
        (~MBs) to the AOT disk cache; subsequent processes deserialize in
        well under a second. Returns the number of programs readied.

        ``rerank_from`` additionally warms the exact-rerank flow (the
        widened scan AND the batched device rerank program) for each
        pipeline depth in ``pipeline_depths`` — resolve() groups that many
        in-flight queries, and each distinct group size is its own compiled
        shape.

        ``cert_widths`` (default True, no-op when the certificate does not
        apply) ALSO readies the certificate's widen-ladder programs
        (4x steps from ``rerank_from``, clamped at the fused-kernel
        boundary) so an adversarial query that fails its first certificate
        widens without paying a mid-serving compile."""
        count = self._precompile_rerank(
            filters, batch_sizes, k, metric, rerank_from, pipeline_depths
        )
        for expr in filters if filters is not None else [None]:
            for b in batch_sizes:
                plan = MetaQueryPlan(
                    self, np.zeros((int(b), self._dim), np.float32), metric
                )
                if expr is not None:
                    plan.meta_filter(expr)
                    if plan._meta_error is not None:
                        raise OttersError(plan._meta_error)
                has_filter = (
                    plan._meta_filter is not None
                    and len(plan._meta_filter.clauses) > 0
                )
                if has_filter and self.n_chunks() > 0:
                    plan_static, plan_params, used = plan._lower_plan()
                    cols_sub = {nm: self._device_cols[nm] for nm in used}
                else:
                    plan_static, plan_params, cols_sub = (), (), {}
                take_min = default_take_type(metric) is TakeType.Min
                variants = [(0.0, None)]
                if with_vec_filter:
                    variants.append(
                        (0.0, Cmp.Lt if take_min else Cmp.Gt)
                    )
                for thr, cmp in variants:
                    compiled, args = self._prepare_program(
                        cols_sub, plan._queries, plan_params, thr,
                        plan_static, metric, k, take_min, cmp,
                    )
                    # execute once: warms jit when the AOT layer is disabled
                    # and validates the readied executable either way
                    import jax

                    jax.block_until_ready(compiled(*args))
                    count += 1
                if (
                    cert_widths
                    and rerank_from is not None
                    and self._certify_supported(metric, take_min, None)
                ):
                    # certificate widen-ladder programs (compile-only): the
                    # same width sequence result() dispatches on a failed
                    # certificate, clamped exactly like the widen loop
                    w = int(rerank_from)
                    cap = min(
                        self._dv.vectors.shape[0], _cert_kwide_cap()
                    )
                    while w < cap:
                        nxt = min(max(w * 4, w + 1), cap)
                        if w < _PALLAS_K_MAX < nxt:
                            nxt = _PALLAS_K_MAX
                        if not self._direct_k_ok(nxt, int(b)):
                            break
                        self._prepare_program(
                            cols_sub, plan._queries, plan_params, 0.0,
                            plan_static, metric, nxt, take_min, None,
                            certify=True,
                        )
                        count += 1
                        w = nxt
        return count

    def _precompile_rerank(
        self, filters, batch_sizes, k, metric, rerank_from, pipeline_depths
    ) -> int:
        """Warm the rerank flow (shared by MetaStore and ShardedMetaStore
        precompile): one resolve() per (filter, batch size, depth)."""
        if rerank_from is None:
            return 0
        if self._rerank_fetch is None:
            raise OttersError(
                "precompile(rerank_from=...) requires with_rerank_source on "
                "the builder"
            )
        import warnings

        count = 0
        # distinct random queries per pending (seeded, reproducible): zero
        # queries all tie, so every pending's candidate set collapses to
        # the same first-k' rows and the resolve() union pads to a bucket
        # real traffic never uses — the warmed rerank executable would miss
        # at serving time. Disjoint candidate sets (the serving common
        # case) warm the worst-case union bucket for each depth.
        qrng = np.random.default_rng(0)
        for expr in filters if filters is not None else [None]:
            for b in batch_sizes:
                for depth in pipeline_depths:
                    pend = []
                    for _ in range(int(depth)):
                        plan = self.query_batch(
                            qrng.normal(size=(int(b), self._dim)).astype(
                                np.float32
                            ),
                            metric,
                        ).take(k, rerank_from=rerank_from)
                        if expr is not None:
                            plan.meta_filter(expr)
                            if plan._meta_error is not None:
                                raise OttersError(plan._meta_error)
                        pend.append(plan.collect_async())
                    with warnings.catch_warnings():
                        # a warm batch that fails its certificate (possible
                        # on adversarial data distributions) is noise here —
                        # and the widen attempts it triggers warm the
                        # ladder programs, which is exactly what precompile
                        # is for
                        warnings.filterwarnings(
                            "ignore", message=".*certificate did not pass.*"
                        )
                        resolve(pend)
                    count += int(depth)
        return count

    # -- query ---------------------------------------------------------------
    def query(self, query, metric: Metric) -> "MetaQueryPlan":
        return MetaQueryPlan(self, [np.asarray(query, dtype=np.float32)], metric)

    def query_batch(self, queries, metric: Metric) -> "MetaQueryPlan":
        import jax

        if isinstance(queries, (np.ndarray, jax.Array)) and queries.ndim == 2:
            # zero-copy fast path; jax.Array queries never leave the device
            return MetaQueryPlan(self, queries, metric)
        qs = [np.asarray(q, dtype=np.float32) for q in queries]
        return MetaQueryPlan(self, qs, metric)


# ---------------------------------------------------------------------------
# Query plan
# ---------------------------------------------------------------------------


class MetaQueryPlan:
    """Lazy meta-query builder with deferred compile errors (meta.rs:579-630)."""

    def __init__(self, store: MetaStore, queries: List[np.ndarray], metric: Metric):
        self._store = store
        self._queries = queries
        self._metric = metric
        self._meta_filter: Optional[CompiledFilter] = None
        self._meta_error: Optional[str] = None
        self._vec_filter: Optional[Tuple[float, Cmp]] = None
        self._take_type: Optional[TakeType] = None
        self._take_count: Optional[int] = None
        self._rerank_from: Optional[int] = None
        self._certify: Optional[bool] = None  # see take(); None = auto

    def meta_filter(self, expr: Expr) -> "MetaQueryPlan":
        try:
            self._meta_filter = expr.compile(self._store.schema())
            self._meta_error = None
        except ExprError as e:
            self._meta_error = f"meta_filter compile error: {e}"
        return self

    def vec_filter(self, score: float, cmp: Cmp) -> "MetaQueryPlan":
        self._vec_filter = (float(score), cmp)
        return self

    def take(
        self,
        k: int,
        rerank_from: Optional[int] = None,
        certify: Optional[bool] = None,
    ) -> "MetaQueryPlan":
        """Keep the top ``k``. With ``rerank_from=k_wide`` (requires
        ``with_rerank_source`` on the builder), the device scan collects
        ``k_wide`` candidates and the final ``k`` are exact-f32 re-scored
        against the true vectors — recall recovery for bf16/int8 storage.

        ``certify`` controls the exactness certificate (recall 1.0 BY
        CONSTRUCTION, not by measurement — the reference's core promise,
        README.md:7-14, kept even over quantized storage): the scan also
        returns a sound bound on the true score of every row it did NOT
        hand to the rerank; ``result()`` compares it against the k-th
        exact rerank score and, on failure, automatically re-runs with a
        4x-wider candidate set until the certificate passes (the store
        remembers the working width for later queries, and persists it
        with the store). ``None`` (default) auto-enables for quantized
        storage + rerank with a certifiable plan shape: int8 + Cosine
        (no vec_filter or Gt/Gte), bfloat16 + Cosine/DotProduct (same) or
        Euclidean (no vec_filter or Lt/Lte); False disables (measured
        behavior); True raises if the plan shape cannot be certified.
        ``MetaQueryStats.certified`` / ``scan_k_wide`` report the outcome."""
        self._take_count = int(k)
        self._take_type = default_take_type(self._metric)
        if rerank_from is not None:
            rf = int(rerank_from)
            if rf < int(k):
                raise OttersError(
                    f"rerank_from ({rf}) must be >= take k ({int(k)})"
                )
            self._rerank_from = rf
        if certify is True and rerank_from is None:
            raise OttersError(
                "take(certify=True) requires rerank_from: the certificate "
                "compares the k-th EXACT rerank score against the scan's "
                "bound — there is no exact score without a rerank"
            )
        self._certify = certify
        return self

    # -- leaf lowering --------------------------------------------------------
    def _lower_leaf(self, leaf: ColumnFilter):
        """-> (static descriptor, traced params tuple)."""
        store = self._store
        dtype = store.schema()[leaf.column]
        import jax.numpy as jnp

        if leaf.kind == "null":
            # is_null / is_not_null: chunk pruning needs the per-chunk row
            # counts (nulls-in-chunk = len - non_null)
            return ("null", leaf.column, leaf.cmp), (store._chunk_lens,)
        if leaf.kind == "string" and leaf.cmp in STRING_EXTENDED_OPS:
            return ("hostmask", leaf.column, leaf.cmp), store._hostmask_for(leaf)
        if leaf.kind == "string":
            g1, _ = hashing.hash_string(leaf.rhs)
            rh_hi = np.uint32(g1 >> 32)
            rh_lo = np.uint32(g1 & 0xFFFFFFFF)
            params = store._bloom_params[leaf.column]
            words, masks = bloom_ops.probe_coords(leaf.rhs, params)
            return ("str", leaf.column, leaf.cmp), (
                jnp.asarray(rh_hi),
                jnp.asarray(rh_lo),
                jnp.asarray(words),
                jnp.asarray(masks),
            )
        if dtype is DataType.Bool:
            thr = np.int32(1 if leaf.rhs else 0)
            return ("i32", leaf.column, leaf.cmp), (jnp.asarray(thr),)
        if dtype is DataType.Int32:
            thr = np.int64(leaf.rhs).astype(np.int32)  # wrapping, like `as i32`
            return ("i32", leaf.column, leaf.cmp), (jnp.asarray(thr),)
        if dtype is DataType.Float32:
            return ("f32", leaf.column, leaf.cmp), (
                jnp.asarray(np.float32(leaf.rhs)),
            )
        if dtype in (DataType.Int64, DataType.DateTime):
            hi, lo = wide64.split_i64_scalar(int(leaf.rhs))
            return ("w64", leaf.column, leaf.cmp), (
                jnp.asarray(hi),
                jnp.asarray(lo),
            )
        # Float64
        rhs = float(leaf.rhs)
        if np.isnan(rhs):
            return ("nanthr", leaf.column, leaf.cmp), ()
        hi, lo = wide64.split_f64_scalar(rhs)
        return ("w64f", leaf.column, leaf.cmp), (jnp.asarray(hi), jnp.asarray(lo))

    def _lower_plan(self):
        assert self._meta_filter is not None
        # lowered plans (device threshold scalars included) are reusable
        # across queries with the same filter; cache per store
        cache_key = self._meta_filter.clauses
        cached = self._store._plan_cache.get(cache_key)
        if cached is not None:
            return cached
        static_clauses = []
        param_clauses = []
        used_cols = set()
        for clause in self._meta_filter.clauses:
            st, pr = [], []
            for leaf in clause:
                s, p = self._lower_leaf(leaf)
                st.append(s)
                pr.append(p)
                used_cols.add(leaf.column)
            static_clauses.append(tuple(st))
            param_clauses.append(tuple(pr))
        result = (tuple(static_clauses), tuple(param_clauses), used_cols)
        self._store._plan_cache[cache_key] = result
        return result

    # -- host-exact fallbacks ---------------------------------------------------
    def _host_rhs(self, leaf: ColumnFilter):
        """Leaf literal as the device sees it: Int32 thresholds wrap like
        `as i32` (meta_compute.rs:259) so host verification agrees with the
        device/reference semantics."""
        if (
            leaf.kind == "numeric"
            and self._store.schema()[leaf.column] is DataType.Int32
        ):
            return int(np.int64(leaf.rhs).astype(np.int32))
        return leaf.rhs

    def _row_satisfies(self, i: int) -> bool:
        """Host CNF evaluation for one row (exact, used for verification)."""
        assert self._meta_filter is not None
        cols = self._store.columns()
        for clause in self._meta_filter.clauses:
            ok = False
            for leaf in clause:
                c = cols[leaf.column]
                if leaf.kind == "null":
                    isnull = bool(c.null_mask()[i])
                    if isnull if leaf.cmp is CmpOp.IsNull else not isnull:
                        ok = True
                        break
                    continue
                if bool(c.null_mask()[i]):
                    continue
                v = c.values()[i]
                if leaf.kind == "string":
                    sat = _str_cmp(v, leaf.rhs, leaf.cmp)
                else:
                    # .item() yields exact Python scalars; int/float compares
                    # in Python are exact (no 64-bit precision loss)
                    sat = _num_cmp(
                        np.asarray(v).item(), self._host_rhs(leaf), leaf.cmp
                    )
                if sat:
                    ok = True
                    break
            if not ok:
                return False
        return True

    def _host_exact_row_mask(self, n_pad: int) -> np.ndarray:
        """Vectorized exact host row mask (collision fallback path)."""
        assert self._meta_filter is not None
        store = self._store
        n = store.n_rows
        acc = np.ones(n_pad, dtype=bool)
        acc[n:] = False
        for clause in self._meta_filter.clauses:
            cm = np.zeros(n, dtype=bool)
            for leaf in clause:
                c = store.columns()[leaf.column]
                nulls = np.asarray(c.null_mask(), dtype=bool)[:n]
                if leaf.kind == "null":
                    cm |= nulls if leaf.cmp is CmpOp.IsNull else ~nulls
                    continue
                if leaf.kind == "string":
                    vals = np.asarray(c.values()[:n], dtype=object)
                    if leaf.cmp is CmpOp.Eq:
                        m = vals == leaf.rhs
                    elif leaf.cmp is CmpOp.Neq:
                        m = vals != leaf.rhs
                    elif leaf.cmp in (CmpOp.Fuzzy, CmpOp.NotFuzzy):
                        from .ops import strmatch

                        pattern, max_dist = leaf.rhs
                        m = strmatch.fuzzy_mask(
                            list(vals), nulls, pattern, max_dist
                        )
                        if leaf.cmp is CmpOp.NotFuzzy:
                            m = ~np.asarray(m, dtype=bool)
                    elif leaf.cmp in STRING_EXTENDED_OPS:
                        m = np.fromiter(
                            (_str_cmp(v, leaf.rhs, leaf.cmp) for v in vals),
                            bool,
                            count=n,
                        )
                    else:
                        m = np.zeros(n, dtype=bool)
                else:
                    vals = np.asarray(c.values()[:n])
                    m = _np_cmp(vals, self._host_rhs(leaf), leaf.cmp)
                cm |= np.asarray(m, dtype=bool) & ~nulls
            pad = np.zeros(n_pad, dtype=bool)
            pad[:n] = cm
            acc &= pad
        return acc

    # -- execution ----------------------------------------------------------
    def collect(self) -> MetaQueryResults:
        """Execute and block for results (reference meta.rs:632-829)."""
        return self.collect_async().result()

    def collect_async(self) -> "PendingMetaQuery":
        """Dispatch the device program without blocking.

        TPU-native extension over the reference API: lets callers pipeline
        query batches (dispatch batch i+1 while batch i is in flight), which
        hides device/host latency. ``.result()`` finalizes.
        """
        import jax  # noqa: F401

        if self._meta_error is not None:
            raise OttersError(self._meta_error)
        store = self._store
        total_start = time.perf_counter()
        k = self._take_count if self._take_count is not None else store.n_rows
        if self._rerank_from is not None:
            if store._rerank_fetch is None:
                raise OttersError(
                    "take(k, rerank_from=...) requires "
                    "with_rerank_source(...) on the MetaStoreBuilder"
                )
            k = self._rerank_from  # widen the device scan; result() reranks
        take_type = self._take_type or default_take_type(self._metric)
        if isinstance(self._queries, list):
            queries = (
                np.stack(self._queries, axis=0)
                if self._queries
                else np.zeros((0, store._dim), np.float32)
            )
        else:
            queries = self._queries  # 2D ndarray / device array fast path
        b = queries.shape[0]
        n_chunks = store.n_chunks()
        has_filter = self._meta_filter is not None and len(
            self._meta_filter.clauses
        ) > 0

        # ---- prune plan lowering (host; device pruning is fused below) ----
        prune_start = time.perf_counter()
        if has_filter and n_chunks > 0:
            plan_static, plan_params, used = self._lower_plan()
            cols_sub = {name: store._device_cols[name] for name in used}
        else:
            plan_static, plan_params, cols_sub = (), (), {}
        prune_dur = time.perf_counter() - prune_start

        # ---- score phase: dispatch ONE fused device program ----
        score_start = time.perf_counter()
        raw = None
        strict_redo = None
        rerun_widened = None
        fetched = None
        if store.n_rows > 0 and k > 0 and b > 0:
            if queries.shape[1] != store._dim:
                raise OttersError(
                    f"Query vector length {queries.shape[1]} does not match "
                    f"expected dimension {store._dim}"
                )
            thr, cmp = (None, None) if self._vec_filter is None else self._vec_filter
            n_pad = store._dv.vectors.shape[0]

            # int8 exactness certificate (see take() docstring)
            certify = False
            if self._rerank_from is not None and self._certify is not False:
                supported = store._certify_supported(
                    self._metric,
                    (take_type is TakeType.Min),
                    None if thr is None else cmp,
                )
                if self._certify is True and not supported:
                    import jax.numpy as jnp

                    if (
                        store._dv.vectors.dtype == jnp.int8
                        and store._dv.resid is None
                    ):
                        # the one precondition invisible from the plan: the
                        # store was built from pre-quantized int8 codes, so
                        # no per-row quantization-residual bounds exist
                        raise OttersError(
                            "take(certify=True): this int8 store has no "
                            "quantization-residual bounds (it was built "
                            "from pre-quantized codes); certification "
                            "requires quantize-from-f32 ingest"
                        )
                    raise OttersError(
                        "take(certify=True): the exactness certificate "
                        "requires storage quantized from f32 at ingest "
                        "(int8: Cosine + take-max + no/Gt/Gte vec_filter; "
                        "bfloat16: also DotProduct, and Euclidean with "
                        "take-min + no/Lt/Lte vec_filter)"
                    )
                certify = supported
                if certify:
                    # start at the widest scan that recently certified for
                    # THIS plan shape — re-running a known-too-narrow scan
                    # just to fail its certificate wastes a full dispatch.
                    # Keyed per (filter, vec_filter, k): a prune-heavy
                    # filter's wide hint must not widen (and possibly
                    # de-pallas) an unfiltered plan's scans, and vice versa
                    # the key is a stable STRING so hints can persist with
                    # the store (io.save_meta manifest) and prime a fresh
                    # process — re-paying the widen discovery per process
                    # costs wasted full scans (VERDICT r4 item 7)
                    self._hint_key = repr((
                        self._meta_filter.clauses
                        if self._meta_filter is not None
                        else None,
                        self._vec_filter,
                        self._take_count,
                    ))
                    hint = store._cert_kwide_hint.get(self._hint_key, 0)
                    k = min(max(k, hint), n_pad)

            k_eff = min(k, b * n_pad)
            if store._supports_windowed and scoring.needs_windowed(
                n_pad, b, k_eff
            ):
                if self._certify is True:
                    raise OttersError(
                        "take(certify=True): this k falls into the windowed "
                        "take-all regime, whose streaming program returns "
                        "no certificate bound; drop certify or use a "
                        "device-top-k-sized take"
                    )
                # take-all regime (reference meta.rs:638-640): no device
                # top-k buffer fits, stream score windows to the host
                raw = fetched = self._collect_windowed(
                    cols_sub, queries, plan_params, plan_static, k_eff,
                    take_type, thr, cmp,
                )
            else:

                def run(strict=False, k_run=k, certify=None):
                    return store._run_query_program(
                        cols_sub,
                        queries,
                        plan_params,
                        0.0 if thr is None else thr,
                        plan_static,
                        self._metric,
                        k_run,
                        (take_type is TakeType.Min),
                        None if thr is None else cmp,
                        strict=strict,
                        certify=_certify if certify is None else certify,
                    )

                _certify = certify
                try:
                    raw = run()
                except Exception:
                    if not certify or self._certify is True:
                        raise
                    # auto-certify safety net: a certified program that
                    # fails to COMPILE (backend-specific Mosaic lowering,
                    # lane-array memory) must not take serving down — fall
                    # back to the measured-recall scan and report honestly
                    # (stats.certified stays None)
                    import warnings

                    warnings.warn(
                        "certified scan program failed to build; serving "
                        "this query uncertified (recall measured, not "
                        "certified). take(certify=True) surfaces the "
                        "underlying error instead.",
                        stacklevel=2,
                    )
                    _certify = certify = False
                    raw = run()
                strict_redo = partial(run, strict=True)
                rerun_widened = run if certify else None
                # start the device->host copy of the (few-KB) scan outputs
                # NOW: by the time resolve()/result() blocks on them, the
                # transfer has streamed back behind the later pendings'
                # scans instead of costing a full roundtrip on the
                # critical path (one sync fetch ~31 ms on tunneled hosts).
                # OTTERS_NO_D2H_PREFETCH=1 disables (A/B + safety valve).
                if not os.environ.get("OTTERS_NO_D2H_PREFETCH"):
                    try:
                        for leaf in raw:
                            leaf.copy_to_host_async()
                    except Exception:
                        pass  # backend without async copies: sync later
        p = PendingMetaQuery(
            plan=self,
            raw=raw,
            queries=queries,
            k=k,
            take_type=take_type,
            has_filter=has_filter,
            total_start=total_start,
            prune_dur=prune_dur,
            score_start=score_start,
            strict_redo=strict_redo,
        )
        p._rerun_widened = rerun_widened
        if fetched is not None:
            p._fetched = fetched
        return p

    def _collect_windowed(
        self, cols_sub, queries, plan_params, plan_static, k_eff, take_type,
        thr, cmp,
    ):
        """Take-all execution: device pruning + windowed score streaming
        (scoring.collect_all), dispatched through the store so sharded
        stores can run it per shard. Returns a host tuple in the program's
        raw output layout (rows, scores, valid, check, evaluated,
        rows_eval)."""
        return self._store._windowed_collect(
            cols_sub, queries, plan_params, plan_static, k_eff,
            self._metric, (take_type is TakeType.Min), thr, cmp,
        )


# ops.pallas_topk.PALLAS_K_MAX, duplicated to keep the (TPU-importing)
# kernel module out of meta's import graph; equality is pinned by
# tests/test_cert_exact.py
_PALLAS_K_MAX = 1024


def _cert_kwide_cap() -> int:
    """Widest scan the int8 certificate auto-widen loop will try.

    Beyond this the query is answered (exactly per the quantized-scan +
    exact-rerank contract) but reported uncertified; OTTERS_CERT_KWIDE_MAX
    raises it for adversarial data."""
    import os

    return int(os.environ.get("OTTERS_CERT_KWIDE_MAX", "4096"))


def _cert_ok(bound, scores, k_final, vec_filter, take_min=False) -> bool:
    """Host-side certificate decision.

    ``bound`` is in the KEY space: a sound upper bound on the true score of
    every unreturned row for take-max metrics, on the NEGATED true distance
    for take_min (-inf when everything passing was returned). ``scores``:
    exact rerank scores in take order, truncated to ``k_final``. The result
    is certified-complete iff no unreturned row could enter it:
      - k results: the k-th exact KEY must reach the bound. ``bound``
        carries a strictly positive inflation (arithmetic headroom inside
        c0) over any unreturned row's true key, so ``kth >= bnd`` implies
        the k-th STRICTLY beats every unreturned row — a tie against the
        bound is still a strict win against the rows it covers;
      - fewer than k results: every unreturned row must provably FAIL the
        score filter (or nothing may be unreturned at all)."""
    bnd = float(bound)
    if len(scores) >= int(k_final):
        kth = float(scores[int(k_final) - 1])
        return (-kth if take_min else kth) >= bnd
    if bnd == float("-inf"):
        return True
    if vec_filter is None:
        return False
    thr, cmp = vec_filter
    if cmp is Cmp.Gte:
        return bnd < float(thr)
    if cmp is Cmp.Gt:
        return bnd <= float(thr)
    if cmp is Cmp.Lte:
        # bound = -(lower bound on unreturned true distance): every
        # unreturned row has true >= -bnd, which fails "true <= thr" iff
        # -bnd > thr
        return -bnd > float(thr)
    if cmp is Cmp.Lt:
        return -bnd >= float(thr)
    return False


class PendingMetaQuery:
    """In-flight meta query: device program dispatched, results not fetched."""

    def __init__(
        self,
        plan: "MetaQueryPlan",
        raw,
        queries,
        k,
        take_type,
        has_filter,
        total_start,
        prune_dur,
        score_start,
        strict_redo=None,
    ):
        self._plan = plan
        self._raw = raw
        self._strict_redo = strict_redo
        self._queries = queries
        self._k = k
        self._take_type = take_type
        self._has_filter = has_filter
        self._total_start = total_start
        self._prune_dur = prune_dur
        self._score_start = score_start
        self._result: Optional[MetaQueryResults] = None
        self._fetched = None
        self._rerank_prefetch = None  # set by resolve(): (sorted ids, rows)
        self._device_rerank = None  # set by resolve(): (cand set, rows, scores)
        self._rerun_widened = None  # set when the int8 certificate is active
        self._certified: Optional[bool] = None  # certificate outcome
        self._scan_k_wide: Optional[int] = None  # final scan width used

    def _exact_rerank(self, indices):
        """Exact-f32 re-rank of the widened candidate set (the library form
        of the exactness contract, vec_compute.rs:77-294, over approximate
        bf16/int8 storage). Candidates are fetched by ORIGINAL row id; the
        returned indices are back in CURRENT positions (materialization and
        the final index_map remap expect them so)."""
        from .evaluate import exact_rerank

        plan = self._plan
        store = plan._store
        k_final = plan._take_count
        idx = np.asarray(indices, dtype=np.int64)
        orig = store._index_map[idx] if store._index_map is not None else idx
        fetch = store._rerank_fetch
        if self._rerank_prefetch is not None:
            pf_ids, mat = self._rerank_prefetch  # sorted ids, their rows

            def fetch(ids, _ids=pf_ids, _m=mat, _f=store._rerank_fetch):
                ids = np.asarray(ids, dtype=np.int64)
                if len(_ids):
                    pos = np.minimum(
                        np.searchsorted(_ids, ids), len(_ids) - 1
                    )
                    if (_ids[pos] == ids).all():
                        return _m[pos]
                return _f(ids)  # e.g. a collision redo changed the set
        # re-rank ALL candidates, re-apply the vec_filter on the exact
        # scores, then truncate — a filter that passed on scan scores can
        # fail on exact ones (and vice versa near the threshold)
        rows, scrs = exact_rerank(
            np.asarray(self._queries, dtype=np.float32),
            orig.tolist(),
            fetch,
            plan._metric,
            len(orig),
            take_min=(self._take_type is TakeType.Min),
        )
        if plan._vec_filter is not None:
            thr, cmp = plan._vec_filter
            op = CmpOp[cmp.value]  # Cmp names are a subset of CmpOp's
            keep = [i for i, s in enumerate(scrs) if _num_cmp(s, thr, op)]
            rows = [rows[i] for i in keep]
            scrs = [scrs[i] for i in keep]
        rows = rows[:k_final]
        scrs = scrs[:k_final]
        if store._index_map is not None:
            inv = np.empty(store.n_rows, dtype=np.int64)
            inv[store._index_map] = np.arange(store.n_rows)
            rows = inv[np.asarray(rows, dtype=np.int64)].tolist()
        return rows, scrs

    def result(self) -> MetaQueryResults:
        if self._result is not None:
            return self._result
        import jax

        plan = self._plan
        store = plan._store
        n_chunks = store.n_chunks()
        b = self._queries.shape[0]

        indices: List[int] = []
        scores: List[float] = []
        evaluated = n_chunks
        rows_eval = store.n_rows
        if self._raw is not None:
            # one batched device->host fetch for all outputs
            rows, scrs, valid, check, bound, ev, re_ = (
                self._fetched
                if self._fetched is not None
                else jax.device_get(self._raw)
            )
            if not bool(check) and self._strict_redo is not None:
                # verified fast-exact check failed; re-run at HIGHEST
                rows, scrs, valid, _, bound, ev, re_ = jax.device_get(
                    self._strict_redo()
                )
            # keep the final raw values around: the single-pending device
            # rerank below reads them (resolve() pre-sets them for groups)
            self._fetched = (rows, scrs, valid, check, bound, ev, re_)
            evaluated = int(ev)
            rows_eval = int(re_)
            ok_np = np.asarray(valid, dtype=bool)
            indices = np.asarray(rows)[ok_np].astype(np.int64).tolist()
            scores = np.asarray(scrs)[ok_np].tolist()

            # exactness guard: verify string-predicate hits host-side; on a
            # hash collision re-run with an exact host row mask (p ~ 2^-64)
            collision_redo = False
            if self._has_filter and any(
                lf.kind == "string"
                for cl in plan._meta_filter.clauses
                for lf in cl
            ):
                n_res = len(indices)
                if n_res > 256 and n_res * 64 > store.n_rows:
                    # take-all-sized results: one vectorized host pass beats
                    # millions of per-row CNF evaluations
                    em = plan._host_exact_row_mask(store._dv.vectors.shape[0])
                    sat = bool(em[np.asarray(indices, dtype=np.int64)].all())
                else:
                    sat = all(plan._row_satisfies(i) for i in indices)
                if not sat:
                    dv = store._dv
                    thr, cmp = (
                        (None, None)
                        if plan._vec_filter is None
                        else plan._vec_filter
                    )
                    exact_mask = plan._host_exact_row_mask(dv.vectors.shape[0])
                    rows, scrs, valid = store._run_exact_mask_query(
                        self._queries,
                        exact_mask,
                        plan._metric,
                        self._k,
                        (self._take_type is TakeType.Min),
                        cmp,
                        thr,
                    )
                    ok_np = np.asarray(valid, dtype=bool)
                    indices = np.asarray(rows)[ok_np].astype(np.int64).tolist()
                    scores = np.asarray(scrs)[ok_np].tolist()
                    self._fetched = (rows, scrs, valid, check, bound, ev, re_)
                    collision_redo = True

            if plan._rerank_from is not None and indices:
                done = False
                if (
                    self._device_rerank is None
                    and plan._metric not in VPU_METRICS
                    and store._rerank_fetch is not None
                ):
                    # plain collect(): run the same device rerank as a
                    # group of one (fetched values were stored above, post
                    # any strict redo, so the set guard always matches)
                    try:
                        _device_rerank_group(store, [self])
                    except Exception:
                        pass  # host fallback below
                dr = self._device_rerank
                if dr is not None:
                    idx0 = np.asarray(indices, dtype=np.int64)
                    orig0 = (
                        store._index_map[idx0]
                        if store._index_map is not None
                        else idx0
                    )
                    # the device rerank was computed from the raw candidate
                    # set at resolve() time; a strict/collision redo above
                    # may have changed it — only trust a matching set
                    if frozenset(orig0.tolist()) == dr[0]:
                        rows_orig = np.asarray(dr[1], dtype=np.int64)
                        scores = list(dr[2])
                        if store._index_map is not None:
                            inv = np.empty(store.n_rows, dtype=np.int64)
                            inv[store._index_map] = np.arange(store.n_rows)
                            indices = inv[rows_orig].tolist()
                        else:
                            indices = rows_orig.tolist()
                        done = True
                if not done:
                    indices, scores = self._exact_rerank(indices)

                if self._rerun_widened is not None:
                    # int8 exactness certificate: the k-th exact rerank
                    # score must beat the sound bound on every row the scan
                    # did NOT hand to the rerank; otherwise re-scan 4x wider
                    # (recall 1.0 by construction — see take() docstring)
                    k_used = self._k
                    take_min = self._take_type is TakeType.Min
                    certified = (not collision_redo) and _cert_ok(
                        bound, scores, plan._take_count, plan._vec_filter,
                        take_min,
                    )
                    n_pad = store._dv.vectors.shape[0]
                    cap = min(n_pad, _cert_kwide_cap())
                    if collision_redo:
                        cap = 0  # exact-mask result; scan bound is stale
                    while not certified and k_used < cap:
                        nxt = min(max(k_used * 4, k_used + 1), cap)
                        if k_used < _PALLAS_K_MAX < nxt:
                            # try the fused-kernel boundary before leaving
                            # it: a hint that lands at 1024 keeps every
                            # steady-state scan on the pallas path, where
                            # 1600 would de-fuse ALL later scans of this
                            # plan shape for a marginal certificate
                            nxt = _PALLAS_K_MAX
                        if not store._direct_k_ok(nxt, b):
                            # the direct top-k program can't run this wide
                            # (windowed take-all regime / SPMD merge limit:
                            # no bound comes back from either). Stop at the
                            # widest still-eligible width, if one remains
                            # above k_used — eligibility is monotone in k
                            lo, hi = k_used, nxt
                            while lo < hi:  # largest ok width by bisection
                                mid = (lo + hi + 1) // 2
                                if store._direct_k_ok(mid, b):
                                    lo = mid
                                else:
                                    hi = mid - 1
                            if lo <= k_used:
                                break  # already at the widest eligible scan
                            nxt = cap = lo  # final attempt, then exit
                        k_used = nxt
                        try:
                            raw2 = self._rerun_widened(k_run=k_used)
                        except Exception:
                            # a wider program failed to build (fresh width =
                            # fresh compile): keep the current exact-rerank
                            # result, report uncertified — never take
                            # serving down mid-widen
                            certified = False
                            break
                        rows, scrs, valid, _, bound, ev, re_ = jax.device_get(
                            raw2
                        )
                        evaluated = int(ev)
                        rows_eval = int(re_)
                        ok_np = np.asarray(valid, dtype=bool)
                        indices = (
                            np.asarray(rows)[ok_np].astype(np.int64).tolist()
                        )
                        collided = (
                            self._has_filter
                            and any(
                                lf.kind == "string"
                                for cl in plan._meta_filter.clauses
                                for lf in cl
                            )
                            and not all(
                                plan._row_satisfies(i) for i in indices
                            )
                        )
                        self._rerank_prefetch = None
                        self._device_rerank = None
                        if collided:
                            # hash collision inside the widened set (p ~
                            # 2^-64): redo with the exact host row mask —
                            # results stay exact, but the scan bound no
                            # longer speaks about this candidate set, so
                            # the certificate is abandoned
                            thr_c, cmp_c = (
                                (None, None)
                                if plan._vec_filter is None
                                else plan._vec_filter
                            )
                            em = plan._host_exact_row_mask(n_pad)
                            rows, scrs, valid = store._run_exact_mask_query(
                                self._queries, em, plan._metric, k_used,
                                (self._take_type is TakeType.Min), cmp_c,
                                thr_c,
                            )
                            ok_np = np.asarray(valid, dtype=bool)
                            indices = (
                                np.asarray(rows)[ok_np]
                                .astype(np.int64)
                                .tolist()
                            )
                            indices, scores = self._exact_rerank(indices)
                            certified = False
                            break
                        indices, scores = self._exact_rerank(indices)
                        certified = _cert_ok(
                            bound, scores, plan._take_count, plan._vec_filter,
                            take_min,
                        )
                    self._certified = certified
                    self._scan_k_wide = k_used
                    hk = getattr(plan, "_hint_key", None)
                    if (
                        certified
                        and hk is not None
                        and k_used > self._k
                        and k_used > store._cert_kwide_hint.get(hk, 0)
                    ):
                        store._cert_kwide_hint[hk] = k_used
                    if not certified:
                        import warnings

                        warnings.warn(
                            "int8 exactness certificate did not pass at "
                            f"scan width {k_used} (cap {cap}); results "
                            "match the quantized-scan + exact-rerank "
                            "contract but recall 1.0 is not certified for "
                            "this query. Raise OTTERS_CERT_KWIDE_MAX or "
                            "widen rerank_from.",
                            stacklevel=2,
                        )
            elif self._rerun_widened is not None:
                # certificate requested but the scan returned ZERO
                # candidates: provably complete. Filtered plans loosen the
                # quantized threshold by the sound slack, so a row excluded
                # there fails the exact filter too — no candidates means NO
                # row truly passes, and the empty result is exact. (After a
                # collision redo the results come from the exact-mask query
                # — also exact — but the scan bound no longer speaks for
                # them, so stay consistent with the widen loop and decline.)
                self._certified = not collision_redo
                self._scan_k_wide = self._k
        score_dur = time.perf_counter() - self._score_start

        # ---- merge phase: result-column materialization (host) ----
        # Vectorized gather of the raw backing stores (sentinels included):
        # raw values + null mask are exactly what push(None)/push(value)
        # would have produced row by row, at numpy speed — take-all results
        # with millions of rows materialize in milliseconds, not minutes.
        merge_start = time.perf_counter()
        col_names = sorted(store.schema().keys())
        data: Dict[str, Column] = {}
        idx = np.asarray(indices, dtype=np.int64)
        for name in col_names:
            src = store.columns()[name]
            dst = Column(name, src.dtype)
            if idx.size:
                nulls = np.asarray(src.null_mask(), dtype=bool)[idx]
                if src.dtype is DataType.String:
                    vals = src.values()
                    sel = [vals[i] for i in idx]
                else:
                    sel = np.asarray(src.values())[idx]
                dst._set_raw(sel, nulls)
            data[name] = dst
        merge_dur = time.perf_counter() - merge_start

        store._last_stats = MetaQueryStats(
            total_chunks=n_chunks,
            pruned_chunks=n_chunks - evaluated,
            evaluated_chunks=evaluated,
            vectors_compared=rows_eval * b,
            prune_duration=self._prune_dur,
            score_duration=score_dur,
            merge_duration=merge_dur,
            total_duration=time.perf_counter() - self._total_start,
            certified=self._certified,
            scan_k_wide=self._scan_k_wide,
        )
        if store._index_map is not None:
            # sorted store: report ORIGINAL ingestion-order row ids
            indices = (
                store._index_map[np.asarray(indices, dtype=np.int64)].tolist()
                if indices
                else []
            )
        self._result = MetaQueryResults(col_names, data, indices, scores)
        return self._result


def _resolve_group_max() -> int:
    """Max pendings per device-rerank dispatch unit in resolve().

    0 (default) = one unit per compatible group, maximizing candidate-union
    dedup and using the fewest dispatches. A positive value splits groups
    into chunks AND fetches each chunk's scan outputs right before its
    dispatch — so unit i's host-side rerank prep (candidate union build,
    fetch_vectors gather, h2d staging) overlaps the device scans still
    running for units i+1.. . Worth sweeping on hardware where the rerank
    gather/transfer is a visible fraction of the pipeline."""
    import os

    return max(0, int(os.environ.get("OTTERS_RESOLVE_GROUP_MAX", "0")))


def resolve(pendings: List["PendingMetaQuery"]) -> List[MetaQueryResults]:
    """Finalize many in-flight queries with batched device->host fetches.

    Per-fetch latency dominates small-result queries on tunneled/multi-host
    setups; batching the fetch amortizes it across the whole pipeline.
    """
    import jax

    todo = [p for p in pendings if p._raw is not None and p._result is None]

    # batched rerank: pendings group by compatible shape/plan signature;
    # each group first tries ONE device program scoring every member's
    # candidates in a single dispatch, falling back to a single union
    # fetch_vectors prefetch + host math (per-pending fetches would pay a
    # device/tunnel roundtrip each). Grouping needs only plan metadata, so
    # it happens BEFORE any scan output is fetched; with a group-max set,
    # each chunk's raw fetch + host prep interleave with the device scans
    # still running for later chunks. ALL dispatches happen before ANY
    # rerank result is fetched: one batched roundtrip drains every unit
    by_group: Dict[tuple, Tuple[MetaStore, list]] = {}
    for p in todo:
        plan = p._plan
        if (
            plan._rerank_from is not None
            and plan._store._rerank_fetch is not None
        ):
            gkey = (
                id(plan._store),
                tuple(np.shape(p._queries)),
                plan._metric,
                p._take_type,
                plan._vec_filter,
                plan._take_count,
            )
            by_group.setdefault(gkey, (plan._store, []))[1].append(p)

    gmax = _resolve_group_max()
    units = []  # (store, plist-chunk)
    for store, plist in by_group.values():
        if gmax and len(plist) > gmax:
            units.extend(
                (store, plist[i : i + gmax])
                for i in range(0, len(plist), gmax)
            )
        else:
            units.append((store, plist))

    def _fetch_raws(ps) -> None:
        ps = [p for p in ps if p._fetched is None]
        if ps:
            for p, f in zip(ps, jax.device_get([p._raw for p in ps])):
                p._fetched = tuple(f)

    if not gmax:
        _fetch_raws(todo)  # one fetch for everything, grouped or not

    states = []  # (store, plist, cands, raw_outputs)
    host_groups = []
    for store, plist in units:
        _fetch_raws(plist)
        try:
            state = _device_rerank_dispatch(store, plist)
        except Exception:
            state = None  # host fallback below
        if state is None:
            host_groups.append((store, plist))
        else:
            _, cands, raw = state
            states.append((store, plist, cands, raw))
    _fetch_raws(todo)  # pendings outside any rerank group
    if states:
        drained = jax.device_get([raw for _, _, _, raw in states])
        for (store, plist, cands, _), out in zip(states, drained):
            try:
                _device_rerank_finish(plist, cands, out)
            except Exception:
                host_groups.append((store, plist))
    for store, plist in host_groups:
        ids: set = set()
        for p in plist:
            rows, _, valid = p._fetched[0], p._fetched[1], p._fetched[2]
            idx = np.asarray(rows)[np.asarray(valid, dtype=bool)].astype(
                np.int64
            )
            if store._index_map is not None:
                idx = store._index_map[idx]
            ids.update(idx.tolist())
        if not ids:
            continue
        # sorted union: the consumers look rows up via searchsorted, and a
        # monotone id order makes the user's fetch a locality-friendly gather
        ids_arr = np.unique(np.fromiter(ids, dtype=np.int64, count=len(ids)))
        mat = np.asarray(store._rerank_fetch(ids_arr), dtype=np.float32)
        for p in plist:
            p._rerank_prefetch = (ids_arr, mat)
    return [p.result() for p in pendings]


def _str_cmp(v: str, rhs, cmp: CmpOp) -> bool:
    if cmp in NEGATED_STRING_OPS:
        return not _str_cmp(v, rhs, NEGATED_CMP[cmp])
    if cmp is CmpOp.Eq:
        return v == rhs
    if cmp is CmpOp.Neq:
        return v != rhs
    if cmp is CmpOp.Contains:
        return rhs in v
    if cmp is CmpOp.StartsWith:
        return v.startswith(rhs)
    if cmp is CmpOp.EndsWith:
        return v.endswith(rhs)
    if cmp is CmpOp.Fuzzy:
        from .ops.strmatch import MAX_DIST_CAP, bounded_levenshtein

        pattern, max_dist = rhs
        return bounded_levenshtein(
            v.encode("utf-8"), pattern.encode("utf-8"),
            min(int(max_dist), MAX_DIST_CAP),
        )
    return False


def _num_cmp(v: float, t: float, cmp: CmpOp) -> bool:
    if cmp is CmpOp.Eq:
        return v == t
    if cmp is CmpOp.Neq:
        return v != t
    if cmp is CmpOp.Lt:
        return v < t
    if cmp is CmpOp.Lte:
        return v <= t
    if cmp is CmpOp.Gt:
        return v > t
    return v >= t


def _np_cmp(vals: np.ndarray, t, cmp: CmpOp) -> np.ndarray:
    if cmp is CmpOp.Eq:
        return vals == t
    if cmp is CmpOp.Neq:
        return vals != t
    if cmp is CmpOp.Lt:
        return vals < t
    if cmp is CmpOp.Lte:
        return vals <= t
    if cmp is CmpOp.Gt:
        return vals > t
    return vals >= t
