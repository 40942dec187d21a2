"""Pallas fused scoring kernel with pruned-tile skipping.

The reference prunes chunks on the host and simply never scores them
(meta.rs:648-691). The XLA dense path can't skip work — masked rows still
burn MXU cycles and HBM bandwidth. This kernel restores true pruning on TPU:

- The chunk mask is turned into a **survivor tile list** on device
  (stable argsort of tile-alive flags). It is fed to the kernel as a
  scalar-prefetch operand, and the vector tile's BlockSpec ``index_map``
  reads it: grid step ``g`` DMAs tile ``surv[min(g, S-1)]``. Steps past the
  survivor count keep mapping to the same block, and Pallas's pipeline
  skips re-fetching an unchanged block — so pruned tiles cost **neither
  HBM traffic nor MXU work** (`pl.when` skips the matmul).
- Each live step computes the `[B, T]` masked score block on the MXU and
  reduces it to per-512-bin maxima (phase 1 of the two-level exact top-k;
  see ops/scoring.py panel path). Bin winners are re-scored in a tiny XLA
  phase 2, so the full score matrix never exists in HBM.

Exactness: bin maxima are computed from the same masked scores phase 2
recomputes; the k winning bins are a superset of the true top-k (every true
top-k element's bin max is >= the k-th best value).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import VPU_METRICS, Cmp, Metric
from .scoring import (
    CERT_BIN,
    _filter_ok,
    _precision,
    _query_norms,
    exact_topk_flat,
    high_precision_bound,
)

BIN = 512
assert BIN == CERT_BIN  # resid_bin granularity must match the kernel's bins
# widest top-k the fused kernel accepts (phase-2 slot budget); the
# certificate's widen loop clamps its sequence to this boundary so a
# marginal widening never de-fuses later scans (meta.py widen loop)
PALLAS_K_MAX = 1024
LANE = 128
SUBLANE = 8
# Phase-2 strategy switch: up to this many candidate bins, a lax.scan of
# contiguous dynamic-slices is fastest (measured ~1.8 ms at ~100 bins on
# v5e); above it the serialized steps dominate and the batched-gather
# formulation wins despite the per-row gather.
PHASE2_SCAN_MAX_BINS = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_b(b: int) -> int:
    """Query-batch padding inside the kernel: 8 sublanes, not 128 lanes.

    The MXU streams the batch through the sublane axis, so a b=1 query costs
    ~an 8-row matmul per tile instead of a 128-row one — this is what makes
    tile-skipping pay for single-query filtered search (the reference prunes
    regardless of batch size, meta.rs:647-691)."""
    return _round_up(max(b, 1), SUBLANE)


def choose_tile(d: int, n_pad: int = 0, b_pad: int = LANE, chunk: int = 0) -> int:
    """Row-tile size under the 16 MB VMEM budget.

    Bounds BOTH the double-buffered [T, D] vector tile (f32 in-kernel
    footprint regardless of storage dtype — int8/bf16 upcast on load) and
    the [B_pad, T] score/key working set (~3 copies): small-D stores would
    otherwise pick huge T and blow scoped VMEM through the score buffers.
    Narrow batches get a bigger vector-tile budget: their score buffers are
    tiny, and fewer grid steps cut the fixed per-step cost that dominates
    single-query latency. Must divide n_pad.

    When the caller prunes at ``chunk``-row granularity, the tile aligns
    DOWN to a chunk multiple whenever that is representable (chunk divides
    into BIN-multiples and n_pad) — otherwise a tile straddling two chunks
    stays alive if EITHER survives, and e.g. alternating 1024-row chunks
    under 1536-row tiles would disable skipping entirely (observed at b=1
    on the 10M store)."""
    vd_budget = (3 * (1 << 20)) if b_pad > 32 else (5 * (1 << 20))
    t_by_vd = vd_budget // (4 * d)
    t_by_bt = (6 * (1 << 20)) // (4 * 3 * max(b_pad, SUBLANE))
    t = min(t_by_vd, t_by_bt)
    # combined bound, same formula pallas_ok gates on: queries + double-
    # buffered vector tile + ~3 score/key copies must fit scoped VMEM.
    # For b_pad <= 256 this never binds (the per-term budgets are tighter);
    # it is what admits WIDE batches (b=512 -> t=512) to the fused kernel.
    denom = 4 * (2 * d + 3 * max(b_pad, SUBLANE))
    t_by_sum = (13 * (1 << 20) - 4 * b_pad * d) // denom
    t = min(t, max(t_by_sum, BIN))
    t = max(BIN, (t // BIN) * BIN)
    if chunk and chunk % BIN == 0 and t > chunk:
        aligned = (t // chunk) * chunk
        if not n_pad or n_pad % aligned == 0:
            t = aligned
        else:
            # the budget-sized aligned tile does not divide n_pad; fall back
            # to the LARGEST chunk multiple that does (chunk skipping beats a
            # slightly bigger misaligned tile — a straddling tile stays alive
            # if EITHER neighbor chunk survives)
            cand = aligned - chunk
            while cand >= chunk and n_pad % cand != 0:
                cand -= chunk
            if cand >= chunk:
                t = cand
    if n_pad:
        while t > BIN and n_pad % t != 0:
            t -= BIN
    return t


def _kernel(
    surv_ref,
    ns_ref,
    thr_ref,
    q_ref,
    v_ref,
    aux_ref,
    qaux_ref,
    out_ref,
    *,
    metric: Metric,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    nb: int,
    bo: int,
    certify: bool = False,
    cert_cos: bool = False,
):
    g = pl.program_id(0)
    real = g < ns_ref[0]

    @pl.when(real)
    def _():
        q = q_ref[:]  # [b_pad, D] (b_pad = 8-sublane-padded batch)
        dn = (((1,), (1,)), ((), ()))
        if q_ref.dtype == jnp.int8:
            # int8 storage: native int8 x int8 -> int32 MXU accumulation,
            # exact at ANY dimension (f32 accumulation would round past
            # 2^24, i.e. d >= ~1041) and bit-identical to the XLA int8 path
            dots = jax.lax.dot_general(
                q, v_ref[:], dn, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        elif q_ref.dtype == jnp.bfloat16:
            # MIXED certified scan: bf16-rounded queries x int8 rows. int8
            # codes are exact in bf16 (8-bit significand), the products are
            # exact in the f32 accumulator — the only scan-side errors are
            # f32 accumulation (mixed_cert_eps) and the row quantization
            # residual folded per row below. One bf16 MXU pass.
            dots = jax.lax.dot_general(
                q,
                v_ref[:].astype(jnp.bfloat16),
                dn,
                preferred_element_type=jnp.float32,
            )
        elif prec == "high":
            # Mosaic has no Precision.HIGH lowering; do bf16_3x by hand:
            # three bf16 MXU passes with f32 accumulation, dropping ql.vl
            # (the sound error bound lives in scoring.high_precision_bound)
            v = v_ref[:].astype(jnp.float32)
            qh = q.astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            vh = v.astype(jnp.bfloat16)
            vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            dots = (
                jax.lax.dot_general(qh, vh, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(qh, vl, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(ql, vh, dn, preferred_element_type=jnp.float32)
            )
        else:
            dots = jax.lax.dot_general(
                q,
                v_ref[:].astype(jnp.float32),  # bf16 storage upcasts here
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=_precision(prec),
            )  # [b_pad, T]
        inv = aux_ref[0, :][None, :]
        nsq = aux_ref[1, :][None, :]
        rmask = aux_ref[2, :][None, :]
        # query aux is lane-major [4, bo] (bo = 128-multiple, clean layout).
        # Relayout lanes->sublanes first, THEN 2-D-slice to b_pad rows:
        # fusing both into one indexing op lowers to a gather Mosaic rejects.
        b_pad = q.shape[0]

        def _qcol(row):
            col = qaux_ref[row, :][:, None]  # [bo, 1]
            if b_pad < col.shape[0]:
                col = jax.lax.slice(col, (0, 0), (b_pad, 1))
            return col

        q_inv = _qcol(0)
        q_sq = _qcol(1)
        q_ok = _qcol(2)

        if metric is Metric.Cosine:
            scores = dots * q_inv * inv
        elif metric is Metric.Euclidean:
            scores = q_sq + nsq - 2.0 * dots
        else:
            scores = dots

        ok = (rmask > 0.0) & (q_ok > 0.0) & ~jnp.isnan(scores)
        if cmp is not None:
            ok = ok & _filter_ok(scores, thr_ref[0], cmp)
        key = jnp.where(ok, scores, jnp.inf if take_min else -jnp.inf)
        if take_min:
            key = -key
        if certify:
            # fold the PER-ROW certificate slack into the key before the
            # bin-max reduce: the bin maxima then bound max(score + slack)
            # per bin directly — strictly tighter than the r4
            # max(score) + max(resid) composition — and selecting bins by
            # this adjusted key provably minimizes the resulting bound
            # (the unselected bins are exactly the smallest adjusted
            # maxima). The generalized slack is
            #   c0(q) + c1(q)*lane_a(row) + c2(q)*||v_row|| + lane_b(row)
            # (scoring.cert_query_coeffs / cert_row_lanes); for take_min
            # (Euclidean) the key is already negated, so the slack still
            # ADDS — the bound is then on the negated key, i.e. a lower
            # bound on the true distance. Masked rows stay -inf.
            la = aux_ref[3, :][None, :]
            if cert_cos:
                # Cosine specialization (c1 = 1, c2 = 0, lane_b = 0): the
                # per-row fold is ONE VPU add. c0(q) is constant per query
                # lane, so phase 2 adds it to the bin maxima instead —
                # max is monotone, so max(key + la) + c0 is bit-identical
                # to folding c0 here, at a fraction of the VPU work
                # (measured ~1.4x certified scan tax at 10M before this,
                # vs the ~1.16x bf16-vs-int8 MXU-rate floor).
                key = key + la
            else:
                lb = aux_ref[4, :][None, :]
                vn = jnp.sqrt(nsq)
                key = key + _qcol(3) + _qcol(4) * la + _qcol(5) * vn + lb
        for j in range(nb):
            m = jnp.max(key[:, j * BIN : (j + 1) * BIN], axis=1)  # [b_pad]
            if bo > b_pad:  # pad to the 128-lane output block
                m = jnp.concatenate(
                    [m, jnp.full((bo - b_pad,), -jnp.inf, dtype=m.dtype)]
                )
            out_ref[0, j, :] = m

    # dead steps write NOTHING: their out block aliases the last live step's
    # (see out_specs index_map), so pruned tiles cost no DMA, no MXU and no
    # VPU fill — phase 2 masks the never-written slots by survivor count


def fast_ok(metric: Metric, take_min: bool, cmp, k: int, prec: str) -> bool:
    """Is the verified fast-exact mode applicable?

    All MXU metrics qualify: Cosine scores are norm-scaled so the bf16_3x
    error bound is the dimension-only constant ``high_precision_bound(d)``;
    DotProduct/Euclidean carry a norm-scaled slack (bound * max||q|| *
    max||v||, doubled for the -2*dot term) computed on device. Eq score
    filters need two-sided slack and are excluded; large k makes the 4k-bin
    candidate set expensive; the VPU metrics never touch the MXU."""
    return (
        prec == "highest"
        and metric not in VPU_METRICS
        and cmp is not Cmp.Eq
        and k <= 128
    )


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "take_min", "cmp", "prec", "interpret", "fast",
        "certify",
    ),
)
def _pallas_topk_jit(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    tile_alive,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str = "highest",
    interpret: bool = False,
    fast: bool = False,
    q_valid=None,
    certify: bool = False,
    resid=None,
    resid_bin=None,
):
    """Fused pruned scoring + exact top-k.

    tile_alive: [n_tiles] bool — False tiles are skipped entirely (no DMA,
    no MXU). Soundness requires that every row of a dead tile fails
    ``row_mask`` (zonemap pruning guarantees this; see ops/predicate.py).

    fast=True (verified fast-exact, cosine only): phase 1 runs the MXU at
    Precision.HIGH (bf16_3x, ~2.3x faster) with the score filter loosened by
    the sound error bound C = high_precision_bound(d); 4k candidate bins are
    selected by HIGH bin-max and re-scored exactly at HIGHEST. The returned
    ``check`` flag certifies the result: it is True iff the k-th exact score
    beats every unselected bin's HIGH max plus C — then no unexamined row
    can belong to the true top-k. On False, callers re-run with fast=False.

    certify=True (quantized storage: int8+Cosine, or bfloat16 with
    Cosine/Dot take-max / Euclidean take-min): additionally returns a sound
    bound — in the selection-KEY space, i.e. negated for take_min — on the
    TRUE f32 score of every row NOT in the returned candidate set. Callers
    compare it against the k-th exact rerank key to certify recall 1.0 by
    construction (see MetaQueryPlan.take(k, rerank_from=...)). The scan
    runs MIXED (bf16-rounded unquantized queries x stored rows) and folds
    the full per-(query, row) slack
        c0(q) + c1(q)*lane_a(row) + c2(q)*||v_row|| + lane_b(row)
    (scoring.cert_query_coeffs / cert_row_lanes; ``resid`` is the stored
    per-row residual the lanes derive from, with arithmetic headroom inside
    c0) into the phase-1 bin maxima AND the phase-2 per-row keys, selecting
    candidates by the adjusted key — which provably minimizes the bound.
    With a Gt/Gte (or Lt/Lte for take_min) score filter the scan threshold
    is loosened by the global slack so no truly passing row is excluded by
    its scan score.

    Returns (rows[k], scores[k], valid[k], check, bound).
    """
    n_pad, d = vectors.shape
    b = queries.shape[0]
    int8_mode = vectors.dtype == jnp.int8
    q_kern = None
    c0 = c1 = c2 = lane_a = lane_b = None
    if certify:
        if int8_mode:
            assert metric is Metric.Cosine and not take_min
            assert cmp in (None, Cmp.Gt, Cmp.Gte)
        else:
            assert vectors.dtype == jnp.bfloat16
            if metric is Metric.Euclidean:
                assert take_min and cmp in (None, Cmp.Lt, Cmp.Lte)
            else:
                assert not take_min and cmp in (None, Cmp.Gt, Cmp.Gte)
        assert resid is not None and resid_bin is not None
        # fast (bf16_3x) and certify are disjoint modes: the branches below
        # are mutually exclusive
        assert not fast
        # MIXED certified scan: round the queries ONCE to bf16 and keep
        # them unquantized — the query-side certificate term shrinks from
        # int8 quantization (~1e-2, half the r4 slack) to bf16 rounding
        # (~2e-3), folded into c0 exactly per query. The MXU runs
        # bf16-query x stored-row dots (int8 codes are exact in bf16).
        from .scoring import cert_query_coeffs, cert_row_lanes

        qh32, c0, c1, c2 = cert_query_coeffs(metric, queries, d)
        q_kern = qh32.astype(jnp.bfloat16)
        queries = qh32  # for norms / qaux
        lane_a, lane_b = cert_row_lanes(
            metric, vectors.dtype, resid, inv_norms, norms_sq, d
        )
    elif int8_mode:
        # uncertified quantized-cosine: symmetric int8 queries; both
        # phases run native int8 x int8 -> int32 MXU dots (exact at any d)
        from .scoring import _quantize_rows_int8

        q_kern, _, _ = _quantize_rows_int8(queries)
        queries = q_kern.astype(jnp.float32)  # for norms / qaux only
    b_pad = _pad_b(b)
    bo = _round_up(b_pad, LANE)  # output block lane width
    # the tile size is defined by the caller through tile_alive's length
    # (choose_tile picks it, possibly chunk-aligned); the kernel just
    # honors it — smaller-than-budget tiles are always VMEM-safe
    n_tiles = tile_alive.shape[0]
    if n_tiles <= 0 or n_pad % n_tiles != 0 or (n_pad // n_tiles) % BIN != 0:
        raise ValueError(
            f"tile_alive has {n_tiles} tiles for n_pad={n_pad}; the implied "
            f"tile size must be a positive multiple of {BIN} that divides "
            f"n_pad — compute it with choose_tile(d, n_pad, _pad_b(b))"
        )
    t = n_pad // n_tiles
    # validate the implied tile against the same VMEM bound pallas_ok gates
    # on: a too-short tile_alive would otherwise surface as an opaque
    # scoped-VMEM Mosaic error at compile time
    vmem = b_pad * d * 4 + 2 * t * d * 4 + 3 * t * b_pad * 4
    if vmem > 13 * (1 << 20):
        raise ValueError(
            f"implied tile {t} ({n_tiles} tiles over n_pad={n_pad}) needs "
            f"~{vmem >> 20} MB of scoped VMEM (> 13 MB budget); compute the "
            f"tile with choose_tile(d, n_pad, _pad_b(b))"
        )
    nb = t // BIN

    q_sq, q_inv = _query_norms(queries)
    if fast:
        assert fast_ok(metric, take_min, cmp, k, prec)
        base = high_precision_bound(d)
        if metric is Metric.Cosine:
            # cosine is norm-scaled: the bound is dimension-only
            slack = jnp.float32(base)
        else:
            # |dot_HIGH - dot| <= base * ||q|| * ||v||; bound globally by the
            # max norms (computed on device, one reduction each). Euclidean
            # doubles it for the -2*dot term (q^2/v^2 are bit-identical in
            # both phases and cancel).
            qmax = jnp.sqrt(jnp.max(q_sq))
            vmax = jnp.sqrt(jnp.max(norms_sq))
            mult = 2.0 if metric is Metric.Euclidean else 1.0
            slack = jnp.float32(base) * qmax * vmax * mult
        prec1 = "high"
        # loosen the phase-1 score filter by the error bound so no row that
        # truly passes can be excluded by HIGH-precision scores
        if cmp in (Cmp.Gt, Cmp.Gte):
            thr1 = thr - slack
        elif cmp in (Cmp.Lt, Cmp.Lte):
            thr1 = thr + slack
        else:
            thr1 = thr
    elif certify:
        from .scoring import cert_global_slack

        # global slack: covers any (query, row) pair — used ONLY to loosen
        # the score filter (the bound itself uses the per-query/per-row
        # fold)
        slack_g = cert_global_slack(
            c0, c1, c2, lane_a, lane_b, norms_sq, q_valid=q_valid
        )
        slack = jnp.float32(0.0)
        prec1 = prec
        if cmp in (Cmp.Gt, Cmp.Gte):
            # no row whose TRUE score passes thr may be dropped by its
            # scan score: scan >= true - slack_g > thr - slack_g
            thr1 = thr - slack_g
        elif cmp in (Cmp.Lt, Cmp.Lte):
            thr1 = thr + slack_g
        else:
            thr1 = thr
    else:
        slack = jnp.float32(0.0)
        prec1 = prec
        thr1 = thr
    if q_kern is not None:
        q_pad = jnp.zeros((b_pad, d), q_kern.dtype).at[:b].set(q_kern)
    else:
        q_pad = jnp.zeros((b_pad, d), jnp.float32).at[:b].set(queries)
    # cosine-specialized certificate fold: c1 = 1, c2 = 0, lane_b = 0, and
    # the per-query c0 is hoisted to phase 2 (see _kernel), so the kernel
    # needs neither the coefficient qaux rows nor the lane_b aux row
    cert_cos = certify and metric is Metric.Cosine
    nqa = 6 if (certify and not cert_cos) else 4
    qaux = jnp.zeros((nqa, bo), jnp.float32)
    qaux = qaux.at[0, :b].set(q_inv).at[1, :b].set(q_sq)
    # q_ok lane: padded batch rows AND caller-invalid queries (e.g. batch-
    # axis padding inside shard_map) never contribute candidates
    qaux = qaux.at[2, :b].set(
        1.0 if q_valid is None else q_valid.astype(jnp.float32)
    )
    if certify and not cert_cos:
        # per-query certificate coefficients ride the qaux tile
        qaux = qaux.at[3, :b].set(c0).at[4, :b].set(c1).at[5, :b].set(c2)

    rmask01 = valid.astype(jnp.float32)
    if row_mask is not None:
        rmask01 = rmask01 * row_mask.astype(jnp.float32)
    aux_rows = [
        inv_norms[None, :],
        norms_sq[None, :],
        rmask01[None, :],
    ]
    if cert_cos:
        # per-row certificate lane rides the aux tile so phase 1 can fold
        # it into the bin max (0 on padding rows); lane_b is identically 0
        # for cosine, so the aux block stays the uncertified 4 rows
        aux_rows.append(lane_a[None, :])
    elif certify:
        # general fold: both per-row lanes ride the aux tile
        aux_rows += [lane_a[None, :], lane_b[None, :]]
    else:
        aux_rows.append(jnp.zeros((1, n_pad), jnp.float32))
    aux = jnp.concatenate(aux_rows, axis=0)
    na = aux.shape[0]

    # survivor tile list: surv[g] = index of the g-th alive tile, computed
    # with a vectorized binary search over the alive-count cumsum (argsort
    # and scatter both cost milliseconds on TPU even at this tiny size)
    alive_i = tile_alive.astype(jnp.int32)
    n_surv = alive_i.sum()
    cs = jnp.cumsum(alive_i)
    g = jnp.arange(n_tiles, dtype=jnp.int32)
    surv_raw = jnp.searchsorted(cs, g + 1, side="left").astype(jnp.int32)
    last = jnp.searchsorted(cs, jnp.maximum(n_surv, 1), side="left").astype(
        jnp.int32
    )
    # clamp: with n_surv == 0 searchsorted returns n_tiles, which would make
    # the BlockSpec index_map DMA out of bounds; every step is dead then, so
    # tile 0 is fetched (and ignored) instead
    surv = jnp.clip(jnp.where(g < n_surv, surv_raw, last), 0, n_tiles - 1)

    # dead grid steps (g >= n_surv) alias the LAST live step's output block:
    # Pallas defers the copy-out while the block index is unchanged, so the
    # pruned tail costs only grid bookkeeping. Their slots are never written
    # (garbage) and phase 2 masks them by survivor count.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda g, s, n, th: (0, 0)),
            pl.BlockSpec((t, d), lambda g, s, n, th: (s[g], 0)),
            pl.BlockSpec((na, t), lambda g, s, n, th: (0, s[g])),
            pl.BlockSpec((nqa, bo), lambda g, s, n, th: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, nb, bo),
            lambda g, s, n, th: (
                jnp.minimum(g, jnp.maximum(n[0] - 1, 0)), 0, 0,
            ),
        ),
    )
    bins = pl.pallas_call(
        partial(
            _kernel, metric=metric, take_min=take_min, cmp=cmp, prec=prec1,
            nb=nb, bo=bo, certify=certify, cert_cos=cert_cos,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, nb, bo), jnp.float32),
        interpret=interpret,
    )(
        surv,
        n_surv.reshape(1),
        thr1.reshape(1),
        q_pad,
        vectors,
        aux,
        qaux,
    )

    # ---- phase 2 (XLA): winner-bin gather + exact rescore ----
    if cert_cos:
        # cosine fold, phase-2 half: the kernel folded only the per-row
        # lane_a; add the per-query c0 to the bin maxima here. max is
        # monotone, so max(key + la) + c0 == max(key + la + c0) bit-exactly
        # — the bin SELECTION below still ranks by the fully adjusted key,
        # preserving the minimal-bound property. (-inf lanes stay -inf.)
        bins = bins + jnp.zeros((bo,), jnp.float32).at[:b].set(c0)[None, None, :]
    flat = bins.reshape(-1)  # [n_tiles * nb * bo], slot -> (g, j, q)
    n_slots = flat.shape[0]
    # slots of dead grid steps were never written (garbage, possibly NaN);
    # mask them BEFORE the top-k so they cannot displace real candidates
    slot_g = jnp.arange(n_slots, dtype=jnp.int32) // (nb * bo)
    flat = jnp.where(slot_g < n_surv, flat, -jnp.inf)
    if fast:
        kb = min(4 * k, n_slots)
        sel_n = min(kb + 1, n_slots)
        top_vals, top_all = exact_topk_flat(flat, sel_n)
        if sel_n > kb:
            boundary = top_vals[-1]  # best HIGH bin-max left unexamined
            top_slots = top_all[:kb]
        else:
            boundary = jnp.float32(-jnp.inf)  # every bin examined
            top_slots = top_all
            kb = sel_n
    else:
        kb = min(k, n_slots)
        boundary = jnp.float32(-jnp.inf)
        _, top_slots = exact_topk_flat(flat, kb)
    bound1 = jnp.float32(-jnp.inf)
    if certify:
        # phase-1 term of the certificate: the bin maxima already carry the
        # FULL per-(query, row) slack (folded in-kernel), so an unselected
        # bin's max directly bounds the true score of any row it holds (in
        # the key space: negated for take_min).
        bound1 = jnp.max(flat.at[top_slots].set(-jnp.inf))
    gsel = top_slots // (nb * bo)
    jsel = (top_slots // bo) % nb
    qsel = top_slots % bo
    # lanes past b_pad are -inf fill; clamp the gather (those slots are
    # masked out below via qsel < b)
    qsel_c = jnp.minimum(qsel, b_pad - 1)
    tile_sel = surv[gsel]  # slot -> actual tile index

    # Every winner bin is a CONTIGUOUS, BIN-aligned run of rows. A plain
    # vectors[rows] gather makes XLA lower a per-row gather (~2.7 ms for
    # 100 bins of 512x768 int8 at 10M rows on v5e); a scan of
    # dynamic_slices keeps each bin's DMA contiguous (~1.8 ms measured) and
    # picks up the per-row aux arrays (inv-norms, norms, validity, row
    # mask) in the same pass, avoiding four more 51k-element gathers.
    # Per-bin numerics are identical to the previous batched formulation:
    # each batch element was an independent dot product already.
    starts = tile_sel * t + jsel * BIN  # [kb]
    rows_flat = (
        starts[:, None] + jnp.arange(BIN, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    q_cand = q_pad[qsel_c]  # [kb, d]

    def _bin_gather():
        # batched-gather formulation for LARGE candidate-bin counts: the
        # sequential dynamic-slice scan wins at ~100 bins (contiguous DMAs),
        # but serializes kb steps — thousands of them at large k would
        # dominate. One row gather + one batched MXU contraction instead.
        blk = vectors[rows_flat].reshape(kb, BIN, d)
        dn_b = (((1,), (2,)), ((0,), (0,)))
        if int8_mode and certify:
            # mixed rescore: bf16 queries x int8-as-bf16 rows, f32 acc —
            # same arithmetic class as phase 1 (covered by mixed_cert_eps)
            dd = jax.lax.dot_general(
                q_cand,
                blk.astype(jnp.bfloat16),
                dn_b,
                preferred_element_type=jnp.float32,
            )
        elif int8_mode:
            dd = jax.lax.dot_general(
                q_cand, blk, dn_b, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        else:
            dd = jax.lax.dot_general(
                q_cand,
                blk.astype(jnp.float32),
                dimension_numbers=dn_b,
                preferred_element_type=jnp.float32,
                precision=_precision(prec),
            )
        out = (
            dd,
            inv_norms[rows_flat].reshape(kb, BIN),
            norms_sq[rows_flat].reshape(kb, BIN),
            valid[rows_flat].reshape(kb, BIN),
        )
        if row_mask is not None:
            out = out + (row_mask[rows_flat].reshape(kb, BIN),)
        if cert_cos:
            out = out + (lane_a[rows_flat].reshape(kb, BIN),)
        elif certify:
            out = out + (
                lane_a[rows_flat].reshape(kb, BIN),
                lane_b[rows_flat].reshape(kb, BIN),
            )
        return out

    def _bin_slices(carry, sq):
        s, qr = sq
        blk = jax.lax.dynamic_slice(vectors, (s, 0), (BIN, d))
        if int8_mode and certify:
            # mixed rescore (see _bin_gather)
            dd = jax.lax.dot_general(
                qr[None, :],
                blk.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
        elif int8_mode:
            # exact int32 accumulation, matching phase 1 + the XLA int8 path
            dd = jax.lax.dot_general(
                qr[None, :],
                blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )[0].astype(jnp.float32)
        else:
            dd = jax.lax.dot_general(
                qr[None, :],
                blk.astype(jnp.float32),  # bf16 storage upcasts here
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(prec),
            )[0]
        out = (
            dd,
            jax.lax.dynamic_slice(inv_norms, (s,), (BIN,)),
            jax.lax.dynamic_slice(norms_sq, (s,), (BIN,)),
            jax.lax.dynamic_slice(valid, (s,), (BIN,)),
        )
        if row_mask is not None:
            out = out + (jax.lax.dynamic_slice(row_mask, (s,), (BIN,)),)
        if cert_cos:
            out = out + (jax.lax.dynamic_slice(lane_a, (s,), (BIN,)),)
        elif certify:
            out = out + (
                jax.lax.dynamic_slice(lane_a, (s,), (BIN,)),
                jax.lax.dynamic_slice(lane_b, (s,), (BIN,)),
            )
        return carry, out

    if kb > PHASE2_SCAN_MAX_BINS:
        sliced = _bin_gather()
    else:
        _, sliced = jax.lax.scan(_bin_slices, 0, (starts, q_cand))
    dots, inv_rows, nsq_rows, ok = sliced[:4]
    if metric is Metric.Cosine:
        scores = dots * q_inv_pad(q_inv, b_pad)[qsel_c][:, None] * inv_rows
    elif metric is Metric.Euclidean:
        scores = q_sq_pad(q_sq, b_pad)[qsel_c][:, None] + nsq_rows - 2.0 * dots
    else:
        scores = dots

    if row_mask is not None:
        ok = ok & sliced[4]
    # slots from dead grid steps alias the last alive tile through surv;
    # without this guard they could re-contribute (duplicate) its rows
    ok = ok & (gsel < n_surv)[:, None]
    ok = ok & (qsel[:, None] < b) & ~jnp.isnan(scores)
    if q_valid is not None:
        qv_pad = jnp.zeros((b_pad,), jnp.bool_).at[:b].set(q_valid)
        ok = ok & qv_pad[qsel_c][:, None]
    if cmp is not None:
        # certify: phase-2 scores are still approximate — keep the loosened
        # threshold so no truly passing row is dropped before the rerank
        ok = ok & _filter_ok(scores, thr1 if certify else thr, cmp)
    adj2 = None
    if certify:
        # select the k candidates by the ADJUSTED key (scan key + the full
        # per-(query, row) slack): the unreturned rows are then exactly
        # the smallest adjusted values, which provably minimizes the
        # resulting bound. The rerank re-scores candidates in exact f32, so
        # selection order does not affect result exactness — only how often
        # the certificate passes at a given scan width.
        c0p = jnp.zeros((bo,), jnp.float32).at[:b].set(c0)[qsel_c][:, None]
        base = -scores if take_min else scores
        if cert_cos:
            # cosine: slack = c0(q) + lane_a(row); same association order
            # as the general fold with c1 = 1, c2 = 0, lane_b = 0
            laneA_r = sliced[-1]
            adj = base + c0p + laneA_r
        else:
            laneA_r, laneB_r = sliced[-2], sliced[-1]
            vn_r = jnp.sqrt(nsq_rows)
            c1p = jnp.zeros((bo,), jnp.float32).at[:b].set(c1)[qsel_c][:, None]
            c2p = jnp.zeros((bo,), jnp.float32).at[:b].set(c2)[qsel_c][:, None]
            adj = base + c0p + c1p * laneA_r + c2p * vn_r + laneB_r
        adj2 = jnp.where(ok, adj, -jnp.inf)
        key = adj2
    else:
        key = jnp.where(ok, scores, jnp.inf if take_min else -jnp.inf)
        if take_min:
            key = -key
    key_flat = key.reshape(-1)
    top_keys, sel = jax.lax.top_k(key_flat, min(k, key_flat.shape[0]))
    out_rows = rows_flat[sel].astype(jnp.int32)
    out_scores = scores.reshape(-1)[sel]
    out_ok = ok.reshape(-1)[sel]
    if fast:
        # certify: the k-th exact score must beat anything a skipped bin
        # could hold (its HIGH max plus the sound bound)
        check = top_keys[-1] >= boundary + slack
    else:
        check = jnp.bool_(True)
    if certify:
        # phase-2 term: examined rows NOT returned as candidates, with
        # their own per-row slacks (tighter than the bin max). The
        # arithmetic headroom lives inside c0, so nothing is added here.
        # The bound is in the KEY space: an upper bound on score-like
        # metrics, the NEGATED lower bound on the true distance for
        # take_min (callers compare the k-th exact key against it).
        adj2f = adj2.reshape(-1).at[sel].set(-jnp.inf)
        bound = jnp.maximum(bound1, jnp.max(adj2f))
    else:
        bound = jnp.float32(-jnp.inf)
    return out_rows, out_scores, out_ok, check, bound


def q_inv_pad(q_inv, b_pad):
    return jnp.zeros((b_pad,), jnp.float32).at[: q_inv.shape[0]].set(q_inv)


def q_sq_pad(q_sq, b_pad):
    return jnp.zeros((b_pad,), jnp.float32).at[: q_sq.shape[0]].set(q_sq)


def interpret_forced() -> bool:
    """OTTERS_PALLAS_INTERPRET=1 runs the kernel in interpret mode on any
    backend — used by CPU test meshes to exercise the exact pallas paths."""
    import os

    return bool(os.environ.get("OTTERS_PALLAS_INTERPRET"))


def pallas_topk(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    tile_alive,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str = "highest",
    interpret: bool = False,
    fast: bool = False,
    q_valid=None,
    certify: bool = False,
    resid=None,
    resid_bin=None,
):
    """Public entry: resolves OTTERS_PALLAS_INTERPRET OUTSIDE the jit so the
    flag participates in the jit cache key (reading it inside the traced
    function would bake the first call's value into every later call).
    See _pallas_topk_jit for the kernel documentation."""
    return _pallas_topk_jit(
        vectors,
        norms_sq,
        inv_norms,
        valid,
        queries,
        row_mask,
        thr,
        tile_alive,
        metric=metric,
        k=k,
        take_min=take_min,
        cmp=cmp,
        prec=prec,
        interpret=interpret or interpret_forced(),
        fast=fast,
        q_valid=q_valid,
        certify=certify,
        resid=resid,
        resid_bin=resid_bin,
    )


def pallas_ok(n_pad: int, d: int, b: int, k: int) -> bool:
    """Can the fused kernel handle this shape on the current backend?"""
    import os

    if os.environ.get("OTTERS_DISABLE_PALLAS"):
        return False
    try:
        if jax.devices()[0].platform != "tpu" and not interpret_forced():
            return False
    except Exception:
        return False
    if k > PALLAS_K_MAX or n_pad % BIN != 0:
        return False
    b_pad = _pad_b(b)
    t = choose_tile(d, n_pad, b_pad)
    if n_pad % t != 0:
        return False
    # rough VMEM budget: queries + double-buffered vector tile + score/key
    vmem = b_pad * d * 4 + 2 * t * d * 4 + 3 * t * b_pad * 4
    return vmem <= 13 * (1 << 20)


def tiles_alive_from_chunk_mask(chunk_mask, chunk_size: int, n_pad: int, tile: int):
    """[n_chunks] chunk mask -> [n_tiles] tile-alive flags (OR of overlaps).

    Computed as an interval-overlap matrix reduction: jnp.repeat to row
    granularity lowers to a ~10 ms gather on TPU, while the
    [n_tiles, n_chunks] overlap test is a sub-millisecond VPU pass.
    """
    n_chunks = chunk_mask.shape[0]
    n_tiles = n_pad // tile
    t_start = jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * tile
    c_start = jnp.arange(n_chunks, dtype=jnp.int32)[None, :] * chunk_size
    overlap = (c_start < t_start + tile) & (c_start + chunk_size > t_start)
    return jnp.any(overlap & chunk_mask[None, :], axis=1)
