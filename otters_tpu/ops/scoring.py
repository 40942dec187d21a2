"""Batched scoring + exact global top-k: the TPU hot path.

This module replaces the reference's entire SIMD scoring stack — the 8-lane
distance kernels (``src/vec_compute.rs:9-54``), the streaming ``TopKCollector``
with its fused filter/effective-threshold logic (``vec_compute.rs:77-294``) and
the 8-row block loop (``src/vec.rs:222-267``) — with two XLA programs:

1. **direct path** (small B*N): one MXU matmul producing the `[B, N]` score
   matrix, fused masking (validity, row mask, score filter, NaN drop), then a
   single `lax.top_k` over the flattened candidates. All queries merge into
   one global top-k, matching the reference's single-collector semantics
   (``vec.rs:217-219``).

2. **streaming path** (large N): `lax.scan` over row tiles; each step scores
   one `[B, TILE]` block on the MXU and merges it into a carried top-k buffer
   *only when the block can improve the current k-th best* — the TPU analog
   of the reference's effective-threshold early-out (``vec_compute.rs:96-165``).
   The `[B, N]` score matrix is never materialized in HBM, so the scan is
   HBM-bandwidth-bound on reading the vectors exactly once.

Scores are f32 with HIGHEST MXU precision by default (exact search contract);
"default" / "bf16" precision are available as speed knobs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import OttersError
from ..types import VPU_METRICS, Cmp, Metric

# Rows are padded to a multiple of SCAN_TILE for large stores so the scan can
# reshape [N, D] -> [n_tiles, TILE, D] without remainder handling.
SCAN_TILE = 8192
# Largest flattened candidate count (B * N_pad) handled by the direct path.
DIRECT_LIMIT = 1 << 22
SMALL_PAD = 128
# Mid-size stores pad to a PANEL_BIN multiple so the panel path is always
# eligible when a big query batch pushes b * n_pad past DIRECT_LIMIT.
MID_PAD = 512


class DeviceVecs(NamedTuple):
    """Device-resident vector store (reference VecStore, vec.rs:338-344).

    vectors  : [N_pad, D] float32 (or bfloat16) in HBM
    norms_sq : [N_pad]    float32, squared L2 norms (0 for padding)
    inv_norms: [N_pad]    float32, 1/||v|| with 0 for zero-norm rows
                (matches vec.rs:365-367)
    valid    : [N_pad]    bool, False for padding rows

    int8 stores additionally carry sound per-row quantization-residual
    bounds (the certified-exact machinery; see int8 certification notes in
    ops/pallas_topk.py):

    resid    : [N_pad] f32, >= ||v/||v|| - v8/||v8|||| per row (0 padding)
    resid_bin: [N_pad/512] f32, per-512-row-bin max of resid (None when
               N_pad is not 512-aligned — the pallas path is ineligible
               there anyway)
    resid_max: [] f32 scalar, max over valid rows
    """

    vectors: jax.Array
    norms_sq: jax.Array
    inv_norms: jax.Array
    valid: jax.Array
    resid: Optional[jax.Array] = None
    resid_bin: Optional[jax.Array] = None
    resid_max: Optional[jax.Array] = None


def pad_rows(n: int) -> int:
    """Padded row count for a store of n vectors."""
    if n > DIRECT_LIMIT // 8:  # large store: align to the scan tile
        tile = SCAN_TILE
    elif n > 4096:
        tile = MID_PAD
    else:
        tile = SMALL_PAD
    return max(tile, -(-n // tile) * tile)


def materialize(vectors_np: np.ndarray, dtype=jnp.float32) -> DeviceVecs:
    """Ship an [n, d] host array to HBM with norms computed on device."""
    n, d = vectors_np.shape
    n_pad = pad_rows(n)
    host = np.zeros((n_pad, d), dtype=np.float32)
    host[:n] = vectors_np
    if dtype == jnp.int8:
        return _materialize_int8(jnp.asarray(host), n)
    if dtype == jnp.bfloat16:
        return _materialize_bf16(jnp.asarray(host), n)
    vecs = jnp.asarray(host, dtype=dtype)
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    norms_sq, inv_norms = _device_norms(vecs)
    return DeviceVecs(vecs, norms_sq, inv_norms, valid)


def _materialize_bf16(vecs_f32: jax.Array, n_valid: int) -> DeviceVecs:
    """bfloat16 storage with per-row ABSOLUTE rounding residuals attached:
    2x less HBM than f32, and the exactness certificate covers Cosine, Dot
    AND Euclidean on it (resid = ||v - bf16(v)||; see cert_row_lanes)."""
    n_pad = vecs_f32.shape[0]
    vecs = vecs_f32.astype(jnp.bfloat16)
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n_valid
    norms_sq, inv_norms = _device_norms(vecs)
    resid = jnp.where(valid, bf16_abs_resid(vecs_f32), 0.0)
    rbin, rmax = finalize_resid(resid)
    return DeviceVecs(vecs, norms_sq, inv_norms, valid, resid, rbin, rmax)


def _materialize_int8(vecs_f32: jax.Array, n_valid: int) -> DeviceVecs:
    """Quantized cosine storage: per-row symmetric int8.

    Cosine is scale-invariant, so per-row quantization scales cancel: the
    stored norms are those of the QUANTIZED rows and queries are quantized
    at dispatch (see _score_block). 4x less HBM than f32; approximate
    (recall measured ~0.9+ at top-10 on random data — use
    otters_tpu.evaluate.recall_at_k to quantify on your data). Cosine-only.
    """
    n_pad = vecs_f32.shape[0]
    v8, norms_sq, inv, resid = _quantize_rows_int8_resid(vecs_f32)
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n_valid
    resid = jnp.where(valid, resid, 0.0)
    rbin, rmax = finalize_resid(resid)
    return DeviceVecs(v8, norms_sq, inv, valid, resid, rbin, rmax)


@jax.jit
def _quantize_rows_int8(vecs):
    amax = jnp.max(jnp.abs(vecs), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    v8 = jnp.clip(jnp.round(vecs / scale), -127, 127).astype(jnp.int8)
    v8f = v8.astype(jnp.float32)
    norms_sq = jnp.sum(v8f * v8f, axis=1)
    norms = jnp.sqrt(norms_sq)
    inv = jnp.where(norms != 0.0, 1.0 / norms, 0.0)
    return v8, norms_sq, inv


# certificate bin width; must equal ops.pallas_topk.BIN (asserted there)
CERT_BIN = 512


def unit_resid(a32, b32, inv_a, inv_b):
    """Sound per-row bound on ||a/||a|| - b/||b|||| in f32.

    Computed as the direct norm of the unit-vector difference (NOT via
    sqrt(2-2cos), whose cancellation near cos=1 amplifies the f32 rounding
    of the cosine by 1/resid). Forward error: forming u costs ~2 ulp per
    element relative to the ELEMENT magnitudes (O(1/sqrt(d))), the
    sum-of-squares accumulates gamma_d ~ d*2^-24 relative; both are covered
    by the (1 + 1e-4) inflation + 1e-6 floor. Zero-norm rows (either side)
    get 0: both score paths define their cosine as 0 exactly."""
    u = a32 * inv_a[:, None] - b32 * inv_b[:, None]
    r = jnp.sqrt(jnp.sum(u * u, axis=1))
    zero = (inv_a == 0.0) | (inv_b == 0.0)
    return jnp.where(zero, 0.0, r * jnp.float32(1.0 + 1e-4) + jnp.float32(1e-6))


@jax.jit
def _quantize_rows_int8_resid(vecs):
    """Quantize + sound per-row residual bound (certified-exact int8)."""
    v8, norms_sq, inv8 = _quantize_rows_int8(vecs)
    v32 = vecs.astype(jnp.float32)
    nv = jnp.sqrt(jnp.sum(v32 * v32, axis=1))
    inv_v = jnp.where(nv != 0.0, 1.0 / nv, 0.0)
    resid = unit_resid(v32, v8.astype(jnp.float32), inv_v, inv8)
    return v8, norms_sq, inv8, resid


@jax.jit
def bf16_query_unit_resid(queries):
    """[B] sound bounds on the bf16-ROUNDED query residual (mixed scan).

    The certified scan does not quantize queries to int8 at all: it rounds
    them once to bfloat16 and runs bf16-query x int8-row MXU dots (int8
    codes are exactly representable in bf16, so the row side contributes
    only its stored quantization residual). This bound covers the query
    side: ||q/||q|| - qh/||qh|||| for qh = bf16(q), ~2^-9 instead of the
    ~1e-2 int8 quantization residual — the dominant term VERDICT r4 found
    in the certificate slack. Queries that are nonzero in f32 but round to
    bf16 zero (all-subnormal rows) get the trivially sound bound 2.0."""
    q32 = jnp.asarray(queries, dtype=jnp.float32)
    qh32 = q32.astype(jnp.bfloat16).astype(jnp.float32)
    nq = jnp.sqrt(jnp.sum(q32 * q32, axis=1))
    inv_q = jnp.where(nq != 0.0, 1.0 / nq, 0.0)
    nh = jnp.sqrt(jnp.sum(qh32 * qh32, axis=1))
    inv_h = jnp.where(nh != 0.0, 1.0 / nh, 0.0)
    r = unit_resid(q32, qh32, inv_q, inv_h)
    return jnp.where((inv_q != 0.0) & (inv_h == 0.0), jnp.float32(2.0), r)


def finalize_resid(resid):
    """-> (resid_bin | None, resid_max) from a [N_pad] residual array."""
    n_pad = resid.shape[0]
    rmax = jnp.max(resid) if n_pad else jnp.float32(0.0)
    rbin = None
    if n_pad and n_pad % CERT_BIN == 0:
        rbin = jnp.max(resid.reshape(-1, CERT_BIN), axis=1)
    return rbin, rmax


def mixed_cert_eps(d: int) -> float:
    """Arithmetic headroom for the MIXED certified scan (bf16 queries x
    int8/bf16 rows, f32 accumulation).

    bf16 x bf16 products are exact in f32 (8+8 significand bits < 24); the
    MXU accumulates in f32 with forward error <= gamma_d * ||q||*||v||
    (gamma_d ~= d * 2^-24, any accumulation order), the two inv-norm
    multiplies cost ~4 ulp of a score <= 1, and the f32-computed inverse
    norms carry ~gamma_d relative error each. Doubled again for the
    f32-HIGHEST rerank arithmetic the certificate compares against."""
    return 4.0 * d * 2.0**-24 + 4.0e-6


def bf16_abs_resid(vecs_f32):
    """[N] sound per-row bounds on ||v - bf16(v)|| (ABSOLUTE residual).

    v - bf16(v) is EXACT in f32 per element (the two values are within a
    factor of 2, Sterbenz); the sum-of-squares accumulates gamma_d
    relative error, covered by the inflation. Rows exactly representable
    in bf16 get a true 0 (zero slack is legitimate there)."""
    v32 = vecs_f32.astype(jnp.float32)
    vb = v32.astype(jnp.bfloat16).astype(jnp.float32)
    u = v32 - vb
    r = jnp.sqrt(jnp.sum(u * u, axis=1))
    d = v32.shape[1]
    return r * jnp.float32(1.0 + max(1e-4, 4.0 * d * 2.0**-24))


def bf16_query_abs(queries):
    """-> (qh32, e_qa[B], hq[B]): the bf16-rounded queries (as f32), a sound
    bound on ||q - qh|| per query, and ||qh|| per query — the query-side
    ingredients of the Dot/Euclidean certificate coefficients."""
    q32 = jnp.asarray(queries, dtype=jnp.float32)
    qh32 = q32.astype(jnp.bfloat16).astype(jnp.float32)
    u = q32 - qh32  # exact per element (within a factor of 2)
    d = q32.shape[1]
    infl = jnp.float32(1.0 + max(1e-4, 4.0 * d * 2.0**-24))
    e_qa = jnp.sqrt(jnp.sum(u * u, axis=1)) * infl
    hq = jnp.sqrt(jnp.sum(qh32 * qh32, axis=1)) * infl
    return qh32, e_qa, hq


def cert_query_coeffs(metric: Metric, queries, d: int):
    """Per-query coefficients of the generalized certificate fold.

    The certified scan bounds every row's TRUE score s_true by its scan
    score plus a slack of the uniform shape

        slack(q, row) = c0(q) + c1(q)*lane_a(row) + c2(q)*vnorm(row)
                        + lane_b(row)

    (for Euclidean, a LOWER bound: the fold happens in the negated key
    space where the slack still adds positively). Returns
    (qh32, c0[B], c1[B], c2[B]); the row lanes come from cert_row_lanes.

    Derivations (q = qh + dq with ||dq|| <= e_qa; v = vs + dv with
    ||dv|| <= lane_a, vs the stored row, vnorm = ||vs||):

    Cosine   |cos(q,v) - cos(qh,vs)| <= e_unit(q) + unit_resid(row):
             c0 = e_unit + eps_arith, c1 = 1, c2 = 0.
    Dot      |q.v - qh.vs| <= ||qh||*||dv|| + ||dq||*||vs|| + ||dq||*||dv||
             (+ f32 accumulation ~ kd*||qh||*vnorm on both scan and rerank
             sides, and kd*||qh||*lane_a for the rerank's ||v|| excess):
             c0 = 0, c1 = (hq + e_qa) + kd*hq, c2 = e_qa + kd*(hq + e_qa).
    Euclid   |(||q||^2 + ||v||^2 - 2 q.v) - scan| <=
             e_qa*(2hq + e_qa)  [query-norm correction -> c0]
             + 2*vnorm*lane_a + lane_a^2 + kd*nsq  [row-norm -> lane_b]
             + 2*(dot terms)   [-> c1, c2 doubled]
             + kd*hq^2         [q_sq arithmetic -> c0].
    """
    if metric is Metric.Cosine:
        e_q = bf16_query_unit_resid(queries)
        qh32 = (
            jnp.asarray(queries, jnp.float32)
            .astype(jnp.bfloat16)
            .astype(jnp.float32)
        )
        c0 = e_q + jnp.float32(mixed_cert_eps(d))
        c1 = jnp.ones_like(c0)
        c2 = jnp.zeros_like(c0)
        return qh32, c0, c1, c2
    qh32, e_qa, hq = bf16_query_abs(queries)
    kd = jnp.float32(4.0 * (d + 8) * 2.0**-24)
    m = jnp.float32(1.0 + 1e-6)
    c1 = (hq + e_qa) * m + kd * hq
    c2 = e_qa * m + kd * (hq + e_qa)
    if metric is Metric.DotProduct:
        c0 = jnp.zeros_like(hq)
        return qh32, c0, c1, c2
    if metric is Metric.Euclidean:
        c0 = (e_qa * (2.0 * hq + e_qa)) * m + kd * hq * hq
        return qh32, c0, 2.0 * c1, 2.0 * c2
    raise OttersError(f"certificate does not support metric {metric}")


def cert_row_lanes(
    metric: Metric, storage_dtype, resid, inv_norms, norms_sq, d: int
):
    """-> (lane_a[N], lane_b[N]) per-row lanes of the certificate fold.

    ``resid`` is the stored per-row residual: the UNIT-vector residual for
    int8 storage (cosine-only), the ABSOLUTE residual ||v - bf16(v)|| for
    bfloat16 storage. Padding rows carry resid = 0 and norms_sq = 0, so
    both lanes vanish there."""
    if metric is Metric.Cosine:
        if storage_dtype == jnp.int8:
            lane_a = resid  # already a unit residual
        else:
            # ||a/||a|| - b/||b|||| <= 2 ||a - b|| / max(||a||,||b||)
            lane_a = 2.0 * resid * inv_norms * jnp.float32(1.0 + 1e-5)
        return lane_a, jnp.zeros_like(lane_a)
    if metric is Metric.DotProduct:
        return resid, jnp.zeros_like(resid)
    if metric is Metric.Euclidean:
        kd = jnp.float32(4.0 * (d + 8) * 2.0**-24)
        vn = jnp.sqrt(norms_sq)
        lane_b = (2.0 * vn * resid + resid * resid) * jnp.float32(
            1.0 + 1e-6
        ) + kd * norms_sq
        return resid, lane_b
    raise OttersError(f"certificate does not support metric {metric}")


def cert_global_slack(c0, c1, c2, lane_a, lane_b, norms_sq, q_valid=None):
    """Scalar >= slack(q, row) over every valid (q, row) pair — used to
    loosen the score filter so no truly passing row is dropped on its scan
    score, and as the global term of the non-pallas/core certificates."""
    if q_valid is not None:
        c0 = jnp.where(q_valid, c0, 0.0)
        c1 = jnp.where(q_valid, c1, 0.0)
        c2 = jnp.where(q_valid, c2, 0.0)
    vn_max = jnp.sqrt(jnp.max(norms_sq))
    return (
        jnp.max(c0)
        + jnp.max(c1) * jnp.max(lane_a)
        + jnp.max(c2) * vn_max
        + jnp.max(lane_b)
    )


def materialize_from_device(
    vecs: jax.Array, n_valid: Optional[int] = None, dtype=None
) -> DeviceVecs:
    """Build a DeviceVecs from an array already resident on device.

    Pads rows on device (no host roundtrip) — used by benchmarks and by
    ingestion paths that generate or stream data device-side.
    """
    n, _ = vecs.shape
    n_pad = pad_rows(n)
    if dtype == jnp.int8:
        if n_pad != n:
            vecs = jnp.pad(vecs.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
        return _materialize_int8(
            vecs.astype(jnp.float32), n if n_valid is None else n_valid
        )
    if dtype == jnp.bfloat16 and vecs.dtype != jnp.bfloat16:
        if n_pad != n:
            vecs = jnp.pad(vecs.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
        return _materialize_bf16(
            vecs.astype(jnp.float32), n if n_valid is None else n_valid
        )
    if dtype is not None and vecs.dtype != dtype:
        vecs = vecs.astype(dtype)
    if n_pad != n:
        vecs = jnp.pad(vecs, ((0, n_pad - n), (0, 0)))
    n_valid = n if n_valid is None else n_valid
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n_valid
    norms_sq, inv_norms = _device_norms(vecs)
    return DeviceVecs(vecs, norms_sq, inv_norms, valid)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _int8_ingest_slab(buf8, norms_sq, inv, resid, slab_f32, start):
    """Quantize one f32 slab and write it into the donated int8 buffers.

    ``start`` is a traced scalar so every slab reuses one compilation; the
    donated buffers make the update in-place (no second 10M-row copy in HBM).
    """
    v8, nsq, iv, rs = _quantize_rows_int8_resid(slab_f32)
    buf8 = jax.lax.dynamic_update_slice(buf8, v8, (start, 0))
    norms_sq = jax.lax.dynamic_update_slice(norms_sq, nsq, (start,))
    inv = jax.lax.dynamic_update_slice(inv, iv, (start,))
    resid = jax.lax.dynamic_update_slice(resid, rs, (start,))
    return buf8, norms_sq, inv, resid


def materialize_int8_slabs(slab_fn, n: int, d: int, slab_rows: int) -> DeviceVecs:
    """Build an int8 DeviceVecs too large to ever exist in f32 on-chip.

    ``slab_fn(start, rows)`` must return a device (or host) f32 ``[rows, d]``
    block of rows ``start .. start+rows`` (indices past ``n`` may hold
    anything — validity masks them out of every query). Slabs are quantized
    on device and written in place: peak HBM = int8 store + ONE f32 slab.
    This is the 10M x 768 ingest path (30.7 GB f32 > HBM; 7.7 GB int8 fits).
    """
    import jax.numpy as _jnp

    n_pad = pad_rows(n)
    buf8 = _jnp.zeros((n_pad, d), _jnp.int8)
    norms_sq = _jnp.zeros((n_pad,), _jnp.float32)
    inv = _jnp.zeros((n_pad,), _jnp.float32)
    resid = _jnp.zeros((n_pad,), _jnp.float32)
    slab_rows = min(slab_rows, n_pad)
    # full slabs share one compilation (traced start); the odd-size tail
    # pays one extra compile for its own shape
    for start in range(0, n_pad, slab_rows):
        rows = min(slab_rows, n_pad - start)
        slab = _jnp.asarray(slab_fn(start, rows), dtype=_jnp.float32)
        buf8, norms_sq, inv, resid = _int8_ingest_slab(
            buf8, norms_sq, inv, resid, slab, _jnp.int32(start)
        )
    valid = _jnp.arange(n_pad, dtype=_jnp.int32) < n
    resid = _jnp.where(valid, resid, 0.0)
    rbin, rmax = finalize_resid(resid)
    # rows in [n, n_pad) come from slab_fn padding (zeros): quantized norms
    # and inv stay 0 there, and `valid` masks them out of every query
    return DeviceVecs(buf8, norms_sq, inv, valid, resid, rbin, rmax)


@partial(jax.jit, donate_argnums=(0,))
def _f32_ingest_slab(buf, slab, start):
    return jax.lax.dynamic_update_slice(buf, slab, (start, 0))


@partial(jax.jit, donate_argnums=(0,))
def _resid_ingest_slab(buf, slab_resid, start):
    """Donated in-place write of one slab's per-row residual bounds."""
    return jax.lax.dynamic_update_slice(buf, slab_resid, (start,))


def materialize_f32_slabs(slab_fn, n: int, d: int, slab_rows: int) -> DeviceVecs:
    """Build an f32 DeviceVecs slab-by-slab with donated in-place writes.

    Peak HBM = the full store + ONE slab (a plain concatenate would double
    the store). Same ``slab_fn`` contract as :func:`materialize_int8_slabs`.
    """
    import jax.numpy as _jnp

    n_pad = pad_rows(n)
    buf = _jnp.zeros((n_pad, d), _jnp.float32)
    slab_rows = min(slab_rows, n_pad)
    for start in range(0, n_pad, slab_rows):
        rows = min(slab_rows, n_pad - start)
        slab = _jnp.asarray(slab_fn(start, rows), dtype=_jnp.float32)
        buf = _f32_ingest_slab(buf, slab, _jnp.int32(start))
    norms_sq, inv = _device_norms(buf)
    valid = _jnp.arange(n_pad, dtype=_jnp.int32) < n
    return DeviceVecs(buf, norms_sq, inv, valid)


@jax.jit
def _device_norms(vecs):
    v32 = vecs.astype(jnp.float32)
    norms_sq = jnp.sum(v32 * v32, axis=1)
    norms = jnp.sqrt(norms_sq)
    inv = jnp.where(norms != 0.0, 1.0 / norms, 0.0)
    return norms_sq, inv


def _precision(p: str):
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,  # bf16_3x
        "default": jax.lax.Precision.DEFAULT,
        "bf16": jax.lax.Precision.DEFAULT,
    }[p]


def high_precision_bound(d: int) -> float:
    """Sound bound on |dot_bf16_3x - dot_HIGHEST| / (||q|| * ||v||).

    bf16_3x computes a.b as the f32-accumulated sum of three bf16-split
    partial products ah.bh + ah.bl + al.bh. With a = ah + al + r,
    |al| <= 2^-8 |a| and the split residual |r| <= 2^-16 |a| (two bf16
    roundings), the dropped/residual mass per element is
    |al.bl| + |r.b| + |a.rb| <= (2^-16 + 2^-15) |a||b|, and by
    Cauchy-Schwarz <= 2^-14.4 ||a|| ||b|| over the dot. Both computations
    accumulate in f32 with forward error <= gamma_D sum|terms|
    (gamma_D ~= D * 2^-24), counted for each partial sum. Total,
    conservatively: 2^-14 + 4 * D * 2^-24.
    """
    return 2.0**-14 + 4.0 * d * 2.0**-24


def _score_block(queries, q_inv, q_sq, vecs, v_inv, v_sq, metric: Metric, prec: str):
    """[B, D] x [T, D] -> [B, T] scores on the MXU.

    cosine   = (q . v) * inv||q|| * inv||v||   (vec_compute.rs:25-32)
    euclid   = ||q||^2 + ||v||^2 - 2 q . v     (squared, vec_compute.rs:35-54)
    dot      = q . v
    """
    if queries.dtype == jnp.bfloat16 and metric not in VPU_METRICS:
        # MIXED certified scan: bf16-rounded queries x stored rows (int8
        # codes are exact in bf16; bf16 storage is native), f32
        # accumulation. No query quantization residual — the certificate's
        # query-side term shrinks to bf16 rounding (see
        # bf16_query_unit_resid / bf16_query_abs). Callers signal the mode
        # by handing the queries in bfloat16.
        qh32 = queries.astype(jnp.float32)
        dots = jax.lax.dot_general(
            queries,
            vecs.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric is Metric.DotProduct:
            return dots
        if metric is Metric.Cosine:
            qn = jnp.sqrt(jnp.sum(qh32 * qh32, axis=1))
            qih = jnp.where(qn != 0.0, 1.0 / qn, 0.0)
            return dots * qih[:, None] * v_inv[None, :]
        qn2 = jnp.sum(qh32 * qh32, axis=1)
        return qn2[:, None] + v_sq[None, :] - 2.0 * dots
    if vecs.dtype == jnp.int8:
        # backstop guard (also enforced with friendlier errors upstream in
        # run_vec_topk / MetaStore._run_query_program; this one catches any
        # path that reaches scoring directly, e.g. sharded stores)
        if metric is not Metric.Cosine:
            raise OttersError(
                "int8 quantized storage supports the Cosine metric only"
            )
        # quantized cosine: quantize the queries symmetrically per row and
        # run the int8 MXU path; per-row scales cancel under normalization
        q8, _, q_inv8 = _quantize_rows_int8(queries)
        dots = jnp.matmul(
            q8, vecs.T, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        return dots * q_inv8[:, None] * v_inv[None, :]
    if metric in VPU_METRICS:
        return _vpu_scores(queries, vecs, metric)
    dots = jnp.matmul(
        queries,
        vecs.T,
        precision=_precision(prec),
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.DotProduct:
        return dots
    if metric is Metric.Cosine:
        return dots * q_inv[:, None] * v_inv[None, :]
    return q_sq[:, None] + v_sq[None, :] - 2.0 * dots


def _vpu_block(q, vb, metric: Metric):
    """One [B, blk] score block for the metrics with no matmul form.

    manhattan : sum |q - v|               (L1 distance)
    hamming   : count of unequal components
    jaccard   : sum min(q, v) / sum max(q, v)  (weighted Jaccard over
                non-negative vectors; 0 when both rows are all-zero)

    For Hamming/Jaccard on bf16 storage, q and vb arrive in bfloat16 and the
    compare/min/max run in that dtype directly — an f32->bf16->f32 rounding
    round-trip would be elided by XLA's excess-precision rules on TPU, which
    silently broke equality against the stored values.
    """
    ql = q[:, None, :]
    vl = vb[None, :, :]
    if metric is Metric.Manhattan:
        return jnp.sum(jnp.abs(ql - vl), axis=-1)
    if metric is Metric.Hamming:
        return jnp.sum(ql != vl, axis=-1).astype(jnp.float32)
    num = jnp.sum(jnp.minimum(ql, vl).astype(jnp.float32), axis=-1)
    den = jnp.sum(jnp.maximum(ql, vl).astype(jnp.float32), axis=-1)
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)


def _vpu_scores(queries, vecs, metric: Metric):
    """VPU metric scores [B, T] (Manhattan / Hamming / Jaccard).

    The [B, blk, D] elementwise broadcast is bounded at ~256 MB per block;
    blocks run under ``lax.scan`` so the program compiles ONE block body
    regardless of N (an unrolled Python loop emitted hundreds of panels at
    1M+ rows and took minutes to compile). These metrics have no MXU
    mapping — this path is VPU-bound by construction (~3 ops/element)."""
    b, d = queries.shape
    n = vecs.shape[0]
    blk = max(8, min(n, (1 << 26) // max(1, b * d)))
    if vecs.dtype == jnp.bfloat16 and metric in (
        Metric.Hamming, Metric.Jaccard
    ):
        # equality/min/max against bf16-rounded storage only makes sense in
        # the stored precision; compare IN bf16 (casting the query down once)
        # — a down-up rounding round-trip in f32 would be elided by XLA's
        # excess-precision optimization on TPU
        queries = queries.astype(jnp.bfloat16)
        v = vecs
    else:
        v = vecs.astype(jnp.float32)
    if n <= blk:
        return _vpu_block(queries, v, metric)
    n_blocks = -(-n // blk)
    n_pad = n_blocks * blk
    if n_pad != n:
        # NaN padding as defense in depth: Manhattan padding rows score NaN
        # (dropped by the NaN mask); Hamming/Jaccard padding rows score a
        # finite worst-ish value — the [:, :n] slice below and the caller's
        # validity mask are what actually exclude them
        v = jnp.pad(v, ((0, n_pad - n), (0, 0)), constant_values=jnp.nan)
    vt = v.reshape(n_blocks, blk, d)

    def step(_, vb):
        return None, _vpu_block(queries, vb, metric)  # [B, blk]

    _, ys = jax.lax.scan(step, None, vt)  # [n_blocks, B, blk]
    return jnp.moveaxis(ys, 0, 1).reshape(b, n_pad)[:, :n]


def _filter_ok(scores, thr, cmp: Optional[Cmp]):
    if cmp is None:
        return jnp.ones(scores.shape, dtype=jnp.bool_)
    if cmp is Cmp.Lt:
        return scores < thr
    if cmp is Cmp.Gt:
        return scores > thr
    if cmp is Cmp.Lte:
        return scores <= thr
    if cmp is Cmp.Gte:
        return scores >= thr
    return scores == thr


def _query_norms(queries):
    q_sq = jnp.sum(queries * queries, axis=1)
    q_norm = jnp.sqrt(q_sq)
    q_inv = jnp.where(q_norm != 0.0, 1.0 / q_norm, 0.0)
    return q_sq, q_inv


HIER_BIN = 512


def exact_topk_flat(key, k: int):
    """Exact top-k over a 1D key array, fast at scale.

    ``lax.top_k`` lowers to a sort-flavored kernel that is slow for large
    inputs on TPU. For big arrays this prefilters with per-512-bin maxima:
    every true top-k element's bin max is >= the k-th best value, so the
    top-k bins are a superset of the answer; the final exact top-k runs
    over <= k*512 gathered candidates. Ties prefer lower indices, like
    ``lax.top_k`` itself.
    """
    n = key.shape[0]
    k = min(k, n)
    if n <= (1 << 15) or n % HIER_BIN != 0 or k * HIER_BIN * 4 >= n:
        return jax.lax.top_k(key, k)
    nb = n // HIER_BIN
    bins = key.reshape(nb, HIER_BIN)
    bmax = bins.max(axis=1)
    km = min(k, nb)
    _, top_bins = exact_topk_flat(bmax, km)  # recurse while still large
    cand = bins[top_bins].reshape(-1)
    cand_idx = (
        top_bins[:, None] * HIER_BIN
        + jnp.arange(HIER_BIN, dtype=top_bins.dtype)[None, :]
    ).reshape(-1)
    val, sel = jax.lax.top_k(cand, k)
    return val, cand_idx[sel]


# ---------------------------------------------------------------------------
# Direct path
# ---------------------------------------------------------------------------


def direct_topk_core(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    q_valid=None,
):
    """Pure traced core: [B, N] scores -> merged (rows, scores, valid).

    Usable standalone (jitted below) and as the per-shard body inside
    shard_map for the multi-device path (otters_tpu.parallel).
    """
    n_pad = vectors.shape[0]
    q_sq, q_inv = _query_norms(queries)
    scores = _score_block(
        queries, q_inv, q_sq, vectors, inv_norms, norms_sq, metric, prec
    )  # [B, N]
    ok = valid[None, :]
    if row_mask is not None:
        ok = ok & row_mask[None, :]
    if q_valid is not None:
        ok = ok & q_valid[:, None]
    ok = ok & _filter_ok(scores, thr, cmp) & ~jnp.isnan(scores)

    key = jnp.where(ok, scores, -jnp.inf if not take_min else jnp.inf)
    if take_min:
        key = -key
    key_flat = key.reshape(-1)
    top_key, top_flat = exact_topk_flat(key_flat, k)
    rows = (top_flat % n_pad).astype(jnp.int32)
    out_scores = scores.reshape(-1)[top_flat]
    out_valid = ok.reshape(-1)[top_flat]
    return rows, out_scores, out_valid


@partial(
    jax.jit,
    static_argnames=("metric", "k", "take_min", "cmp", "prec"),
)
def _direct_topk(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
):
    return direct_topk_core(
        vectors,
        norms_sq,
        inv_norms,
        valid,
        queries,
        row_mask,
        thr,
        metric=metric,
        k=k,
        take_min=take_min,
        cmp=cmp,
        prec=prec,
    )


# ---------------------------------------------------------------------------
# Panel path: two-level exact top-k (the TPU fast path for small k)
# ---------------------------------------------------------------------------
#
# lax.top_k over a [B*N] score vector is sort-based and catastrophically slow
# at this scale (~1s for 257M entries on v5e), while the matmul itself is
# ~19ms. The panel path exploits k << N: reduce each 512-wide bin of the
# masked score matrix to its max (a cheap VPU pass), take the top-k *bins*
# (top_k over B*N/512 entries), gather only those bins' scores, and run the
# exact top-k over the <= k*512 survivors. Every true top-k element's bin max
# is >= the k-th best value, so the k winning bins are a superset of the
# answer: the result is exact. Rows are processed in panels so the staged
# score block stays ~1 GB regardless of N; panels merge through a carried
# top-k buffer (unrolled python loop -> one fused XLA program, no scan
# machinery).

PANEL_BIN = 512
PANEL_SCORE_BYTES = 1 << 30  # max staged panel score block


def _panel_sizes(n_pad: int, b: int):
    """Split n_pad rows into panels of ~PANEL_SCORE_BYTES score bytes."""
    target = max(PANEL_BIN * 2, PANEL_SCORE_BYTES // (4 * max(b, 1)))
    panel = min(n_pad, (target // PANEL_BIN) * PANEL_BIN)
    sizes = []
    off = 0
    while off < n_pad:
        sizes.append(min(panel, n_pad - off))
        off += sizes[-1]
    return sizes


def panel_topk_core(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    q_valid=None,
):
    n_pad = vectors.shape[0]
    b = queries.shape[0]
    q_sq, q_inv = _query_norms(queries)
    neg = jnp.float32(-jnp.inf)

    best_key = jnp.full((k,), -jnp.inf, dtype=jnp.float32)
    best_row = jnp.zeros((k,), dtype=jnp.int32)
    best_score = jnp.zeros((k,), dtype=jnp.float32)
    best_valid = jnp.zeros((k,), dtype=jnp.bool_)

    off = 0
    for size in _panel_sizes(n_pad, b):
        sl = slice(off, off + size)
        scores = _score_block(
            queries, q_inv, q_sq, vectors[sl], inv_norms[sl], norms_sq[sl],
            metric, prec,
        )  # [B, size]
        ok = valid[sl][None, :]
        if row_mask is not None:
            ok = ok & row_mask[sl][None, :]
        if q_valid is not None:
            ok = ok & q_valid[:, None]
        ok = ok & _filter_ok(scores, thr, cmp) & ~jnp.isnan(scores)
        key = jnp.where(ok, scores, jnp.inf if take_min else -jnp.inf)
        if take_min:
            key = -key

        n_bins = size // PANEL_BIN
        key3 = key.reshape(b, n_bins, PANEL_BIN)
        bin_max = key3.max(axis=2).reshape(-1)  # [b * n_bins]
        kb = min(k, bin_max.shape[0])
        _, top_bins = exact_topk_flat(bin_max, kb)
        qi = top_bins // n_bins
        bi = top_bins % n_bins
        cand_key = key3[qi, bi].reshape(-1)  # [kb * PANEL_BIN]
        cand_row = (
            off + bi[:, None] * PANEL_BIN
            + jnp.arange(PANEL_BIN, dtype=jnp.int32)[None, :]
        ).reshape(-1).astype(jnp.int32)
        sc3 = scores.reshape(b, n_bins, PANEL_BIN)
        ok3 = ok.reshape(b, n_bins, PANEL_BIN)
        cand_score = sc3[qi, bi].reshape(-1)
        cand_ok = ok3[qi, bi].reshape(-1)

        m_key = jnp.concatenate([best_key, cand_key])
        m_row = jnp.concatenate([best_row, cand_row])
        m_score = jnp.concatenate([best_score, cand_score])
        m_ok = jnp.concatenate([best_valid, cand_ok])
        best_key, sel = jax.lax.top_k(m_key, k)
        best_row = m_row[sel]
        best_score = m_score[sel]
        best_valid = m_ok[sel]
        off += size

    return best_row, best_score, best_valid


@partial(
    jax.jit,
    static_argnames=("metric", "k", "take_min", "cmp", "prec"),
)
def _panel_topk(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
):
    return panel_topk_core(
        vectors,
        norms_sq,
        inv_norms,
        valid,
        queries,
        row_mask,
        thr,
        metric=metric,
        k=k,
        take_min=take_min,
        cmp=cmp,
        prec=prec,
    )


# ---------------------------------------------------------------------------
# Streaming path (lax.scan over row tiles with threshold early-out)
# ---------------------------------------------------------------------------


def scan_topk_core(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    tile: int,
    q_valid=None,
):
    n_pad, d = vectors.shape
    b = queries.shape[0]
    n_tiles = n_pad // tile
    q_sq, q_inv = _query_norms(queries)

    vecs_t = vectors.reshape(n_tiles, tile, d)
    nsq_t = norms_sq.reshape(n_tiles, tile)
    inv_t = inv_norms.reshape(n_tiles, tile)
    valid_t = valid.reshape(n_tiles, tile)
    rmask_t = None if row_mask is None else row_mask.reshape(n_tiles, tile)

    kk = min(k, b * tile)  # per-merge candidate width

    def step(carry, inputs):
        best_key, best_row, best_score, best_valid = carry
        if rmask_t is None:
            t_idx, v, nsq, vinv, vld = inputs
            rm = None
        else:
            t_idx, v, nsq, vinv, vld, rm = inputs
        scores = _score_block(queries, q_inv, q_sq, v, vinv, nsq, metric, prec)
        ok = vld[None, :]
        if rm is not None:
            ok = ok & rm[None, :]
        if q_valid is not None:
            ok = ok & q_valid[:, None]
        ok = ok & _filter_ok(scores, thr, cmp) & ~jnp.isnan(scores)
        key = jnp.where(ok, scores, -jnp.inf if not take_min else jnp.inf)
        if take_min:
            key = -key
        key_flat = key.reshape(-1)

        # TPU analog of the reference's effective-threshold early-out
        # (vec_compute.rs:96-165): skip the expensive merge when no candidate
        # in this tile beats the current k-th best.
        kth = best_key[-1]
        can_improve = jnp.max(key_flat) > kth

        def merge(_):
            t_key, t_flat = exact_topk_flat(key_flat, kk)
            t_row = (t_idx * tile + t_flat % tile).astype(jnp.int32)
            t_score = scores.reshape(-1)[t_flat]
            t_valid = ok.reshape(-1)[t_flat]
            m_key = jnp.concatenate([best_key, t_key])
            m_row = jnp.concatenate([best_row, t_row])
            m_score = jnp.concatenate([best_score, t_score])
            m_valid = jnp.concatenate([best_valid, t_valid])
            nk, sel = jax.lax.top_k(m_key, k)
            return nk, m_row[sel], m_score[sel], m_valid[sel]

        carry = jax.lax.cond(
            can_improve,
            merge,
            lambda _: (best_key, best_row, best_score, best_valid),
            None,
        )
        return carry, None

    init = (
        jnp.full((k,), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.int32),
        jnp.zeros((k,), dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.bool_),
    )
    tiles_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    xs = (
        (tiles_idx, vecs_t, nsq_t, inv_t, valid_t)
        if rmask_t is None
        else (tiles_idx, vecs_t, nsq_t, inv_t, valid_t, rmask_t)
    )
    (best_key, best_row, best_score, best_valid), _ = jax.lax.scan(step, init, xs)
    return best_row, best_score, best_valid


@partial(
    jax.jit,
    static_argnames=("metric", "k", "take_min", "cmp", "prec", "tile"),
)
def _scan_topk(
    vectors,
    norms_sq,
    inv_norms,
    valid,
    queries,
    row_mask,
    thr,
    *,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    prec: str,
    tile: int,
):
    return scan_topk_core(
        vectors,
        norms_sq,
        inv_norms,
        valid,
        queries,
        row_mask,
        thr,
        metric=metric,
        k=k,
        take_min=take_min,
        cmp=cmp,
        prec=prec,
        tile=tile,
    )


def scan_pruned_topk_core(
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
    prec: str,
    tile: int,
    q_valid=None,
):
    """Streaming top-k that SKIPS pruned tiles entirely (round-3: pruning
    pays for every metric, reference meta.rs:647-691 prunes independent of
    the metric).

    Unlike :func:`scan_topk_core` (whose xs pre-load every tile), each step
    loads its tile with ``dynamic_slice`` INSIDE the alive branch of a
    ``lax.cond`` — a dead tile costs neither HBM reads nor VPU/MXU work.
    This is the pruning path for the VPU metrics (Manhattan / Hamming /
    Jaccard), which the Pallas kernel does not admit; soundness is the
    same contract as the Pallas tile skipping (every row of a dead tile
    fails the row mask).
    """
    n_pad, d = vectors.shape
    b = queries.shape[0]
    n_tiles = n_pad // tile
    q_sq, q_inv = _query_norms(queries)
    kk = min(k, b * tile)

    def step(carry, t_idx):
        def live(best):
            best_key, best_row, best_score, best_valid = best
            start = t_idx * tile
            v = jax.lax.dynamic_slice(vectors, (start, 0), (tile, d))
            nsq = jax.lax.dynamic_slice(norms_sq, (start,), (tile,))
            inv = jax.lax.dynamic_slice(inv_norms, (start,), (tile,))
            vld = jax.lax.dynamic_slice(valid, (start,), (tile,))
            scores = _score_block(queries, q_inv, q_sq, v, inv, nsq, metric, prec)
            ok = vld[None, :]
            if row_mask is not None:
                rm = jax.lax.dynamic_slice(row_mask, (start,), (tile,))
                ok = ok & rm[None, :]
            if q_valid is not None:
                ok = ok & q_valid[:, None]
            ok = ok & _filter_ok(scores, thr, cmp) & ~jnp.isnan(scores)
            key = jnp.where(ok, scores, -jnp.inf if not take_min else jnp.inf)
            if take_min:
                key = -key
            key_flat = key.reshape(-1)

            def merge(_):
                t_key, t_flat = exact_topk_flat(key_flat, kk)
                t_row = (start + t_flat % tile).astype(jnp.int32)
                t_score = scores.reshape(-1)[t_flat]
                t_valid = ok.reshape(-1)[t_flat]
                m_key = jnp.concatenate([best_key, t_key])
                m_row = jnp.concatenate([best_row, t_row])
                m_score = jnp.concatenate([best_score, t_score])
                m_valid = jnp.concatenate([best_valid, t_valid])
                nk, sel = jax.lax.top_k(m_key, k)
                return nk, m_row[sel], m_score[sel], m_valid[sel]

            return jax.lax.cond(
                jnp.max(key_flat) > best_key[-1], merge, lambda _: best, None
            )

        carry = jax.lax.cond(tile_alive[t_idx], live, lambda c: c, carry)
        return carry, None

    init = (
        jnp.full((k,), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.int32),
        jnp.zeros((k,), dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.bool_),
    )
    (best_key, best_row, best_score, best_valid), _ = jax.lax.scan(
        step, init, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    return best_row, best_score, best_valid


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------

PANEL_K_MAX = 1024
SCAN_K_MAX = DIRECT_LIMIT // 4
# Host-memory ceiling for the windowed take-all path: b * n_pad candidate
# scores (f32) + validity (bool) are staged host-side, so 2^29 candidates
# ~= 2.7 GB. Matches (slightly exceeds) the old direct-fallback ceiling
# (b*n_pad*4 <= 2<<30) so no previously-working take-all size regresses.
# Beyond this, take(k) with a smaller k is required.
# take-all staging admit ceiling: the host merge holds ~17 bytes per
# retained candidate, so the default (2^29 ~ 9 GB) suits a 32-64 GB host.
# Larger hosts can raise it (the reference's take-all has no cliff below
# host RAM; this makes ours configurable to the same effect).
TAKE_ALL_LIMIT = int(__import__("os").environ.get(
    "OTTERS_TAKE_ALL_LIMIT", 1 << 29
))


def needs_windowed(n_pad: int, b: int, k_eff: int) -> bool:
    """True when no on-device top-k strategy fits this (b, n_pad, k): the
    take-all regime (reference meta.rs:638-640 returns EVERY row). A k-sized
    device buffer would rival the store itself, so the windowed host
    collection takes over wherever direct/panel/scan are ineligible."""
    if b * n_pad <= DIRECT_LIMIT:
        # direct handles most k at this size — but take-most/all of a big
        # store would compile a near-full-length device sort (minutes of
        # compile, and the windowed host argsort is faster anyway)
        return (
            k_eff > PANEL_K_MAX
            and 4 * k_eff > b * n_pad
            and b * n_pad > (1 << 20)
        )
    if k_eff <= PANEL_K_MAX and n_pad % PANEL_BIN == 0:
        return False
    if n_pad % SCAN_TILE == 0 and k_eff <= SCAN_K_MAX:
        return False
    return True


@partial(
    jax.jit, static_argnames=("metric", "cmp", "prec", "w", "take_min")
)
def _window_block(
    vectors, norms_sq, inv_norms, valid, queries, row_mask, thr, start,
    *, metric: Metric, cmp: Optional[Cmp], prec: str, w: int, take_min: bool,
):
    """Score one w-row window -> ([B, w] scores, [B, w] candidate-ok)."""
    d = vectors.shape[1]
    v = jax.lax.dynamic_slice(vectors, (start, 0), (w, d))
    nsq = jax.lax.dynamic_slice(norms_sq, (start,), (w,))
    inv = jax.lax.dynamic_slice(inv_norms, (start,), (w,))
    vld = jax.lax.dynamic_slice(valid, (start,), (w,))
    q_sq, q_inv = _query_norms(queries)
    scores = _score_block(queries, q_inv, q_sq, v, inv, nsq, metric, prec)
    ok = vld[None, :]
    if row_mask is not None:
        ok = ok & jax.lax.dynamic_slice(row_mask, (start,), (w,))[None, :]
    ok = ok & _filter_ok(scores, thr, cmp) & ~jnp.isnan(scores)
    return scores, ok


def _window_size(n_pad: int, b: int) -> int:
    """Largest 512-multiple window dividing n_pad with b*w <= DIRECT_LIMIT."""
    w = max(512, min(n_pad, (DIRECT_LIMIT // max(b, 1)) // 512 * 512))
    while w > 512 and n_pad % w != 0:
        w -= 512
    if n_pad % w != 0:  # tiny/unaligned stores: one window covers everything
        w = n_pad
    return w


def collect_all(
    dv: DeviceVecs,
    queries,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    thr: Optional[float],
    row_mask=None,
    prec: str = "highest",
    return_qidx: bool = False,
):
    """Windowed full-score collection for the take-all regime.

    Streams [B, w] score windows device->host (double-buffered: window i+1
    is dispatched before window i is fetched) and runs the global top-k on
    the host. Matches the reference's take-all semantics (meta.rs:638-640,
    699-709: sort everything by the take direction, truncate to k) at sizes
    where no on-device top-k buffer fits. Returns (rows, scores, valid) as
    host arrays like :func:`run_vec_topk`; with ``return_qidx`` also the
    query index per result, so a caller merging several stores (the sharded
    take-all path) can reproduce the exact single-device flat-index tie
    order.
    """
    n_pad = dv.vectors.shape[0]
    b = queries.shape[0]
    total = b * n_pad
    if total > TAKE_ALL_LIMIT:
        raise OttersError(
            f"take({k}) over {b} queries x {n_pad} rows stages "
            f"{total} candidate scores (> {TAKE_ALL_LIMIT}); use a smaller "
            "take(k) or fewer queries per batch"
        )
    k_eff = min(k, total)
    q = jnp.asarray(queries, dtype=jnp.float32)
    thr_arr = jnp.float32(0.0) if thr is None else jnp.float32(thr)
    cmp_eff = None if thr is None else cmp
    rm = None if row_mask is None else jnp.asarray(row_mask)
    w = _window_size(n_pad, b)

    scores_h = np.empty((b, n_pad), dtype=np.float32)
    ok_h = np.empty((b, n_pad), dtype=bool)
    kwargs = dict(metric=metric, cmp=cmp_eff, prec=prec, w=w, take_min=take_min)
    pending = []  # (start, device (scores, ok)) double buffer
    for start in list(range(0, n_pad, w)) + [None]:
        if start is not None:
            out = _window_block(
                dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q, rm,
                thr_arr, jnp.int32(start), **kwargs,
            )
            pending.append((start, out))
        if len(pending) > 1 or (start is None and pending):
            s0, out0 = pending.pop(0)
            sc, okw = jax.device_get(out0)
            scores_h[:, s0 : s0 + w] = sc
            ok_h[:, s0 : s0 + w] = okw

    key = np.where(ok_h, scores_h, np.inf if take_min else -np.inf).reshape(-1)
    if not take_min:
        key = -key  # ascending sort on negated keys = take_max order
    if k_eff * 4 < total:
        part = np.argpartition(key, k_eff - 1)[:k_eff]
        # argpartition breaks flat-index tie order; sort the survivors by
        # (key, flat index) so ties resolve lower-index-first like lax.top_k
        order = part[np.lexsort((part, key[part]))]
    else:
        order = np.argsort(key, kind="stable")[:k_eff]
    rows = (order % n_pad).astype(np.int32)
    out_scores = scores_h.reshape(-1)[order]
    out_valid = ok_h.reshape(-1)[order]
    if return_qidx:
        return rows, out_scores, out_valid, (order // n_pad).astype(np.int32)
    return rows, out_scores, out_valid


def choose_mode(n_pad: int, b: int, k_eff: int) -> str:
    """Pick the scoring strategy: 'direct' | 'panel' | 'scan'.

    direct: small candidate count -> one sort-based top_k is fine.
    panel : large N, small k      -> two-level bin-max exact top-k (fast path).
    scan  : large N, large k      -> streaming tiles with threshold early-out.
    """
    if b * n_pad <= DIRECT_LIMIT:
        return "direct"
    if k_eff <= PANEL_K_MAX and n_pad % PANEL_BIN == 0:
        return "panel"
    if n_pad % SCAN_TILE == 0 and k_eff <= SCAN_K_MAX:
        return "scan"
    if b * n_pad * 4 <= 2 << 30:
        return "direct"
    raise OttersError(
        f"take({k_eff}) over {b} queries x {n_pad} rows is too large for "
        "device memory; use an explicit smaller take(k)"
    )


def run_vec_topk(
    dv: DeviceVecs,
    queries: np.ndarray,
    metric: Metric,
    k: int,
    take_min: bool,
    cmp: Optional[Cmp],
    thr: Optional[float],
    row_mask=None,
    prec: str = "highest",
):
    """Execute the scoring program; returns host (rows, scores, valid)."""
    n_pad = dv.vectors.shape[0]
    b = queries.shape[0]
    k_eff = min(k, b * n_pad)
    if k_eff <= 0:
        return np.array([], np.int32), np.array([], np.float32), np.array([], bool)

    q = jnp.asarray(queries, dtype=jnp.float32)
    thr_arr = jnp.float32(0.0) if thr is None else jnp.float32(thr)
    cmp_eff = None if thr is None else cmp
    rm = None if row_mask is None else jnp.asarray(row_mask)

    if dv.vectors.dtype == jnp.int8 and metric is not Metric.Cosine:
        raise OttersError(
            "int8 quantized storage supports the Cosine metric only"
        )
    if needs_windowed(n_pad, b, k_eff):
        # take-all regime: stream score windows to the host (meta.rs:638-640)
        return collect_all(
            dv, queries, metric, k_eff, take_min, cmp, thr,
            row_mask=row_mask, prec=prec,
        )
    mode = choose_mode(n_pad, b, k_eff)
    args = (dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q, rm, thr_arr)
    kwargs = dict(metric=metric, k=k_eff, take_min=take_min, cmp=cmp_eff, prec=prec)
    if mode == "panel" and metric not in VPU_METRICS:
        # upgrade to the fused Pallas kernel on TPU (skips nothing here but
        # never materializes the score matrix); int8 storage rides it too
        # (quantized queries + bf16 MXU, exact w.r.t. the stored int8)
        from . import pallas_topk as pk

        if pk.pallas_ok(n_pad, dv.vectors.shape[1], b, k_eff):
            t = pk.choose_tile(dv.vectors.shape[1], n_pad, pk._pad_b(b))
            alive = jnp.ones(n_pad // t, dtype=jnp.bool_)
            fast = dv.vectors.dtype != jnp.int8 and pk.fast_ok(
                metric, take_min, cmp_eff, k_eff, prec
            )
            rows, scores, valid, check, _bound = pk.pallas_topk(
                *args[:5], rm, thr_arr, alive, fast=fast, **kwargs
            )
            rows, scores, valid, check = jax.device_get(
                (rows, scores, valid, check)
            )
            if fast and not bool(check):
                # verified fast-exact check failed (ties near the boundary);
                # re-run strictly at HIGHEST
                rows, scores, valid, _, _ = jax.device_get(
                    pk.pallas_topk(
                        *args[:5], rm, thr_arr, alive, fast=False, **kwargs
                    )
                )
            return rows, scores, valid
    if mode == "direct":
        rows, scores, valid = _direct_topk(*args, **kwargs)
    elif mode == "panel":
        rows, scores, valid = _panel_topk(*args, **kwargs)
    else:
        rows, scores, valid = _scan_topk(*args, tile=SCAN_TILE, **kwargs)
    # one batched device->host fetch (roundtrips are expensive on tunneled
    # or multi-host setups; never fetch outputs one by one)
    return jax.device_get((rows, scores, valid))
