"""Pallas fused kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from otters_tpu.ops import pallas_topk as pk
from otters_tpu.ops import scoring
from otters_tpu.types import Cmp, Metric


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n, d, b = 16384, 128, 3  # -> 4 tiles of 4096 rows
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    dv = scoring.materialize(vectors)
    return vectors, queries, dv


def _oracle(vectors, queries, metric, k, take_min, row_mask=None, thr=None, cmp=None):
    if metric is Metric.DotProduct:
        s = queries @ vectors.T
    elif metric is Metric.Cosine:
        qi = 1.0 / np.linalg.norm(queries, axis=1)
        vi = 1.0 / np.linalg.norm(vectors, axis=1)
        s = (queries @ vectors.T) * qi[:, None] * vi[None, :]
    else:
        q_sq = (queries**2).sum(1)[:, None]
        v_sq = (vectors**2).sum(1)[None, :]
        s = q_sq + v_sq - 2 * queries @ vectors.T
    ok = np.ones_like(s, dtype=bool)
    if row_mask is not None:
        ok &= row_mask[None, : s.shape[1]]
    if thr is not None:
        ok &= {
            Cmp.Gt: s > thr,
            Cmp.Lt: s < thr,
            Cmp.Gte: s >= thr,
            Cmp.Lte: s <= thr,
            Cmp.Eq: s == thr,
        }[cmp]
    vals = s[ok]
    return np.sort(vals)[:k] if take_min else np.sort(vals)[::-1][:k]


def _run_pallas(dv, queries, tile_alive, row_mask=None, thr=None, cmp=None,
                metric=Metric.DotProduct, k=12, take_min=False, fast=False):
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv.vectors,
        dv.norms_sq,
        dv.inv_norms,
        dv.valid,
        jnp.asarray(queries),
        None if row_mask is None else jnp.asarray(row_mask),
        jnp.float32(0.0 if thr is None else thr),
        tile_alive,
        metric=metric,
        k=k,
        take_min=take_min,
        cmp=cmp if thr is not None else None,
        interpret=True,
        fast=fast,
    )
    assert bool(np.asarray(check)) or fast
    return np.asarray(rows), np.asarray(scores), np.asarray(ok)


def test_pallas_matches_oracle_dot(data):
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok = _run_pallas(dv, queries, alive)
    want = _oracle(vectors, queries, Metric.DotProduct, 12, False)
    assert ok.all()
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("metric,take_min", [
    (Metric.Cosine, False),
    (Metric.Euclidean, True),
])
def test_pallas_matches_oracle_metrics(data, metric, take_min):
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok = _run_pallas(
        dv, queries, alive, metric=metric, take_min=take_min
    )
    want = _oracle(vectors, queries, metric, 12, take_min)
    np.testing.assert_allclose(scores[ok], want[: ok.sum()], rtol=1e-4, atol=1e-4)


def test_pallas_skips_dead_tiles_exactly(data):
    """Dead tiles' rows must never appear even if they'd score highest."""
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    d = vectors.shape[1]
    t = pk.choose_tile(d, n_pad, pk._pad_b(queries.shape[0]))
    n_tiles = n_pad // t
    # rows 0..t-1 dead (tile 0), row_mask excludes them too (soundness contract)
    alive = jnp.asarray(np.arange(n_tiles) != 0)
    row_mask = np.ones(n_pad, dtype=bool)
    row_mask[:t] = False
    rows, scores, ok = _run_pallas(dv, queries, alive, row_mask=row_mask, k=20)
    assert ok.all()
    assert all(r >= t for r in rows)
    want = _oracle(vectors, queries, Metric.DotProduct, 20, False,
                   row_mask=row_mask[: len(vectors)])
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)


def test_pallas_filter_and_mask(data):
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    row_mask = np.zeros(n_pad, dtype=bool)
    row_mask[::3] = True
    rows, scores, ok = _run_pallas(
        dv, queries, alive, row_mask=row_mask, thr=2.0, cmp=Cmp.Gt, k=15
    )
    want = _oracle(
        vectors, queries, Metric.DotProduct, 15, False,
        row_mask=row_mask[: len(vectors)], thr=2.0, cmp=Cmp.Gt,
    )
    got = scores[ok]
    np.testing.assert_allclose(got, want[: len(got)], rtol=1e-5, atol=1e-5)
    assert all(r % 3 == 0 for r in rows[ok])


def test_fast_exact_mode_matches_strict(data):
    """Verified fast-exact (HIGH phase-1 + exact rescore) == strict results."""
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    assert pk.fast_ok(Metric.Cosine, False, Cmp.Gt, 10, "highest")
    assert pk.fast_ok(Metric.Euclidean, True, None, 10, "highest")  # r2: norm-scaled
    assert not pk.fast_ok(Metric.Cosine, False, Cmp.Eq, 10, "highest")
    assert not pk.fast_ok(Metric.Manhattan, True, None, 10, "highest")
    assert not pk.fast_ok(Metric.Cosine, False, None, 10, "default")

    strict = _run_pallas(dv, queries, alive, metric=Metric.Cosine, k=10)
    fast = _run_pallas(dv, queries, alive, metric=Metric.Cosine, k=10, fast=True)
    np.testing.assert_array_equal(fast[0], strict[0])  # same rows
    np.testing.assert_array_equal(fast[1], strict[1])  # identical exact scores

    # with a score filter (loosened in phase 1, exact in phase 2)
    strict_f = _run_pallas(
        dv, queries, alive, metric=Metric.Cosine, k=10, thr=0.05, cmp=Cmp.Gt
    )
    fast_f = _run_pallas(
        dv, queries, alive, metric=Metric.Cosine, k=10, thr=0.05, cmp=Cmp.Gt,
        fast=True,
    )
    np.testing.assert_array_equal(fast_f[0], strict_f[0])
    np.testing.assert_array_equal(fast_f[1], strict_f[1])
    assert all(s > 0.05 for s in fast_f[1][fast_f[2]])


def test_fast_exact_check_fails_safe():
    """Adversarial near-ties at the 4k-bin boundary must trip the check,
    never return a silently wrong result."""
    rng = np.random.default_rng(5)
    n, d, b, k = 16384, 128, 1, 4
    # all vectors nearly identical -> scores tie within the HIGH error bound
    base = rng.normal(size=d).astype(np.float32)
    vectors = np.tile(base, (n, 1)) + rng.normal(size=(n, d)).astype(np.float32) * 1e-7
    queries = base[None, :]
    dv = scoring.materialize(vectors)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(1))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(queries), None, jnp.float32(0.0), alive,
        metric=Metric.Cosine, k=k, take_min=False, cmp=None,
        interpret=True, fast=True,
    )
    # ties everywhere: the certificate must fail (callers then re-run strict)
    assert not bool(np.asarray(check))


def test_tiles_alive_from_chunk_mask():
    cm = jnp.asarray(np.array([True, False, False, True]))
    alive = pk.tiles_alive_from_chunk_mask(cm, 256, 1024, 512)
    np.testing.assert_array_equal(np.asarray(alive), [True, True])
    alive2 = pk.tiles_alive_from_chunk_mask(cm, 128, 512, 512)
    np.testing.assert_array_equal(np.asarray(alive2), [True])
    cm3 = jnp.asarray(np.array([False, False]))
    alive3 = pk.tiles_alive_from_chunk_mask(cm3, 512, 1024, 512)
    np.testing.assert_array_equal(np.asarray(alive3), [False, False])


def test_pallas_narrow_batch_b1(data):
    """b=1 (8-sublane padding, bo=128 lane fill) must stay exact, with and
    without pruning — the small-batch pruning path (meta.rs:647-691 prunes
    regardless of batch size)."""
    vectors, _, dv = data
    rng = np.random.default_rng(21)
    q1 = rng.normal(size=(1, vectors.shape[1])).astype(np.float32)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(1))
    n_tiles = n_pad // t
    alive = jnp.ones(n_tiles, dtype=bool)
    rows, scores, ok = _run_pallas(dv, q1, alive, metric=Metric.Cosine, k=9)
    want = _oracle(vectors, q1, Metric.Cosine, 9, False)
    assert ok.all()
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)

    # pruned: only tile 1 alive, mask matches
    alive2 = jnp.asarray(np.arange(n_tiles) == 1)
    row_mask = np.zeros(n_pad, dtype=bool)
    row_mask[t : 2 * t] = True
    rows2, scores2, ok2 = _run_pallas(
        dv, q1, alive2, row_mask=row_mask, metric=Metric.Cosine, k=9
    )
    want2 = _oracle(
        vectors, q1, Metric.Cosine, 9, False,
        row_mask=row_mask[: len(vectors)],
    )
    np.testing.assert_allclose(scores2[ok2], want2[: ok2.sum()], rtol=1e-5, atol=1e-5)
    assert all(t <= r < 2 * t for r in rows2[ok2])


@pytest.mark.parametrize("b", [1, 5, 8, 13])
def test_pallas_narrow_batches_match_oracle(data, b):
    vectors, _, dv = data
    rng = np.random.default_rng(22 + b)
    q = rng.normal(size=(b, vectors.shape[1])).astype(np.float32)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(b))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok = _run_pallas(
        dv, q, alive, metric=Metric.Euclidean, take_min=True, k=11
    )
    want = _oracle(vectors, q, Metric.Euclidean, 11, True)
    np.testing.assert_allclose(scores[ok], want[: ok.sum()], rtol=1e-4, atol=1e-4)


def test_pallas_int8_quantized_cosine(data):
    """int8 storage through the kernel: results must equal the XLA int8 path
    (same quantized-cosine math), bit-for-bit on rows."""
    vectors, queries, dv_f32 = data
    dv8 = scoring.materialize(vectors, dtype=jnp.int8)
    n_pad = dv8.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
        jnp.asarray(queries), None, jnp.float32(0.0), alive,
        metric=Metric.Cosine, k=10, take_min=False, cmp=None,
        interpret=True,
    )
    rows, scores, ok = np.asarray(rows), np.asarray(scores), np.asarray(ok)
    assert ok.all()
    # XLA oracle on the same quantized data
    want_rows, want_scores, want_ok = scoring.run_vec_topk(
        dv8, queries, Metric.Cosine, 10, take_min=False, cmp=None, thr=None
    )
    assert sorted(rows.tolist()) == sorted(np.asarray(want_rows).tolist())
    np.testing.assert_allclose(
        np.sort(scores), np.sort(np.asarray(want_scores)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("metric,take_min", [
    (Metric.DotProduct, False),
    (Metric.Euclidean, True),
])
def test_fast_exact_dot_euclid(data, metric, take_min):
    """Norm-scaled verified fast-exact for the non-normalized metrics."""
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    assert pk.fast_ok(metric, take_min, None, 10, "highest")
    strict = _run_pallas(dv, queries, alive, metric=metric, take_min=take_min, k=10)
    fast = _run_pallas(
        dv, queries, alive, metric=metric, take_min=take_min, k=10, fast=True
    )
    np.testing.assert_array_equal(fast[0], strict[0])
    np.testing.assert_array_equal(fast[1], strict[1])

    # with a score filter (loosened by the norm-scaled slack in phase 1)
    thr = 2.0 if metric is Metric.DotProduct else 200.0
    cmp = Cmp.Gt if metric is Metric.DotProduct else Cmp.Lt
    strict_f = _run_pallas(
        dv, queries, alive, metric=metric, take_min=take_min, k=10,
        thr=thr, cmp=cmp,
    )
    fast_f = _run_pallas(
        dv, queries, alive, metric=metric, take_min=take_min, k=10,
        thr=thr, cmp=cmp, fast=True,
    )
    np.testing.assert_array_equal(fast_f[0], strict_f[0])
    np.testing.assert_array_equal(fast_f[1], strict_f[1])


def test_fast_exact_euclid_ties_fail_safe():
    """Near-identical vectors: the euclid certificate must fail rather than
    return wrong rows."""
    rng = np.random.default_rng(6)
    n, d, k = 16384, 128, 4
    base = rng.normal(size=d).astype(np.float32) * 10
    vectors = np.tile(base, (n, 1)) + rng.normal(size=(n, d)).astype(np.float32) * 1e-6
    queries = (base * 1.01)[None, :]
    dv = scoring.materialize(vectors)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(1))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(queries), None, jnp.float32(0.0), alive,
        metric=Metric.Euclidean, k=k, take_min=True, cmp=None,
        interpret=True, fast=True,
    )
    assert not bool(np.asarray(check))


def test_choose_tile_chunk_alignment():
    """Tiles align DOWN to a chunk multiple when representable, so chunk-
    granular pruning keeps working at narrow batch sizes (misaligned
    1536-row tiles under alternating 1024-row chunks skip nothing:
    measured 12.05 -> 7.65 ms for b=1 filtered at 10M x 768 on v5e)."""
    from otters_tpu.ops import pallas_topk as pk

    n_pad = 10_002_432  # the 10M store's padded row count
    # b=1 at d=768 used to pick 1536; with chunk=1024 it must align to 1024
    assert pk.choose_tile(768, n_pad, pk._pad_b(1)) == 1536
    assert pk.choose_tile(768, n_pad, pk._pad_b(1), chunk=1024) == 1024
    # chunk already divides the tile: unchanged
    assert pk.choose_tile(768, n_pad, pk._pad_b(1), chunk=512) == 1536
    # chunk larger than the tile: tiles nest inside chunks, skipping works
    assert pk.choose_tile(768, n_pad, pk._pad_b(1), chunk=2048) == 1536
    # chunk not a BIN multiple: alignment impossible, keep the plain tile
    assert pk.choose_tile(768, n_pad, pk._pad_b(1), chunk=1000) == 1536
    # b=256 at d=768 already picks the chunk size
    assert pk.choose_tile(768, n_pad, pk._pad_b(256), chunk=1024) == 1024


def test_pallas_topk_honors_caller_tile(rng=None):
    """The kernel derives the tile size from tile_alive's length (the
    caller's chunk-aligned choice), not from recomputing choose_tile."""
    import numpy as np

    from otters_tpu.ops import pallas_topk as pk, scoring
    from otters_tpu.types import Cmp, Metric

    rng = np.random.default_rng(0)
    n, d, b, k = 4096, 32, 4, 7
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    dv = scoring.materialize(vecs)
    n_pad = dv.vectors.shape[0]
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    rmask = jnp.ones(n_pad, dtype=jnp.bool_)
    ref = None
    for t in (512, 1024):
        if n_pad % t:
            continue
        alive = jnp.ones(n_pad // t, dtype=jnp.bool_)
        rows, scores, ok, _, _ = pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q, rmask,
            jnp.float32(-2.0), alive, metric=Metric.Cosine, k=k,
            take_min=False, cmp=Cmp.Gt, interpret=True,
        )
        got = sorted(int(r) for r, o in zip(rows, ok) if o)
        if ref is None:
            ref = got
        else:
            assert got == ref
    assert ref  # at least one tile size ran


def test_choose_tile_admits_wide_batches():
    """The combined VMEM bound shrinks the tile for wide batches instead of
    leaving pallas_ok to reject them (B=512 -> T=512 fits; existing
    narrow/medium choices are unchanged by the extra bound)."""
    from otters_tpu.ops import pallas_topk as pk

    n_pad = 10_002_432
    t512 = pk.choose_tile(768, n_pad, pk._pad_b(512), chunk=1024)
    assert t512 == 512
    vmem = 512 * 768 * 4 + 2 * t512 * 768 * 4 + 3 * t512 * 512 * 4
    assert vmem <= 13 * (1 << 20)
    t1024 = pk.choose_tile(768, n_pad, pk._pad_b(1024), chunk=1024)
    vmem = 1024 * 768 * 4 + 2 * t1024 * 768 * 4 + 3 * t1024 * 1024 * 4
    assert vmem <= 13 * (1 << 20)


def test_pallas_large_k_gather_phase2(data):
    """k > PHASE2_SCAN_MAX_BINS exercises the batched-gather phase-2 path."""
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(vectors.shape[1], n_pad, pk._pad_b(queries.shape[0]))
    alive = jnp.ones(n_pad // t, dtype=bool)
    k = pk.PHASE2_SCAN_MAX_BINS + 44  # forces kb > the scan threshold
    rows, scores, ok = _run_pallas(dv, queries, alive, k=k)
    want = _oracle(vectors, queries, Metric.DotProduct, k, False)
    assert ok.all()
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-5)


def test_choose_tile_chunk_alignment_fallback():
    """Odd-multiple-of-512 n_pad with chunk=1024: the tile must still align
    to a chunk multiple that divides n_pad (ADVICE r2)."""
    d = 64
    n_pad = 512 * 21  # 10752: not a multiple of the budget-aligned tile
    t = pk.choose_tile(d, n_pad, pk.LANE, chunk=1024)
    # n_pad has no divisor that is a multiple of 1024 except... 1024*? ->
    # 10752 = 1024 * 10.5, so no chunk-aligned tile divides it; the fallback
    # must still return a BIN multiple dividing n_pad
    assert n_pad % t == 0 and t % pk.BIN == 0
    n_pad2 = 1024 * 21  # chunk multiple: expect a chunk-aligned divisor
    t2 = pk.choose_tile(d, n_pad2, pk.LANE, chunk=1024)
    assert n_pad2 % t2 == 0 and t2 % 1024 == 0


def test_pallas_rejects_vmem_blowing_tile(data):
    """A too-short tile_alive (implied tile over the VMEM budget) raises a
    clear ValueError instead of an opaque Mosaic error (ADVICE r2)."""
    vectors, queries, dv = data
    n_pad = dv.vectors.shape[0]
    with pytest.raises(ValueError, match="VMEM"):
        pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            jnp.asarray(queries), None, jnp.float32(0.0),
            jnp.ones(1, dtype=bool),  # implied tile = n_pad (16384 rows)
            metric=Metric.DotProduct, k=5, take_min=False, cmp=None,
            interpret=True,
        )
