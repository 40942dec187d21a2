"""Exactness certificate beyond int8+Cosine (VERDICT r4 item 6).

The reference is exact for dot and euclidean too
(/root/reference/src/vec_compute.rs:9-54). bfloat16 storage now carries
per-row ABSOLUTE rounding residuals (||v - bf16(v)||), and the generalized
certificate fold (ops/scoring.cert_query_coeffs / cert_row_lanes) covers
Cosine, DotProduct (take-max) and Euclidean (take-min) on it — same
contract as the int8 cosine certificate: certified=True implies the result
equals the exact-f32 oracle BY CONSTRUCTION, with auto-widening when the
bound fails.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore
from otters_tpu.errors import OttersError


def _bf16_store(vecs, chunk=512):
    n = vecs.shape[0]
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    return (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .with_storage_dtype("bfloat16")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )


def _oracle(qs, vecs, metric):
    dots = qs.astype(np.float64) @ vecs.astype(np.float64).T
    if metric is Metric.DotProduct:
        return dots
    if metric is Metric.Cosine:
        qn = np.linalg.norm(qs, axis=1)
        vn = np.linalg.norm(vecs, axis=1)
        qi = np.where(qn > 0, 1.0 / np.where(qn > 0, qn, 1), 0)
        vi = np.where(vn > 0, 1.0 / np.where(vn > 0, vn, 1), 0)
        return dots * qi[:, None] * vi[None, :]
    return (
        (qs.astype(np.float64) ** 2).sum(1)[:, None]
        + (vecs.astype(np.float64) ** 2).sum(1)[None, :]
        - 2.0 * dots
    )


METRICS = [Metric.Cosine, Metric.DotProduct, Metric.Euclidean]


@pytest.mark.parametrize("metric", METRICS)
def test_bf16_certificate_normal_data(metric):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(8192, 48)).astype(np.float32)
    store = _bf16_store(vecs)
    qs = rng.normal(size=(3, 48)).astype(np.float32)
    res = store.query_batch(qs, metric).take(10, rerank_from=100).collect()
    st = store.last_query_stats()
    assert st.certified is True, st
    s = _oracle(qs, vecs, metric).reshape(-1)
    sign = 1 if metric is Metric.Euclidean else -1
    want = (np.argsort(sign * s, kind="stable")[:10] % 8192).tolist()
    assert sorted(res.indices) == sorted(want)


@pytest.mark.parametrize("metric", METRICS)
def test_bf16_adversarial_near_ties_widen_and_exact(metric):
    """Gaps far below bf16 rounding (~2^-9 relative) but far above f32
    rerank resolution: the narrow scan cannot rank them, the certificate
    must catch it and widen until the result equals the f64 oracle."""
    rng = np.random.default_rng(17)
    n, n_tie, d = 4096, 192, 64
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    vecs = 0.05 * rng.normal(size=(n, d))
    # near-ties: same direction, norms spread by ~3e-5 relative steps —
    # under bf16 rounding (~4e-3 relative on the dot) their scan order is
    # noise for ALL three metrics, but f32 rerank resolves ~1e-7
    scale = 1.0 + 3e-5 * rng.permutation(n_tie)
    w = rng.normal(size=(n_tie, d))
    w -= (w @ u)[:, None] * u[None, :]
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    vecs[:n_tie] = scale[:, None] * (
        u[None, :] + 0.2 * rng.random((n_tie, 1)) * w
    )
    vecs = vecs.astype(np.float32)
    q = (2.0 * u).astype(np.float32)[None, :]

    store = _bf16_store(vecs)
    res = store.query(q[0], metric).take(10, rerank_from=16).collect()
    st = store.last_query_stats()
    assert st.certified is True
    assert st.scan_k_wide > 16  # widening provably happened
    s = _oracle(q, vecs, metric)[0]
    sign = 1 if metric is Metric.Euclidean else -1
    order = np.argsort(sign * s, kind="stable")
    assert res.indices == order[:10].tolist()


@pytest.mark.parametrize(
    "metric,cmp,frac",
    [
        (Metric.DotProduct, Cmp.Gt, 0.9),
        (Metric.Euclidean, Cmp.Lt, 1.1),
        (Metric.Euclidean, Cmp.Lte, 1.1),
    ],
)
def test_bf16_certificate_with_filter_loosened_threshold(metric, cmp, frac):
    """The scan threshold is loosened by the global slack so no truly
    passing row is dropped on its bf16 scan score; the rerank re-applies
    the exact filter. Threshold sits in the near-tie band."""
    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(4096, 32)).astype(np.float32)
    store = _bf16_store(vecs)
    q = rng.normal(size=32).astype(np.float32)
    s = _oracle(q[None], vecs, metric)[0]
    sign = 1 if metric is Metric.Euclidean else -1
    order = np.argsort(sign * s, kind="stable")
    thr = float(s[order[20]]) * frac if frac != 1.1 else float(s[order[20]])
    plan = store.query(q, metric).vec_filter(thr, cmp).take(
        10, rerank_from=64
    )
    res = plan.collect()
    st = store.last_query_stats()
    assert st.certified is True
    if cmp is Cmp.Gt:
        passing = [i for i in order if s[i] > thr]
    elif cmp is Cmp.Lt:
        passing = [i for i in order if s[i] < thr]
    else:
        passing = [i for i in order if s[i] <= thr]
    want = passing[:10]
    # f32-vs-f64 boundary rows: compare by set of scores instead of ids
    got_s = np.sort(s[np.asarray(res.indices)])
    want_s = np.sort(s[np.asarray(want)])
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-6)


def test_certify_true_rejects_f32_and_vpu():
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(1024, 16)).astype(np.float32)
    n = vecs.shape[0]
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    f32_store = (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    with pytest.raises(OttersError, match="certify"):
        f32_store.query(vecs[0], Metric.Cosine).take(
            5, rerank_from=50, certify=True
        ).collect()
    bstore = _bf16_store(vecs, chunk=256)
    with pytest.raises(OttersError, match="certify"):
        # VPU metric: no certificate
        bstore.query(vecs[0], Metric.Manhattan).take(
            5, rerank_from=50, certify=True
        ).collect()


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("trial", range(6))
def test_bf16_cert_soundness_fuzz(metric, trial):
    """Property the whole certificate rests on: certified=True implies the
    result EQUALS the f32 oracle (indices by score-set equality to absorb
    f32-vs-f64 tie noise)."""
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(600, 3000))
    d = int(rng.integers(8, 96))
    k = int(rng.integers(1, 16))
    kw = int(rng.integers(k, 4 * k + 8))
    vecs = (rng.normal(size=(n, d)) * rng.choice([1e-3, 1.0, 40.0])).astype(
        np.float32
    )
    if trial % 2:
        vecs[rng.integers(0, n)] = 0.0  # zero-norm row
    store = _bf16_store(vecs, chunk=256)
    qs = rng.normal(size=(int(rng.integers(1, 5)), d)).astype(np.float32)
    if trial % 3 == 0:
        qs[0] = 0.0  # zero-norm query
    res = store.query_batch(qs, metric).take(k, rerank_from=kw).collect()
    st = store.last_query_stats()
    assert st.certified is True  # no filter: must always certify via widen
    s = _oracle(qs, vecs, metric).reshape(-1)
    sign = 1 if metric is Metric.Euclidean else -1
    want_s = np.sort(sign * np.sort(sign * s)[: len(res.scores)])
    got_s = np.sort(np.asarray(res.scores))
    tol = 2e-5 * (1.0 + float(np.abs(want_s).max(initial=0.0)))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=tol)


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("trial", range(3))
def test_pallas_bf16_cert_bound_is_sound(metric, trial):
    """KERNEL-level (interpret mode): the fused kernel's certificate bound
    must cover the true KEY (negated distance for Euclidean) of every row
    NOT among the returned candidates — the property the whole bf16
    certificate rests on, exercised for all three metrics."""
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring

    rng = np.random.default_rng(300 + trial)
    n, d, b, k = 2048, 64, 3, 24
    vecs = (rng.normal(size=(n, d)) * rng.choice([0.01, 1.0, 30.0])).astype(
        np.float32
    )
    if trial == 1:
        vecs[7] = 0.0
    dv = scoring.materialize(vecs, dtype=jnp.bfloat16)
    assert dv.resid is not None and dv.resid_bin is not None
    qs = rng.normal(size=(b, d)).astype(np.float32)
    n_pad = dv.vectors.shape[0]
    take_min = metric is Metric.Euclidean
    t = pk.choose_tile(d, n_pad, pk._pad_b(b))
    alive = jnp.ones(n_pad // t, dtype=jnp.bool_)
    rows, scores, ok, check, bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(qs), None, jnp.float32(0.0), alive,
        metric=metric, k=k, take_min=take_min, cmp=None,
        prec="highest", interpret=True, certify=True,
        resid=dv.resid, resid_bin=dv.resid_bin,
    )
    rows = np.asarray(rows)[np.asarray(ok, bool)]
    s_true = _oracle(qs, vecs, metric)  # [b, n] f64
    key_true = -s_true if take_min else s_true
    unret = np.setdiff1d(np.arange(n), rows)
    if unret.size:
        assert float(bound) >= float(key_true[:, unret].max()) - 1e-7, (
            metric, float(bound), float(key_true[:, unret].max()),
        )


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("via_shard", [False, True])
def test_sharded_bf16_certificate_exact(metric, via_shard):
    """The generalized certificate composes across the 8-device mesh for
    bf16 storage too: per-shard bounds pmax-merged with the merged-k-th
    bound, for all three metrics and both ingest routes."""
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel.meta_sharded import (
        ShardedMetaStore,
        build_sharded,
    )

    rng = np.random.default_rng(31)
    n, d = 16384, 48
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    builder = (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .with_storage_dtype("bfloat16")
        .with_rerank_source(keep_host_f32=True)
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("rows", "batch"))
    store = (
        ShardedMetaStore.shard(builder.build(), mesh)
        if via_shard
        else build_sharded(builder, mesh)
    )
    assert store._dv.resid is not None  # both routes carry residuals
    q = rng.normal(size=(2, d)).astype(np.float32)
    res = store.query_batch(q, metric).take(10, rerank_from=64).collect()
    stats = store.last_query_stats()
    assert stats.certified is True
    s = _oracle(q, vecs, metric).reshape(-1)
    sign = 1 if metric is Metric.Euclidean else -1
    want = np.sort(sign * np.sort(sign * s)[:10])
    got = np.sort(np.asarray(res.scores))
    tol = 2e-5 * (1.0 + float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=tol)


def test_bf16_sharded_save_load_keeps_resid(tmp_path):
    """sharded-v1 persists the ORIGINAL-source bf16 residuals; the reloaded
    store still certifies (the reload requantizes exact bf16 payloads, so
    recomputed residuals would collapse to 0 and falsely certify against a
    re-attached true-f32 source)."""
    import jax
    from jax.sharding import Mesh

    from otters_tpu.io import load_meta, save_meta_sharded
    from otters_tpu.parallel.meta_sharded import build_sharded

    rng = np.random.default_rng(41)
    n, d = 16384, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("rows", "batch"))
    store = build_sharded(
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .with_storage_dtype("bfloat16"),
        mesh,
    )
    orig_resid = np.asarray(store._host_gather(store._dv.resid))
    assert float(orig_resid.max()) > 0
    p = str(tmp_path / "bf16_sharded")
    save_meta_sharded(store, p)
    fresh = load_meta(p, mesh=mesh)
    got = np.asarray(fresh._host_gather(fresh._dv.resid))
    np.testing.assert_array_equal(got, orig_resid)
    # re-attach a true-f32 source and certify a dot query
    fresh._rerank_fetch = lambda i: vecs[np.asarray(i, dtype=np.int64)]
    res = fresh.query(vecs[7], Metric.DotProduct).take(
        5, rerank_from=32
    ).collect()
    assert fresh.last_query_stats().certified is True
    s = _oracle(vecs[7][None], vecs, Metric.DotProduct)[0]
    want = np.sort(s)[::-1][:5]
    np.testing.assert_allclose(
        np.sort(res.scores)[::-1], want, rtol=2e-5, atol=1e-5
    )


def test_bf16_append_carries_original_resid():
    """Appending to a bf16 store re-quantizes exact bf16 values (resid
    would collapse to ~0); surviving rows must keep their ORIGINAL
    true-source residuals so the certificate stays sound."""
    rng = np.random.default_rng(43)
    n, d = 2048, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    store = (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("bfloat16")
        .build()
    )
    old = np.asarray(store._dv.resid)[:n]
    assert float(old.max()) > 0
    extra = rng.normal(size=(64, d)).astype(np.float32)
    new = store.append(extra, {"id": list(range(n, n + 64))})
    carried = np.asarray(new._dv.resid)[:n]
    np.testing.assert_array_equal(carried, old)
    appended = np.asarray(new._dv.resid)[n : n + 64]
    assert float(appended.max()) > 0  # fresh true-source values


def test_precompile_covers_cert_width_ladder():
    """precompile(rerank_from=...) readies the certificate's widen-ladder
    programs so an adversarial first query never pays a mid-serving
    compile (VERDICT r4 item 4)."""
    from otters_tpu import aot

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(4096, 32)).astype(np.float32)
    store = _bf16_store(vecs, chunk=512)
    n1 = store.precompile(
        batch_sizes=(2,), k=5, rerank_from=16, cert_widths=False
    )
    n2 = store.precompile(
        batch_sizes=(2,), k=5, rerank_from=16, cert_widths=True
    )
    assert n2 > n1  # the ladder programs were additionally readied
    # the widen dispatch now hits the prepared programs (cache keys exist)
    q = rng.normal(size=(2, 32)).astype(np.float32)
    res = store.query_batch(q, Metric.Cosine).take(5, rerank_from=16).collect()
    assert store.last_query_stats().certified is True
    assert len(res) == 5
