"""Certified-exact int8 scan (round-4: exactness BY CONSTRUCTION).

The reference's core promise is recall@k = 1.0 by construction, not by
measurement (/root/reference/README.md:7-14). Over quantized int8 storage
otters-tpu keeps that promise with a sound residual-bound certificate: the
scan additionally returns an upper bound on the TRUE (f32) cosine of every
row it did NOT hand to the exact rerank; ``result()`` compares the k-th
exact rerank score against that bound and auto-widens the scan (4x per
round) until the certificate passes. ``MetaQueryStats.certified`` /
``scan_k_wide`` surface the outcome.

The adversarial fixtures here construct rows whose QUANTIZED order inverts
the true order (score gaps far below the int8 quantization error), so a
narrow scan provably cannot contain the true top-k — the certificate must
catch it and the widened result must match the f32 oracle exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore
from otters_tpu.datasets import synthetic_catalog
from otters_tpu.errors import OttersError


def _cosine_oracle(qs, vecs):
    qi = 1.0 / np.linalg.norm(qs, axis=1)
    vi = np.linalg.norm(vecs, axis=1)
    vi = np.where(vi > 0, 1.0 / vi, 0.0)
    return (qs @ vecs.T) * qi[:, None] * vi[None, :]


def _int8_store(vecs, chunk=512, ids=None):
    n = vecs.shape[0]
    ids = Column("id", DataType.Int64).from_values(
        list(range(n)) if ids is None else ids
    )
    return (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )


def _near_tie_vectors(n=8192, n_tie=256, d=64, seed=7):
    """Rows 0..n_tie-1 have true cosines ~0.956..0.999 to the query with
    adjacent gaps ~1.7e-4: far ABOVE f32 rerank resolution (~4e-6 at d=64,
    so the exact rerank orders them deterministically) yet far BELOW the
    int8 residual (~1e-2), so ~60 rows sit inside any one quantization-error
    window and the quantized order among them is scrambled. The rest are
    random noise (cosine ~0). Returns (vectors, query, true_order)."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=d).astype(np.float64)
    u /= np.linalg.norm(u)
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    eps = 0.05 + 0.25 * rng.permutation(n_tie) / n_tie  # distinct small gaps
    w = rng.normal(size=(n_tie, d))
    w -= (w @ u)[:, None] * u[None, :]  # orthogonal perturbations
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    vecs[:n_tie] = u[None, :] + eps[:, None] * w
    vecs = vecs.astype(np.float32)
    q = u.astype(np.float32)[None, :]
    s = _cosine_oracle(q, vecs)[0]
    order = np.argsort(-s, kind="stable")
    return vecs, q, order


def test_certificate_passes_normal_data():
    vecs, cols = synthetic_catalog(20_000, 64, seed=3)
    store = (
        MetaStore.from_columns(list(cols.values()))
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    rng = np.random.default_rng(0)
    qs = (vecs[:4] + 0.05 * rng.normal(size=(4, 64))).astype(np.float32)
    res = (
        store.query_batch(qs, Metric.Cosine).take(10, rerank_from=200).collect()
    )
    stats = store.last_query_stats()
    assert stats.certified is True
    assert stats.scan_k_wide is not None and stats.scan_k_wide >= 200
    s = _cosine_oracle(qs, vecs).reshape(-1)
    want_rows = (np.argsort(-s, kind="stable")[:10] % vecs.shape[0]).tolist()
    assert sorted(res.indices) == sorted(want_rows)
    np.testing.assert_allclose(
        np.asarray(res.scores), np.sort(s)[::-1][:10], rtol=1e-5, atol=1e-6
    )


def test_adversarial_near_ties_widen_and_exact():
    """256 quantization-scrambled near-ties, scan width 20: the certificate
    MUST fail at 20 (236 unreturned rows sit within residual error of the
    k-th score) and auto-widen until every near-tie is examined; the final
    result must equal the f32 oracle top-10 exactly."""
    vecs, q, order = _near_tie_vectors()
    store = _int8_store(vecs)
    res = store.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect()
    stats = store.last_query_stats()
    assert stats.certified is True
    assert stats.scan_k_wide > 20  # widening provably happened
    assert res.indices == order[:10].tolist()
    s = _cosine_oracle(q, vecs)[0]
    np.testing.assert_allclose(
        np.asarray(res.scores), s[order[:10]], rtol=1e-5, atol=1e-6
    )
    # the working width is remembered (keyed per plan shape): the next
    # identical query starts wide and certifies without re-widening
    assert list(store._cert_kwide_hint.values()) == [stats.scan_k_wide]
    hint = stats.scan_k_wide
    res2 = store.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect()
    stats2 = store.last_query_stats()
    assert stats2.certified is True
    assert stats2.scan_k_wide == hint
    assert res2.indices == res.indices


def test_adversarial_certify_false_keeps_measured_behavior():
    vecs, q, order = _near_tie_vectors(seed=11)
    store = _int8_store(vecs)
    res = (
        store.query(q[0], Metric.Cosine)
        .take(10, rerank_from=20, certify=False)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.certified is None
    assert stats.scan_k_wide is None
    assert len(res) == 10  # answered, just not certified


def test_certify_true_raises_on_uncertifiable_shape():
    vecs, _ = synthetic_catalog(2_048, 32, seed=1)
    f32_store = (
        MetaStore.from_columns(
            [Column("id", DataType.Int64).from_values(list(range(2_048)))]
        )
        .with_vectors(vecs)
        .with_chunk_size(256)
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    with pytest.raises(OttersError, match="certify"):
        (
            f32_store.query(vecs[0], Metric.Cosine)
            .take(5, rerank_from=50, certify=True)
            .collect()
        )
    int8_store = _int8_store(vecs, chunk=256)
    with pytest.raises(OttersError, match="certify"):
        (
            int8_store.query(vecs[0], Metric.Cosine)
            .vec_filter(0.9, Cmp.Lt)
            .take(5, rerank_from=50, certify=True)
            .collect()
        )


def test_certificate_with_gt_filter_loosened_threshold():
    """A Gt score filter near the tie cluster: the quantized phase runs with
    a loosened threshold (no truly-passing row may be dropped on its
    quantized score) and the exact rerank re-applies the true threshold."""
    vecs, q, order = _near_tie_vectors(seed=23)
    store = _int8_store(vecs)
    s = _cosine_oracle(q, vecs)[0]
    thr = float(np.sort(s)[::-1][40])  # ~40 rows truly pass
    res = (
        store.query(q[0], Metric.Cosine)
        .vec_filter(thr, Cmp.Gt)
        .take(10, rerank_from=20)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.certified is True
    want = [int(i) for i in order if s[i] > thr][:10]
    assert res.indices == want
    assert all(x > thr for x in res.scores)


def test_certificate_fewer_than_k_results():
    """Only 3 rows pass the filter, take(10): the scan returns every passing
    row, the bound is -inf (nothing unexamined can pass), certified."""
    rng = np.random.default_rng(5)
    d = 64
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    vecs = rng.normal(size=(4096, d))
    vecs -= (vecs @ u)[:, None] * u[None, :]  # all ~orthogonal to q
    vecs[:3] = u[None, :] + 0.05 * rng.normal(size=(3, d))
    vecs = vecs.astype(np.float32)
    store = _int8_store(vecs, chunk=512)
    res = (
        store.query(u.astype(np.float32), Metric.Cosine)
        .vec_filter(0.5, Cmp.Gt)
        .take(10, rerank_from=10)
        .collect()
    )
    stats = store.last_query_stats()
    assert stats.certified is True
    s = _cosine_oracle(u.astype(np.float32)[None], vecs)[0]
    want = [int(i) for i in np.argsort(-s, kind="stable") if s[i] > 0.5]
    assert res.indices == want
    assert len(res) == 3


def test_certificate_auto_on_by_default_and_stats_none_without_rerank():
    """certify defaults to auto: on for int8+Cosine+rerank, absent (None in
    stats) when there is no rerank_from at all."""
    vecs, _ = synthetic_catalog(4_096, 32, seed=9)
    store = (
        MetaStore.from_columns(
            [Column("id", DataType.Int64).from_values(list(range(4_096)))]
        )
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    store.query(vecs[0], Metric.Cosine).take(5).collect()
    assert store.last_query_stats().certified is None
    store.query(vecs[0], Metric.Cosine).take(5, rerank_from=100).collect()
    assert store.last_query_stats().certified is True


def test_cert_cap_warns_and_reports_uncertified(monkeypatch):
    """With the widening cap pinned below what the adversarial data needs,
    the query still answers (quantized-scan + exact-rerank contract) but
    reports certified=False and warns."""
    monkeypatch.setenv("OTTERS_CERT_KWIDE_MAX", "64")
    vecs, q, order = _near_tie_vectors(seed=31)
    store = _int8_store(vecs)
    with pytest.warns(UserWarning, match="certificate did not pass"):
        res = (
            store.query(q[0], Metric.Cosine).take(10, rerank_from=16).collect()
        )
    stats = store.last_query_stats()
    assert stats.certified is False
    assert stats.scan_k_wide == 64
    assert len(res) == 10


def test_pallas_certify_bound_is_sound():
    """Kernel-level: the pallas path's returned bound must upper-bound the
    TRUE cosine of every row not in the returned candidate set (interpret
    mode; the same code path the TPU runs)."""
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring

    rng = np.random.default_rng(17)
    d, n, b, k = 64, 2048, 2, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    vecs[:64] = (u[None, :] + 0.02 * rng.normal(size=(64, d))).astype(
        np.float32
    )
    qs = np.stack([u, rng.normal(size=d)]).astype(np.float32)
    dv = scoring.materialize(vecs, dtype=jnp.int8)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(b))
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok, check, bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(qs), None, jnp.float32(0.0), alive,
        metric=Metric.Cosine, k=k, take_min=False, cmp=None,
        prec="default", interpret=True, certify=True,
        resid=dv.resid, resid_bin=dv.resid_bin,
    )
    rows = np.asarray(rows)[np.asarray(ok, dtype=bool)]
    bnd = float(bound)
    s_true = _cosine_oracle(qs, vecs)  # [b, n]
    unret = np.ones(n, dtype=bool)
    unret[rows % n] = False
    assert bnd >= float(s_true[:, unret].max()) - 1e-7
    # tightness: once the scan is wide enough to return the whole near-tie
    # cluster, only noise rows (cos ~0) are unexamined and the bound must
    # collapse to noise + slack, far below the cluster scores
    rows2, _, ok2, _, bound2 = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(qs), None, jnp.float32(0.0), alive,
        metric=Metric.Cosine, k=256, take_min=False, cmp=None,
        prec="default", interpret=True, certify=True,
        resid=dv.resid, resid_bin=dv.resid_bin,
    )
    r2 = np.asarray(rows2)[np.asarray(ok2, dtype=bool)]
    unret2 = np.ones(n, dtype=bool)
    unret2[r2 % n] = False
    assert float(bound2) >= float(s_true[:, unret2].max()) - 1e-7
    assert float(bound2) < 0.8 < float(s_true.max())


def test_core_certify_bound_is_sound():
    """Same soundness contract on the non-pallas (direct/panel) program:
    run the full meta program via a store query and check the fetched bound
    against the oracle."""
    vecs, q, order = _near_tie_vectors(n=4096, n_tie=64, seed=41)
    store = _int8_store(vecs)
    p = store.query(q[0], Metric.Cosine).take(8, rerank_from=16).collect_async()
    import jax

    rows, scrs, valid, check, bound, ev, re_ = jax.device_get(p._raw)
    rows = np.asarray(rows)[np.asarray(valid, dtype=bool)]
    s_true = _cosine_oracle(q, vecs)[0]
    unret = np.ones(vecs.shape[0], dtype=bool)
    unret[rows] = False
    assert float(bound) >= float(s_true[unret].max()) - 1e-7
    p.result()  # drain


@pytest.mark.parametrize("via_shard", [False, True])
def test_sharded_certificate_exact(via_shard):
    """The certificate composes across the 8-device mesh: per-shard bounds
    pmax-merged with the merged-k-th bound. Both ingest routes (direct
    build_sharded and shard() of a single-device store) must certify and
    match the oracle."""
    import jax
    from jax.sharding import Mesh

    from otters_tpu.parallel.meta_sharded import ShardedMetaStore, build_sharded

    vecs, q, order = _near_tie_vectors(n=16384, n_tie=128, seed=13)
    ids = Column("id", DataType.Int64).from_values(list(range(len(vecs))))
    builder = (
        MetaStore.from_columns([ids])
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("rows", "batch"))
    if via_shard:
        store = ShardedMetaStore.shard(builder.build(), mesh)
    else:
        store = build_sharded(builder, mesh)
    res = store.query(q[0], Metric.Cosine).take(10, rerank_from=16).collect()
    stats = store.last_query_stats()
    assert stats.certified is True
    assert stats.scan_k_wide > 16
    assert res.indices == order[:10].tolist()
    s = _cosine_oracle(q, vecs)[0]
    np.testing.assert_allclose(
        np.asarray(res.scores), s[order[:10]], rtol=1e-5, atol=1e-6
    )


def test_hint_is_per_plan_shape():
    """A prune-heavy filtered plan's wide certified width must NOT widen an
    unfiltered plan's scans (hint cross-contamination would eventually push
    the headline path off the fused kernel)."""
    vecs, q, order = _near_tie_vectors(seed=47)
    n = len(vecs)
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    flag = Column("flag", DataType.Int32).from_values(
        [i % 2 for i in range(n)]
    )
    store = (
        MetaStore.from_columns([ids, flag])
        .with_vectors(vecs)
        .with_chunk_size(512)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    from otters_tpu import col

    # filtered plan: widens to certify
    store.query(q[0], Metric.Cosine).meta_filter(col("flag").eq(0)).take(
        10, rerank_from=20
    ).collect()
    w_filtered = store.last_query_stats().scan_k_wide
    assert w_filtered > 20
    # unfiltered plan: must start at ITS OWN width (20), not the filtered
    # plan's widened one
    store.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect()
    st = store.last_query_stats()
    assert st.certified is True
    assert len(store._cert_kwide_hint) == 2  # two distinct plan shapes


import os


@pytest.mark.parametrize(
    "trial", range(int(os.environ.get("OTTERS_CERT_FUZZ_TRIALS", "15")))
)
def test_cert_soundness_fuzz(trial):
    """Property fuzz for the certificate's core contract: whenever a query
    reports certified=True, its results must EXACTLY equal the f32 oracle
    (same rows, same order) — across random shapes, tie structures, k,
    rerank widths, and Gt filters. certified=False is allowed (cap), wrong
    certified results are not."""
    rng = np.random.default_rng(1000 + trial)
    d = int(rng.choice([16, 32, 64, 96]))
    n = int(rng.choice([2048, 4096, 8192]))
    n_tie = int(rng.choice([0, 32, 128]))
    vecs = rng.normal(size=(n, d))
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    if n_tie:
        w = rng.normal(size=(n_tie, d))
        w -= (w @ u)[:, None] * u[None, :]
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        eps = 0.05 + 0.3 * rng.permutation(n_tie) / max(n_tie, 1)
        vecs[:n_tie] = u[None, :] + eps[:, None] * w
    vecs = vecs.astype(np.float32)
    store = _int8_store(vecs, chunk=int(rng.choice([256, 512])))
    k = int(rng.integers(1, 12))
    kw = int(rng.integers(k, 4 * k + 8))
    q = (u + 0.01 * rng.normal(size=d)).astype(np.float32)
    plan = store.query(q, Metric.Cosine)
    s = _cosine_oracle(q[None], vecs)[0]
    thr = None
    if rng.random() < 0.4:
        thr = float(np.quantile(s, rng.uniform(0.5, 0.999)))
        plan = plan.vec_filter(thr, Cmp.Gt)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = plan.take(k, rerank_from=kw).collect()
    st = store.last_query_stats()
    if st.certified is not True:
        return  # cap hit — allowed, just not certified
    if thr is not None:
        s = np.where(s > thr, s, -np.inf)
    want = [int(i) for i in np.argsort(-s, kind="stable") if s[i] > -np.inf][
        :k
    ]
    assert res.indices == want, (trial, res.indices, want)
    np.testing.assert_allclose(
        np.asarray(res.scores), s[want], rtol=1e-5, atol=1e-6
    )


def test_certify_true_requires_rerank_and_rejects_windowed():
    """Review regressions: certify=True without rerank_from must raise (it
    silently no-op'd), and certify=True whose k falls into the windowed
    take-all regime must raise rather than silently answer uncertified."""
    vecs, _ = synthetic_catalog(2_048, 32, seed=2)
    store = _int8_store(vecs, chunk=256)
    with pytest.raises(OttersError, match="requires rerank_from"):
        store.query(vecs[0], Metric.Cosine).take(5, certify=True)
    from otters_tpu.ops import scoring as _sc

    if store._supports_windowed and _sc.needs_windowed(
        store._dv.vectors.shape[0], 1, 2_048
    ):
        with pytest.raises(OttersError, match="windowed"):
            (
                store.query(vecs[0], Metric.Cosine)
                .take(2_048, rerank_from=2_048, certify=True)
                .collect()
            )


def test_widen_sequence_clamps_at_pallas_boundary():
    """The widen loop must try the fused-kernel k limit before exceeding it
    (a hint landing past it would de-fuse every later scan of the plan
    shape), and the duplicated constant must match the kernel's."""
    from otters_tpu import meta as meta_mod
    from otters_tpu.ops import pallas_topk as pk

    assert meta_mod._PALLAS_K_MAX == pk.PALLAS_K_MAX

    # simulate the sequence arithmetic the loop runs
    def seq(start, cap):
        out, k = [], start
        while k < cap and len(out) < 10:
            nxt = min(max(k * 4, k + 1), cap)
            if k < meta_mod._PALLAS_K_MAX < nxt:
                nxt = meta_mod._PALLAS_K_MAX
            out.append(nxt)
            k = nxt
        return out

    assert seq(400, 4096) == [1024, 4096]  # NOT 1600
    assert seq(100, 4096) == [400, 1024, 4096]
    assert seq(16, 64) == [64]  # caps below the boundary are untouched


@pytest.mark.parametrize(
    "trial", range(int(os.environ.get("OTTERS_CERT_PALLAS_TRIALS", "6")))
)
def test_pallas_cert_bound_soundness_fuzz(trial):
    """Interpret-mode fuzz of the KERNEL's certificate bound: for random
    shapes/batches/ties/k, every row not in the returned candidate set must
    have true cosine <= bound (the property the whole certificate rests
    on)."""
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring

    rng = np.random.default_rng(500 + trial)
    d = int(rng.choice([32, 64, 128]))
    n = int(rng.choice([1024, 2048]))
    b = int(rng.choice([1, 2, 5]))
    k = int(rng.choice([4, 16, 64]))
    vecs = rng.normal(size=(n, d))
    n_tie = int(rng.choice([0, 64]))
    if n_tie:
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        w = rng.normal(size=(n_tie, d))
        w -= (w @ u)[:, None] * u[None, :]
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        vecs[:n_tie] = u[None, :] + (
            0.05 + 0.3 * rng.permutation(n_tie) / n_tie
        )[:, None] * w
    vecs = vecs.astype(np.float32)
    qs = rng.normal(size=(b, d)).astype(np.float32)
    if n_tie:
        qs[0] = u + 0.01 * rng.normal(size=d)
    dv = scoring.materialize(vecs, dtype=jnp.int8)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(b))
    if n_pad % t:
        return
    alive = jnp.ones(n_pad // t, dtype=bool)
    rows, scores, ok, check, bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(qs), None, jnp.float32(0.0), alive,
        metric=Metric.Cosine, k=k, take_min=False, cmp=None,
        prec="default", interpret=True, certify=True,
        resid=dv.resid, resid_bin=dv.resid_bin,
    )
    returned = np.asarray(rows)[np.asarray(ok, dtype=bool)] % n
    unret = np.ones(n, dtype=bool)
    unret[returned] = False
    if not unret.any():
        return
    s_true = _cosine_oracle(qs, vecs)
    assert float(bound) >= float(s_true[:, unret].max()) - 1e-7, (
        trial, float(bound), float(s_true[:, unret].max())
    )


def test_mixed_certified_uncertified_resolve_group():
    """resolve() groups pendings by plan signature but NOT by certify; a
    mixed group must give each pending its own certificate outcome and the
    certified one exact results."""
    from otters_tpu.meta import resolve

    vecs, q, order = _near_tie_vectors(n_tie=128, seed=53)
    store = _int8_store(vecs)
    p1 = store.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect_async()
    p2 = (
        store.query(q[0], Metric.Cosine)
        .take(10, rerank_from=20, certify=False)
        .collect_async()
    )
    p3 = (
        store.query(vecs[5000], Metric.Cosine)
        .take(10, rerank_from=20)
        .collect_async()
    )
    r1, r2, r3 = resolve([p1, p2, p3])
    assert p1._certified is True and p2._certified is None
    assert p3._certified is True
    assert r1.indices == order[:10].tolist()


def test_cert_hints_persist_with_store(tmp_path):
    """VERDICT r4 item 7: a fresh process re-paid the widen discovery (a
    wasted full scan + rerank per too-narrow width). Hints now persist in
    the save manifest: the reloaded store starts at the discovered width
    and certifies without re-widening."""
    from otters_tpu.io import load_meta, save_meta

    vecs, q, order = _near_tie_vectors()
    store = _int8_store(vecs)
    store.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect()
    w = store.last_query_stats().scan_k_wide
    assert w > 20 and store.cert_hints()

    p = str(tmp_path / "near_tie.npz")
    save_meta(store, p)
    fresh = load_meta(p)
    assert fresh.cert_hints() == store.cert_hints()
    res = fresh.query(q[0], Metric.Cosine).take(10, rerank_from=20).collect()
    st = fresh.last_query_stats()
    assert st.certified is True
    assert st.scan_k_wide == w  # started at the hint, no rediscovery
    assert res.indices == order[:10].tolist()
    # the hint map is unchanged (nothing re-widened past the hint)
    assert fresh.cert_hints() == store.cert_hints()
