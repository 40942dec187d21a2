"""Regression tests for code-review findings."""

import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu.adapters import column_from_series
from otters_tpu.ops import pallas_topk as pk
from otters_tpu.ops import scoring
from otters_tpu.parallel import ShardedMetaStore, make_mesh
from otters_tpu.types import Cmp


def test_pallas_all_tiles_pruned_no_oob():
    """All-dead tile_alive must not index out of bounds (returns nothing)."""
    rng = np.random.default_rng(81)
    n, d = 16384, 128
    dv = scoring.materialize(rng.normal(size=(n, d)).astype(np.float32))
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(2))
    alive = jnp.zeros(n_pad // t, dtype=bool)
    row_mask = jnp.zeros(n_pad, dtype=bool)  # soundness contract
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(rng.normal(size=(2, d)).astype(np.float32)),
        row_mask, jnp.float32(0.0), alive,
        metric=Metric.DotProduct, k=5, take_min=False, cmp=None,
        interpret=True,
    )
    assert not np.asarray(ok).any()


def test_pallas_dead_slots_no_duplicate_rows():
    """k exceeding the alive candidate bins must not duplicate rows from the
    last alive tile (dead grid slots alias it through the survivor list)."""
    rng = np.random.default_rng(82)
    n, d, k = 16384, 128, 20
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    dv = scoring.materialize(vectors)
    n_pad = dv.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(1))
    n_tiles = n_pad // t
    alive = jnp.asarray(np.arange(n_tiles) == 0)  # one alive tile
    row_mask = np.zeros(n_pad, dtype=bool)
    row_mask[:t] = True
    rows, scores, ok, check, _bound = pk.pallas_topk(
        dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
        jnp.asarray(rng.normal(size=(1, d)).astype(np.float32)),
        jnp.asarray(row_mask), jnp.float32(0.0), alive,
        metric=Metric.DotProduct, k=k, take_min=False, cmp=None,
        interpret=True,
    )
    rows, ok = np.asarray(rows), np.asarray(ok)
    got = rows[ok].tolist()
    assert len(got) == len(set(got)), "duplicate rows returned"


def test_delete_rows_duplicate_indices_counted_once():
    rng = np.random.default_rng(83)
    store = MetaStore.from_columns([]).with_vectors(
        rng.normal(size=(10, 4)).astype(np.float32)
    ).build()
    store.delete_rows([3, 3, 3])
    assert len(store) == 9
    store.delete_rows([3, 4])
    assert len(store) == 8


def test_sharded_sorted_store_reports_original_ids():
    rng = np.random.default_rng(84)
    n, d = 2000, 16
    price = rng.permutation(n).astype(np.float64)
    cols = [Column("price", DataType.Float64).from_values(list(price))]
    local = (
        MetaStore.from_columns(cols)
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .with_chunk_size(256)
        .with_sort_by("price")
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(local, mesh)
    q = rng.normal(size=(2, d)).astype(np.float32)
    a = local.query_batch(q, Metric.Cosine).meta_filter(col("price").lt(300.0)).take(8).collect()
    b = sharded.query_batch(q, Metric.Cosine).meta_filter(col("price").lt(300.0)).take(8).collect()
    assert a.indices == b.indices
    assert all(price[i] < 300.0 for i in b.indices)
    # tombstone state also carried
    local2 = (
        MetaStore.from_columns(
            [Column("price", DataType.Float64).from_values(list(price))]
        )
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .build()
    )
    local2.delete_rows([0, 1])
    sh2 = ShardedMetaStore.shard(local2, mesh)
    assert len(sh2) == n - 2


def test_bf16_store_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(85)
    store = (
        MetaStore.from_columns([])
        .with_vectors(rng.normal(size=(300, 8)).astype(np.float32))
        .with_storage_dtype("bfloat16")
        .build()
    )
    path = str(tmp_path / "bf16.npz")
    store.save(path)
    loaded = MetaStore.load(path)
    q = rng.normal(size=8).astype(np.float32)
    a = store.query(q, Metric.DotProduct).take(5).collect()
    b = loaded.query(q, Metric.DotProduct).take(5).collect()
    assert a.indices == b.indices
    assert a.scores == b.scores


def test_adapter_nullable_int64_exact_above_2_53():
    big = 2**62 + 1
    s = pd.Series([big, pd.NA, 7], dtype="Int64")
    c = column_from_series(s, "id")
    assert int(c.i64_values()[0]) == big  # no float64 round-trip corruption
    rng = np.random.default_rng(86)
    store = (
        MetaStore.from_columns([c])
        .with_vectors(rng.normal(size=(3, 4)).astype(np.float32))
        .build()
    )
    r = (
        store.query(np.ones(4, np.float32), Metric.Cosine)
        .meta_filter(col("id").eq(big))
        .take(3)
        .collect()
    )
    assert r.indices == [0]


def test_vec_default_take_type_is_max_like_reference():
    """vec.rs:214: bare collect() without take() defaults to Max even for
    Euclidean (intentional reference parity; meta path differs)."""
    from otters_tpu import VecStore

    store = VecStore(2)
    store.add_vectors([[0.0, 0.0], [3.0, 4.0]])
    r = store.query([0.0, 0.0], Metric.Euclidean).filter(100.0, Cmp.Lt).collect()
    # Max ordering: farthest first
    assert [x.index for x in r] == [1, 0]


def test_sharded_int8_metric_guard():
    """The int8 Cosine-only guard must hold on sharded stores too (the
    backstop lives in _score_block, reachable from every path)."""
    import pytest as _pytest

    from otters_tpu import OttersError

    rng = np.random.default_rng(87)
    store = (
        MetaStore.from_columns([])
        .with_vectors(rng.normal(size=(1000, 8)).astype(np.float32))
        .with_storage_dtype("int8")
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(store, mesh)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    r = sharded.query_batch(q, Metric.Cosine).take(3).collect()
    assert len(r) == 3
    with _pytest.raises(OttersError, match="Cosine metric only"):
        sharded.query_batch(q, Metric.Euclidean).take(3).collect()


# ---- round-2 advisor findings (ADVICE.md) ----------------------------------


def test_from_values_validates_like_push():
    """ADVICE r1: the vectorized from_values path must not silently truncate
    floats into int columns or swallow type errors."""
    from otters_tpu.errors import ColumnTypeMismatch

    with pytest.raises(ColumnTypeMismatch):
        Column("a", DataType.Int32).from_values([1.5])
    with pytest.raises(ColumnTypeMismatch):
        Column("a", DataType.Int64).from_values(np.asarray([1.5, 2.5]))
    with pytest.raises(ColumnTypeMismatch):
        Column("a", DataType.Int32).from_values(["x", "y"])
    # valid numpy fast paths still work (including int -> float widening)
    c = Column("f", DataType.Float32).from_values(np.asarray([1, 2, 3]))
    assert list(c.values()) == [1.0, 2.0, 3.0]
    c2 = Column("i", DataType.Int64).from_values(np.asarray([2**40, -5]))
    assert list(c2.values()) == [2**40, -5]
    c3 = Column("d", DataType.DateTime).from_values(
        np.asarray([1000, 2000], dtype=np.int64)
    )
    assert list(c3.values()) == [1000, 2000]
    # bool arrays are not integers
    with pytest.raises(ColumnTypeMismatch):
        Column("i", DataType.Int32).from_values(np.asarray([True, False]))


def test_from_values_int32_overflow_raises():
    with pytest.raises((OverflowError, Exception)):
        Column("a", DataType.Int32).from_values([2**40])


def test_save_load_exact_path_no_suffix(tmp_path):
    """ADVICE r1: store.save('x.bin') must be loadable as 'x.bin'."""
    rng = np.random.default_rng(88)
    store = (
        MetaStore.from_columns([])
        .with_vectors(rng.normal(size=(20, 4)).astype(np.float32))
        .build()
    )
    path = str(tmp_path / "store.bin")
    store.save(path)
    import os

    assert os.path.exists(path)
    loaded = MetaStore.load(path)
    assert loaded.n_rows == 20


def test_choose_mode_midsize_many_queries():
    """ADVICE r1: 400k rows x large batch must pick a panel-capable padding,
    not raise 'too large for device memory'."""
    n_pad = scoring.pad_rows(400_000)
    assert n_pad % scoring.PANEL_BIN == 0
    assert scoring.choose_mode(n_pad, 1350, 10) == "panel"


def test_host_verifier_wraps_int32_literals():
    """ADVICE r1: a string Eq + out-of-i32-range threshold must not trigger
    the collision fallback — host verification wraps like the device."""
    rng = np.random.default_rng(89)
    n = 64
    ids = Column("id", DataType.Int32).from_values(list(range(n)))
    names = Column("name", DataType.String).from_values(
        ["a" if i % 2 == 0 else "b" for i in range(n)]
    )
    store = (
        MetaStore.from_columns([ids, names])
        .with_vectors(rng.normal(size=(n, 4)).astype(np.float32))
        .with_chunk_size(16)
        .build()
    )
    # 2**31 + 5 wraps to a negative i32 -> gt() matches EVERY row on device;
    # the host verifier must agree (no spurious exact-fallback divergence)
    expr = col("name").eq("a") & col("id").gt(2**31 + 5)
    r = (
        store.query(np.ones(4, np.float32), Metric.Cosine)
        .meta_filter(expr)
        .take(n)
        .collect()
    )
    assert sorted(r.indices) == [i for i in range(n) if i % 2 == 0]


def test_parallel_exports_init_distributed():
    import otters_tpu.parallel as par

    assert hasattr(par, "init_distributed")
    import otters_tpu

    assert hasattr(otters_tpu.parallel, "init_distributed")


# ---- round-2 self-review findings -------------------------------------------


def test_exact_rerank_infers_distance_direction():
    """exact_rerank must default to SMALLEST-first for distance metrics."""
    from otters_tpu.evaluate import exact_rerank

    vecs = np.array([[0.1, 0.0], [5.0, 0.0], [10.0, 0.0]], np.float32)
    rows, scores = exact_rerank(
        np.zeros((1, 2), np.float32), [0, 1, 2],
        lambda ids: vecs[np.asarray(ids)], Metric.Euclidean, 1,
    )
    assert rows == [0]  # nearest, not farthest
    rows_m, _ = exact_rerank(
        np.zeros((1, 2), np.float32), [0, 1, 2],
        lambda ids: vecs[np.asarray(ids)], Metric.Manhattan, 1,
    )
    assert rows_m == [0]


def test_int8_pallas_exact_at_large_dim():
    """d > 1040: int8 dots overflow f32 accumulation; the kernel must use
    int32 accumulation and stay bit-identical to the XLA int8 path."""
    d = 2048
    n = 16384
    # constant-component rows quantize to +/-127 -> |dot| = d * 127^2 > 2^24
    base = np.ones((n, d), np.float32)
    base[::2] *= -1.0
    base += np.random.default_rng(94).normal(size=(n, d)) * 1e-3
    dv8 = scoring.materialize(base, dtype=jnp.int8)
    q = np.ones((2, d), np.float32)
    rows_x, scores_x, ok_x = scoring.run_vec_topk(
        dv8, q, Metric.Cosine, 8, take_min=False, cmp=None, thr=None
    )
    n_pad = dv8.vectors.shape[0]
    t = pk.choose_tile(d, n_pad, pk._pad_b(2))
    rows_p, scores_p, ok_p, _, _ = pk.pallas_topk(
        dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
        jnp.asarray(q), None, jnp.float32(0.0),
        jnp.ones(n_pad // t, dtype=bool),
        metric=Metric.Cosine, k=8, take_min=False, cmp=None, interpret=True,
    )
    # many rows quantize to identical int8 patterns -> exact ties; the two
    # paths may pick different tied rows, but the SCORE multisets must be
    # bit-identical (same int32 dots, same f32 normalization math) — f32
    # accumulation would diverge by ~1e-3 relative here
    np.testing.assert_array_equal(
        np.sort(np.asarray(scores_p)), np.sort(np.asarray(scores_x))
    )
    assert np.asarray(ok_p).all() and np.asarray(ok_x).all()


def test_jit_warm_triggers_on_second_use_only():
    """One-shot scripts must not spawn the (non-daemon) warm thread."""
    from otters_tpu import aot

    aot.clear_memory_cache()
    calls = []
    import threading as _t

    # defeat the process-age gate (short-lived-script protection)
    orig_age = aot._WARM_MIN_AGE_S
    aot._WARM_MIN_AGE_S = 0.0

    orig = _t.Thread

    class Spy(orig):
        def start(self):
            calls.append(self.name)
            return super().start()

    _t.Thread = Spy
    try:
        aot.ensure_jit_warm("k1", None, (), {})  # first use: no thread
        assert not [c for c in calls if c.startswith("aot-warm")]
        import jax.numpy as _jnp

        jitted = __import__("jax").jit(lambda x: x + 1)
        aot.ensure_jit_warm("k1", jitted, (_jnp.ones(2),), {})  # second use
        assert [c for c in calls if c.startswith("aot-warm")]
        assert aot.wait_jit_ready(60)
        assert aot.jit_is_ready("k1")
    finally:
        _t.Thread = orig
        aot._WARM_MIN_AGE_S = orig_age


def test_meta_panel_mode_reaches_vpu_gate(monkeypatch):
    """The panel-mode gate in meta._prepare_program short-circuits on small
    CPU stores, so a missing import there only explodes at scale (seen once
    with VPU_METRICS). Force panel mode on a small store to keep the whole
    branch covered."""
    import otters_tpu.ops.scoring as scoring_mod

    monkeypatch.setattr(scoring_mod, "DIRECT_LIMIT", 1 << 8)
    rng = np.random.default_rng(98)
    n, d = 5000, 16  # pads to a 512 multiple -> panel eligible
    store = (
        MetaStore.from_columns([])
        .with_vectors(rng.normal(size=(n, d)).astype(np.float32))
        .build()
    )
    q = rng.normal(size=(3, d)).astype(np.float32)
    for metric in (Metric.Cosine, Metric.Manhattan):
        r = store.query_batch(q, metric).take(4).collect()
        assert len(r) == 4


def test_store_caches_are_lru_with_stats():
    """Round-3 weak-6: the per-store caches evict LRU instead of silently
    capping, and cache_stats() surfaces hits/misses/evictions."""
    import numpy as np

    from otters_tpu import Column, DataType, Metric, MetaStore, col

    n, d = 2_048, 16
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tags = Column("tag", DataType.String).from_values(
        [f"t{i % 500}" for i in range(n)]
    )
    store = (
        MetaStore.from_columns([tags])
        .with_vectors(vecs)
        .with_chunk_size(256)
        .build()
    )
    store._hostmask_cache.cap = 4  # shrink to force eviction quickly
    q = vecs[0]
    for i in range(6):  # 6 distinct contains literals > cap 4
        store.query(q, Metric.Cosine).meta_filter(
            col("tag").contains(f"t{i}0")
        ).take(3).collect()
    st = store.cache_stats()["hostmask"]
    assert st["size"] <= 4
    assert st["evictions"] >= 2
    # re-querying the most recent literal is a hit (clear the plan cache
    # first — it would otherwise serve the whole lowered plan and never
    # reach the hostmask layer)
    h0 = st["hits"]
    store._plan_cache.clear()
    store.query(q, Metric.Cosine).meta_filter(
        col("tag").contains("t50")
    ).take(3).collect()
    assert store.cache_stats()["hostmask"]["hits"] > h0


# ---- round-4 second review pass ---------------------------------------------


def _int8_rerank_store(n=2000, d=16, seed=91, chunk=256):
    rng = np.random.default_rng(seed)
    host = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(host)
        .with_storage_dtype("int8")
        .with_chunk_size(chunk)
        .with_rerank_source(fetch_vectors=lambda ids: host[np.asarray(ids)])
        .build()
    )
    return store, host


def test_certify_empty_result_is_certified():
    """A zero-candidate scan is provably complete: certify=True on a filter
    nothing passes must report certified=True, not None."""
    store, host = _int8_rerank_store()
    q = host[0] / np.linalg.norm(host[0])
    r = (
        store.query(q, Metric.Cosine)
        .vec_filter(1.5, Cmp.Gt)  # cosine <= 1: provably empty
        .take(5, rerank_from=20, certify=True)
        .collect()
    )
    assert len(r) == 0
    st = store.last_query_stats()
    assert st.certified is True
    assert st.scan_k_wide is not None


def test_certify_widen_respects_direct_program_limit(monkeypatch):
    """The widen loop must stop at the widest direct-program-eligible scan
    instead of dispatching a width that belongs to the windowed take-all
    regime (which returns no bound; on sharded stores it raises)."""
    import otters_tpu.meta as meta_mod
    import otters_tpu.ops.scoring as scoring_mod

    store, host = _int8_rerank_store()
    monkeypatch.setenv("OTTERS_CERT_KWIDE_MAX", "100000")
    # force every certificate check to fail so the loop widens to the cap
    monkeypatch.setattr(meta_mod, "_cert_ok", lambda *a, **k: False)
    # pretend any scan wider than 64 requires the windowed path
    monkeypatch.setattr(
        scoring_mod,
        "needs_windowed",
        lambda n_pad, b, k_eff: k_eff > 64,
    )
    seen_k = []
    orig = store._run_query_program

    def spy(cols_sub, queries, plan_params, thr, plan_static, metric, k,
            take_min, cmp, **kw):
        seen_k.append(k)
        return orig(cols_sub, queries, plan_params, thr, plan_static,
                    metric, k, take_min, cmp, **kw)

    store._run_query_program = spy
    q = host[1] / np.linalg.norm(host[1])
    with pytest.warns(UserWarning, match="not certified"):
        r = store.query(q, Metric.Cosine).take(
            3, rerank_from=8, certify=True
        ).collect()
    assert len(r) == 3
    assert max(seen_k) == 64, seen_k  # clamped at the eligible boundary
    assert store.last_query_stats().certified is False


def test_sharded_direct_k_ok_mirrors_spmd_guard():
    """ShardedMetaStore._direct_k_ok must reject k past SCAN_K_MAX (the SPMD
    program's safety net) so the certificate widen loop never trips it."""
    rng = np.random.default_rng(92)
    host = rng.normal(size=(1000, 8)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(host)
        .with_storage_dtype("int8")
        .build()
    )
    mesh = make_mesh(rows=4, batch=2)
    sharded = ShardedMetaStore.shard(store, mesh)
    assert sharded._direct_k_ok(100, 1)
    # the guard compares k_eff = min(k, b * n_pad): a large k on a small
    # store stays eligible; it must trip once the EFFECTIVE k passes the
    # SPMD merge limit (batch wide enough that b * n_pad no longer caps it)
    assert sharded._direct_k_ok(scoring.SCAN_K_MAX + 1, 1)
    assert not sharded._direct_k_ok(scoring.SCAN_K_MAX + 1, 2048)


def test_pallas_certify_excludes_fast_mode():
    """fast (bf16_3x) and certify (int8) are disjoint kernel modes; the
    combination must fail the precondition asserts, not NameError later."""
    rng = np.random.default_rng(93)
    dv8 = scoring.materialize(
        rng.normal(size=(2048, 64)).astype(np.float32), dtype=jnp.int8
    )
    n_pad = dv8.vectors.shape[0]
    t = pk.choose_tile(64, n_pad, pk._pad_b(1))
    with pytest.raises(AssertionError):
        pk.pallas_topk(
            dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
            jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32)),
            None, jnp.float32(0.0), jnp.ones(n_pad // t, dtype=bool),
            metric=Metric.Cosine, k=4, take_min=False, cmp=None,
            interpret=True, fast=True, certify=True,
            resid=dv8.resid, resid_bin=dv8.resid_bin,
        )


def test_certify_error_names_missing_residuals():
    """certify=True on a store built from pre-quantized int8 codes (no
    residual bounds) must say WHY it is unsupported."""
    from otters_tpu import OttersError

    rng = np.random.default_rng(95)
    codes = np.clip(
        np.rint(rng.normal(size=(256, 8)) * 40), -127, 127
    ).astype(np.int8)
    dv = scoring.materialize_from_device(jnp.asarray(codes))
    assert dv.resid is None
    host = codes.astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(dv, n_rows=256)
        .with_rerank_source(fetch_vectors=lambda ids: host[np.asarray(ids)])
        .build()
    )
    with pytest.raises(OttersError, match="residual"):
        store.query(host[0], Metric.Cosine).take(
            3, rerank_from=8, certify=True
        ).collect()


def test_strscan_bytes_cache_lru_single_eviction():
    """The arena-bytes cache must evict one LRU entry, not clear wholesale,
    and a hot arena must survive an overflow."""
    from otters_tpu.ops import strscan

    strscan._BYTES_CACHE.clear()
    arenas = [
        np.frombuffer(f"row{i}data".encode(), dtype=np.uint8).copy()
        for i in range(strscan._BYTES_CACHE_CAP + 2)
    ]
    hot = arenas[0]
    assert strscan._arena_bytes(hot) == hot.tobytes()
    for a in arenas[1:]:
        strscan._arena_bytes(hot)  # keep refreshing the hot entry
        strscan._arena_bytes(a)
    assert len(strscan._BYTES_CACHE) <= strscan._BYTES_CACHE_CAP
    assert id(hot) in strscan._BYTES_CACHE  # survived every eviction
    strscan._BYTES_CACHE.clear()


def test_exact_rerank_zero_norm_query_no_warning():
    """VERDICT r4 weak-8: a zero-norm query batch row must not emit a
    divide-by-zero RuntimeWarning on the public rerank path (1/qn was
    evaluated before np.where masked it), and its cosine is 0 exactly."""
    import warnings

    from otters_tpu.evaluate import exact_rerank
    from otters_tpu.types import Metric

    rng = np.random.default_rng(11)
    host = rng.normal(size=(32, 16)).astype(np.float32)
    host[5] = 0.0  # zero-norm CANDIDATE row too
    q = rng.normal(size=(3, 16)).astype(np.float32)
    q[1] = 0.0  # zero-norm query row
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning -> failure
        rows, scores = exact_rerank(
            q, list(range(32)), lambda ids: host[np.asarray(ids)],
            Metric.Cosine, 4,
        )
    assert len(rows) == 4
    # zero-norm pairs score 0 by the library convention (vec.rs:365-367);
    # winners must therefore all have positive cosine
    assert all(s > 0.0 for s in scores)
