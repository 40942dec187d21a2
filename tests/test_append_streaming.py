"""Streaming sharded append (round-4 item 4) + int8 append-drift pin.

Unsorted sharded stores rebuild appends by streaming old rows device-shard
-> bounded host slab -> new per-shard HBM: host RAM never holds the whole
store. And re-quantizing int8 CODES is idempotent (every row's max |code|
is exactly 127, so the requantization scale is 1) — surviving rows' codes
must be BIT-IDENTICAL across append generations, killing the suspicion
that repeated appends without keep_host_f32 drift the codes."""

import numpy as np
import pytest

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu.parallel import make_mesh


def _cols(n, start=0):
    return {
        "price": [float((start + i) % 97) for i in range(n)],
        "tag": [f"t{(start + i) % 7}" for i in range(n)],
    }


def _build(vecs, mesh, storage="float32", keep=False, chunk=1024):
    n = len(vecs)
    c = _cols(n)
    b = (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(c["price"]),
                Column("tag", DataType.String).from_values(c["tag"]),
            ]
        )
        .with_vectors(vecs)
        .with_chunk_size(chunk)
        .with_storage_dtype(storage)
    )
    if keep:
        b = b.with_rerank_source(keep_host_f32=True)
    return b.build_sharded(mesh)


@pytest.mark.parametrize("storage", ["float32", "int8", "bfloat16"])
def test_streaming_append_parity(storage):
    """The streaming path must produce a store identical in behavior to a
    from-scratch build over the same surviving + new rows."""
    rng = np.random.default_rng(0)
    n, m, d = 12_288, 300, 24
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build(vecs, mesh, storage=storage)
    store.delete_rows([0, 5, 4_000, n - 1])
    newv = rng.normal(size=(m, d)).astype(np.float32)
    appended = store.append(newv, _cols(m, start=n))
    assert appended.n_rows == n - 4 + m

    keepmask = np.ones(n, bool)
    keepmask[[0, 5, 4_000, n - 1]] = False
    ref_rows = np.concatenate([vecs[keepmask], newv])
    ref_cols = {
        k: [v for v, kk in zip(_cols(n)[k], keepmask) if kk]
        + _cols(m, start=n)[k]
        for k in ("price", "tag")
    }
    scratch = _build_from(ref_rows, ref_cols, mesh, storage)
    q = rng.normal(size=(2, d)).astype(np.float32)
    expr = col("price").lt(50.0)
    a = (
        appended.query_batch(q, Metric.Cosine)
        .meta_filter(expr)
        .take(15)
        .collect()
    )
    b = (
        scratch.query_batch(q, Metric.Cosine)
        .meta_filter(expr)
        .take(15)
        .collect()
    )
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)
    # storage payload is identical to the from-scratch build, bit for bit
    np.testing.assert_array_equal(
        np.asarray(appended._dv.vectors).view(np.uint8),
        np.asarray(scratch._dv.vectors).view(np.uint8),
    )


def _build_from(rows, cols, mesh, storage):
    return (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(cols["price"]),
                Column("tag", DataType.String).from_values(cols["tag"]),
            ]
        )
        .with_vectors(rows)
        .with_chunk_size(1024)
        .with_storage_dtype(storage)
        .build_sharded(mesh)
    )


def test_streaming_append_staging_bounded(monkeypatch):
    """Host staging during a streaming append never exceeds one slab: spy
    the device->host gather results."""
    from otters_tpu.parallel import meta_sharded as msh

    rng = np.random.default_rng(1)
    n, d = 16_384, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build(vecs, mesh)

    staged = []
    real_asarray = np.asarray

    def spy(a, *args, **kw):
        out = real_asarray(a, *args, **kw)
        if getattr(out, "ndim", 0) == 2 and out.shape[1] == d:
            staged.append(out.shape[0])
        return out

    monkeypatch.setattr(msh, "np", _Proxy(spy))
    appended = store._append_streaming(
        rng.normal(size=(64, d)).astype(np.float32), _cols(64, start=n)
    )
    assert appended.n_rows == n + 64
    assert staged, "append staged nothing?"
    assert max(staged) <= 1 << 20  # bounded by the slab, not the store


class _Proxy:
    def __init__(self, asarray):
        self._asarray = asarray

    def __getattr__(self, name):
        if name == "asarray":
            return self._asarray
        return getattr(np, name)


def test_int8_repeated_append_codes_bit_identical():
    """Weak-3 pin: three append generations without keep_host_f32 — every
    surviving row's int8 code row must be bit-identical in each
    generation (requantization of codes is idempotent)."""
    rng = np.random.default_rng(2)
    n, d = 8_192, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    # adversarial rows for the idempotency argument: tiny amax, huge amax,
    # a one-hot row, and a zero row
    vecs[0] *= 1e-6
    vecs[1] *= 1e6
    vecs[2] = 0.0
    vecs[2, 7] = 3.14159
    vecs[3] = 0.0
    mesh = make_mesh(rows=8)
    store = _build(vecs, mesh, storage="int8")
    gen0 = np.asarray(store._dv.vectors)[:n].copy()
    resid0 = np.asarray(store._dv.resid)[:n].copy()
    cur = store
    total = n
    for g in range(3):
        m = 128
        cur = cur.append(
            rng.normal(size=(m, d)).astype(np.float32), _cols(m, start=total)
        )
        codes = np.asarray(cur._dv.vectors)
        np.testing.assert_array_equal(codes[:n], gen0)  # zero drift
        # the ORIGINAL true-source residual bounds survive every rebuild
        # (the rebuild's own recomputation would collapse them to the
        # codes-vs-codes floor)
        np.testing.assert_array_equal(np.asarray(cur._dv.resid)[:n], resid0)
        total += m
    assert cur.n_rows == n + 3 * 128


def test_sorted_store_append_falls_back_and_stays_correct():
    rng = np.random.default_rng(3)
    n, d = 8_192, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = (
        MetaStore.from_columns(
            [
                Column("price", DataType.Float64).from_values(
                    _cols(n)["price"]
                ),
                Column("tag", DataType.String).from_values(_cols(n)["tag"]),
            ]
        )
        .with_vectors(vecs)
        .with_chunk_size(1024)
        .with_z_order(["price", "tag"])
        .build_sharded(mesh)
    )
    m = 100
    appended = store.append(
        rng.normal(size=(m, d)).astype(np.float32), _cols(m, start=n)
    )
    assert appended.n_rows == n + m
    assert appended._index_map is not None  # still sorted
    q = rng.normal(size=d).astype(np.float32)
    r = appended.query(q, Metric.Cosine).take(5).collect()
    assert len(r) == 5


def test_streaming_append_keeps_rerank_snapshot():
    rng = np.random.default_rng(4)
    n, m, d = 8_192, 50, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build(vecs, mesh, storage="int8", keep=True)
    newv = rng.normal(size=(m, d)).astype(np.float32)
    appended = store.append(newv, _cols(m, start=n))
    assert appended._rerank_fetch is not None
    ids = np.array([0, n - 1, n, n + m - 1], dtype=np.int64)
    want = np.concatenate([vecs, newv])[ids]
    np.testing.assert_array_equal(appended._rerank_fetch(ids), want)
    # certificate still works on the appended store
    res = store.query(vecs[3], Metric.Cosine).take(5, rerank_from=50).collect()
    res2 = (
        appended.query(vecs[3], Metric.Cosine).take(5, rerank_from=50).collect()
    )
    assert appended.last_query_stats().certified is True
    assert res2.indices[0] == res.indices[0] == 3
