"""Per-shard persistence (sharded-v1 directory format, round-4 item 3).

``ShardedMetaStore.save(path)`` writes one npz per row-shard plus a
manifest; ``MetaStore.load(path, mesh=...)`` streams each shard's file
straight into per-shard HBM. Neither direction ever stages the full vector
payload on one host — persistence capacity scales with the mesh exactly
like query capacity (reference roadmap README.md:207, SURVEY §5 checkpoint
row)."""

import glob
import os

import numpy as np
import pytest

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu import io as oio
from otters_tpu.parallel import make_mesh


def _mk_cols(n):
    return [
        Column("price", DataType.Float64).from_values(
            [float(i % 97) for i in range(n)]
        ),
        Column("tag", DataType.String).from_values(
            [f"t{i % 7}" for i in range(n)]
        ),
    ]


def _build_sharded(vecs, mesh, chunk=1024, **knobs):
    n = len(vecs)
    b = (
        MetaStore.from_columns(_mk_cols(n))
        .with_vectors(vecs)
        .with_chunk_size(chunk)
    )
    if knobs.get("storage"):
        b = b.with_storage_dtype(knobs["storage"])
    if knobs.get("keep_rerank"):
        b = b.with_rerank_source(keep_host_f32=True)
    if knobs.get("z_order"):
        b = b.with_z_order(knobs["z_order"])
    return b.build_sharded(mesh)


def test_shard_files_bounded_and_parity(tmp_path):
    """The payload splits into per-shard files none of which exceeds one
    shard's rows, and the reloaded store answers queries identically."""
    rng = np.random.default_rng(0)
    n, d = 20_000, 24
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(vecs, mesh, storage="int8")
    path = str(tmp_path / "store_dir")
    store.save(path)

    files = sorted(glob.glob(os.path.join(path, "shard_*.npz")))
    assert len(files) >= 2  # genuinely split
    n_pad_s = store._dv.vectors.shape[0]
    per_shard = n_pad_s // 8
    total = 0
    for f in files:
        with np.load(f) as z:
            rows = z["rows"]
            assert rows.dtype == np.int8  # codes saved as codes, not f32
            assert rows.shape[0] <= per_shard
            total += rows.shape[0]
    assert total == n

    re_sh = MetaStore.load(path, mesh=mesh)
    q = rng.normal(size=(3, d)).astype(np.float32)
    expr = col("price").lt(40.0) & col("tag").eq("t3")
    a = store.query_batch(q, Metric.Cosine).meta_filter(expr).take(12).collect()
    b = re_sh.query_batch(q, Metric.Cosine).meta_filter(expr).take(12).collect()
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)
    # int8 codes round-trip BIT-exactly (requantizing codes is idempotent)
    np.testing.assert_array_equal(
        np.asarray(store._dv.vectors), np.asarray(re_sh._dv.vectors)
    )
    # original residual bounds restored, not recomputed against the codes
    np.testing.assert_allclose(
        np.asarray(store._dv.resid), np.asarray(re_sh._dv.resid),
        rtol=1e-6, atol=1e-7,
    )


def test_save_staging_is_bounded_by_one_shard(tmp_path):
    """Proof the old path would have failed under a per-host staging limit:
    spy every device->host materialization during save. The single-file
    path stages the WHOLE vector payload at once; the sharded path never
    stages more than one shard."""
    rng = np.random.default_rng(1)
    n, d = 16_384, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(vecs, mesh)  # f32: payload comes off the device
    n_pad_s = store._dv.vectors.shape[0]
    per_shard = n_pad_s // 8

    staged = []
    real_asarray = np.asarray

    def spy_asarray(a, *args, **kw):
        out = real_asarray(a, *args, **kw)
        if getattr(out, "ndim", 0) == 2 and out.shape[1] == d:
            staged.append(out.shape[0])
        return out

    class _NpProxy:
        def __getattr__(self, name):
            if name == "asarray":
                return spy_asarray
            return getattr(np, name)

    proxy = _NpProxy()
    old = oio.np
    oio.np = proxy
    try:
        store.save(str(tmp_path / "dir_fmt"))
        assert staged, "save staged nothing?"
        assert max(staged) <= per_shard  # bounded by ONE shard
        staged.clear()
        oio.save_meta(store, str(tmp_path / "single.npz"))
        assert max(staged) >= n  # the old path stages the whole store
    finally:
        oio.np = old


@pytest.mark.parametrize("storage", ["float32", "bfloat16"])
def test_payload_dtypes_roundtrip_exact(tmp_path, storage):
    rng = np.random.default_rng(2)
    n, d = 8_192, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(vecs, mesh, storage=storage)
    path = str(tmp_path / "dtyped")
    store.save(path)
    re_sh = MetaStore.load(path, mesh=mesh)
    assert re_sh._storage_dtype == storage
    np.testing.assert_array_equal(
        np.asarray(store._dv.vectors).view(np.uint8),
        np.asarray(re_sh._dv.vectors).view(np.uint8),
    )


def test_sorted_zorder_rerank_certified_roundtrip(tmp_path):
    """The hard case: z-ordered (index_map) + int8 + keep_host_f32. The
    payload is saved in device order without re-sorting on load; original
    ids, the rerank source, and the exactness certificate all survive —
    and a single-file re-save from the LOADED store still round-trips
    (original-order columns are reconstructed)."""
    rng = np.random.default_rng(3)
    n, d = 12_288, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(
        vecs, mesh, storage="int8", keep_rerank=True,
        z_order=["price", "tag"],
    )
    store.delete_rows([5, 77, 1023])
    path = str(tmp_path / "sorted_dir")
    store.save(path)
    re_sh = MetaStore.load(path, mesh=mesh)
    assert len(re_sh) == n - 3

    q = rng.normal(size=d).astype(np.float32)
    a = store.query(q, Metric.Cosine).take(10, rerank_from=64).collect()
    sa = store.last_query_stats()
    b = re_sh.query(q, Metric.Cosine).take(10, rerank_from=64).collect()
    sb = re_sh.last_query_stats()
    assert a.indices == b.indices  # ORIGINAL ingestion-order ids
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6, atol=1e-7)
    assert sa.certified is True and sb.certified is True
    assert 5 not in b.indices and 77 not in b.indices

    # single-file re-save from the loaded store (original order) and back
    single = str(tmp_path / "resaved.npz")
    oio.save_meta(re_sh, single)
    re2 = MetaStore.load(single)
    c = re2.query(q, Metric.Cosine).take(10, rerank_from=64).collect()
    assert c.indices == a.indices
    np.testing.assert_allclose(c.scores, a.scores, rtol=1e-5, atol=1e-6)


def test_dir_loads_single_device_too(tmp_path):
    rng = np.random.default_rng(4)
    n, d = 8_192, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(vecs, mesh, storage="int8")
    path = str(tmp_path / "dir_single")
    store.save(path)
    re_one = MetaStore.load(path)  # no mesh: single-device slab streaming
    q = rng.normal(size=(2, d)).astype(np.float32)
    a = store.query_batch(q, Metric.Cosine).take(8).collect()
    b = re_one.query_batch(q, Metric.Cosine).take(8).collect()
    assert a.indices == b.indices
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-6)


def test_missing_shard_file_is_a_clear_error(tmp_path):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(8_192, 16)).astype(np.float32)
    mesh = make_mesh(rows=8)
    store = _build_sharded(vecs, mesh)
    path = str(tmp_path / "broken")
    store.save(path)
    import json

    mf = glob.glob(os.path.join(path, "manifest_*.json"))[0]
    with open(mf) as f:
        m = json.load(f)
    m["row_ranges"] = m["row_ranges"][1:]
    m["files"] = m["files"][1:]
    with open(mf, "w") as f:
        json.dump(m, f)
    from otters_tpu.errors import OttersError

    with pytest.raises(OttersError, match="missing rows"):
        MetaStore.load(path, mesh=mesh)
