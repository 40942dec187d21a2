"""AOT executable cache: precompile + signature reuse + disk round-trip."""

import numpy as np
import pytest

from otters_tpu import Cmp, Column, DataType, Metric, MetaStore, col
from otters_tpu import aot


@pytest.fixture()
def store():
    rng = np.random.default_rng(61)
    n = 2000
    cols = [
        Column("price", DataType.Float32).from_values(
            (np.arange(n) % 100).astype(np.float32)
        ),
    ]
    return (
        MetaStore.from_columns(cols)
        .with_vectors(rng.normal(size=(n, 16)).astype(np.float32))
        .with_chunk_size(256)
        .build()
    )


def test_precompile_counts_and_reuse(store):
    aot.clear_memory_cache()
    n = store.precompile(
        filters=[None, col("price").lt(50.0)], batch_sizes=(1, 4), k=5
    )
    assert n == 4
    before = dict(aot._mem)
    # a real query with a precompiled signature must NOT add a new program
    q = np.random.default_rng(62).normal(size=(4, 16)).astype(np.float32)
    r = (
        store.query_batch(q, Metric.Cosine)
        .meta_filter(col("price").lt(50.0))
        .take(5)
        .collect()
    )
    assert len(r) == 5
    assert all(i % 100 < 50 for i in r.indices)
    assert set(aot._mem) == set(before), "query recompiled a precompiled sig"


def test_precompile_with_vec_filter_variant(store):
    aot.clear_memory_cache()
    n = store.precompile(filters=[None], batch_sizes=(2,), k=5, with_vec_filter=True)
    assert n == 2
    q = np.random.default_rng(63).normal(size=(2, 16)).astype(np.float32)
    before = dict(aot._mem)
    r = (
        store.query_batch(q, Metric.Cosine)
        .vec_filter(-1.0, Cmp.Gt)
        .take(5)
        .collect()
    )
    assert len(r) == 5
    assert set(aot._mem) == set(before)


def test_disk_blob_roundtrip_subprocess(tmp_path):
    """Disk layer end-to-end in single-device subprocesses: process A
    precompiles and persists the blob; process B deserializes it (zero
    compiles) and serves an exact query."""
    import subprocess
    import sys

    prog = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from otters_tpu import Column, DataType, Metric, MetaStore
from otters_tpu import aot
rng = np.random.default_rng(61)
n = 2000
cols = [Column("price", DataType.Float32).from_values(
    (np.arange(n) % 100).astype(np.float32))]
store = (MetaStore.from_columns(cols)
         .with_vectors(rng.normal(size=(n, 16)).astype(np.float32))
         .with_chunk_size(256).build())
mode = sys.argv[1]
if mode == "save":
    store.precompile(filters=[None], batch_sizes=(2,), k=3)
    assert aot.stats["compiles"] >= 1
else:
    q = np.random.default_rng(64).normal(size=(2, 16)).astype(np.float32)
    r = store.query_batch(q, Metric.Cosine).take(3).collect()
    assert aot.stats["disk_hits"] >= 1, aot.stats
    assert aot.stats["compiles"] == 0, aot.stats
    vecs = np.asarray(store._dv.vectors[: store.n_rows])
    qi = 1 / np.linalg.norm(q, axis=1)
    vi = 1 / np.linalg.norm(vecs, axis=1)
    s = (q @ vecs.T) * qi[:, None] * vi[None, :]
    want = np.sort(s.reshape(-1))[::-1][:3]
    np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-6)
print("OK", mode)
"""
    env = dict(
        __import__("os").environ,
        OTTERS_AOT_CACHE=str(tmp_path),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="",
    )
    for mode in ("save", "load"):
        res = subprocess.run(
            [sys.executable, "-c", prog, mode],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert res.returncode == 0, (mode, res.stdout, res.stderr[-2000:])
        assert f"OK {mode}" in res.stdout
    blobs = list(tmp_path.glob("*.jaxexe"))
    # meta-query program + the zonemap build program both persist
    assert len(blobs) >= 1
    assert all(b.stat().st_size > 0 for b in blobs)


def test_signature_distinguishes_shapes_and_statics(store):
    import jax.numpy as jnp

    a = aot.signature("p", "s1", (jnp.zeros((2, 3)),), {})
    b = aot.signature("p", "s1", (jnp.zeros((2, 4)),), {})
    c = aot.signature("p", "s2", (jnp.zeros((2, 3)),), {})
    assert len({a, b, c}) == 3


def test_sharded_disk_blob_roundtrip_subprocess(tmp_path):
    """Round-3: the SPMD (shard_map) program persists and deserializes as a
    multi-device executable. Process A compiles over an 8-device CPU mesh
    and persists; process B (same topology) serves the first query from the
    blob with ZERO aot-layer compiles."""
    import subprocess
    import sys

    prog = r"""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from otters_tpu import Column, DataType, Metric, MetaStore
from otters_tpu import aot
from otters_tpu.parallel import make_mesh
rng = np.random.default_rng(71)
n = 4096
cols = [Column("price", DataType.Float32).from_values(
    (np.arange(n) % 100).astype(np.float32))]
mesh = make_mesh(rows=4, batch=2)
store = (MetaStore.from_columns(cols)
         .with_vectors(rng.normal(size=(n, 16)).astype(np.float32))
         .with_chunk_size(1024).build_sharded(mesh))
mode = sys.argv[1]
q = np.random.default_rng(72).normal(size=(2, 16)).astype(np.float32)
t0 = time.perf_counter()
r = store.query_batch(q, Metric.Cosine).take(3).collect()
dt = time.perf_counter() - t0
if mode == "save":
    assert aot.stats["compiles"] >= 1, aot.stats
else:
    assert aot.stats["disk_hits"] >= 1, aot.stats
    assert aot.stats["compiles"] == 0, aot.stats
vecs = np.asarray(store._dv.vectors[: store.n_rows])
qi = 1 / np.linalg.norm(q, axis=1)
vi = 1 / np.linalg.norm(vecs, axis=1)
s = (q @ vecs.T) * qi[:, None] * vi[None, :]
want = np.sort(s.reshape(-1))[::-1][:3]
np.testing.assert_allclose(r.scores, want, rtol=1e-5, atol=1e-6)
print(f"OK {mode} first_query_s={dt:.3f}")
"""
    env = dict(
        __import__("os").environ,
        OTTERS_AOT_CACHE=str(tmp_path),
        JAX_PLATFORMS="cpu",
        OTTERS_AOT_NO_WARM="1",
    )
    outs = {}
    for mode in ("save", "load"):
        res = subprocess.run(
            [sys.executable, "-c", prog, mode],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert res.returncode == 0, (mode, res.stdout, res.stderr[-2000:])
        assert f"OK {mode}" in res.stdout
        outs[mode] = res.stdout
    blobs = list(tmp_path.glob("*.jaxexe"))
    assert blobs and all(b.stat().st_size > 0 for b in blobs)


def test_precompile_rerank_warms_device_program(store_factory=None):
    """precompile(rerank_from=..., pipeline_depths=...) readies the widened
    scan and the batched device rerank for each pipeline depth."""
    import numpy as np

    from otters_tpu import Metric, MetaStore
    from otters_tpu.errors import OttersError

    rng = np.random.default_rng(81)
    n, d = 3000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    count = store.precompile(
        filters=[None], batch_sizes=(2,), k=3, rerank_from=32,
        pipeline_depths=(1, 3),
    )
    assert count >= 1 + 3 + 1  # rerank warms (1+3 pendings) + base program
    # a store without a rerank source must refuse
    bare = MetaStore.from_columns([]).with_vectors(vecs).build()
    import pytest as _pytest

    with _pytest.raises(OttersError, match="with_rerank_source"):
        bare.precompile(rerank_from=32)


def test_precompile_rerank_shapes_cover_pipelined_serving():
    """The rerank shapes precompile warms must be the ones SERVING uses:
    distinct random warm queries produce disjoint candidate sets, so the
    resolve() union pad bucket matches pipelined traffic (zero queries all
    tie and collapse every pending to the same candidates — a bucket real
    traffic never hits). A post-precompile resolve() of fresh random
    pendings must add no new program signatures."""
    import numpy as np

    from otters_tpu import Metric, MetaStore, aot
    from otters_tpu.meta import resolve

    rng = np.random.default_rng(82)
    n, d, b, k, kw, depth = 3000, 16, 2, 3, 32, 3
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = (
        MetaStore.from_columns([])
        .with_vectors(vecs)
        .with_storage_dtype("int8")
        .with_rerank_source(keep_host_f32=True)
        .build()
    )
    aot.clear_memory_cache()
    store.precompile(
        filters=[None], batch_sizes=(b,), k=k, rerank_from=kw,
        pipeline_depths=(depth,),
    )
    before = set(aot._mem)
    pend = [
        store.query_batch(
            rng.normal(size=(b, d)).astype(np.float32), Metric.Cosine
        )
        .take(k, rerank_from=kw)
        .collect_async()
        for _ in range(depth)
    ]
    results = resolve(pend)
    assert all(len(r) == k for r in results)
    assert all(p._device_rerank is not None for p in pend), (
        "device rerank path did not engage"
    )
    assert set(aot._mem) == before, (
        "pipelined serving compiled a rerank shape precompile missed: "
        f"{set(aot._mem) - before}"
    )
