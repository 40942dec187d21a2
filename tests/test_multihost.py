"""Multi-process (multi-host analog) smoke test for init_distributed.

Spawns TWO OS processes that form a jax.distributed cluster over local TCP
(the CPU stand-in for a TPU pod's hosts), build a ('rows', 'batch') mesh
spanning both processes' devices, and run the sharded top-k search with its
cross-process all-gather merge. Each process checks the merged result
against a local numpy oracle — exercising exactly the
`init_distributed()` + `make_mesh()` + `ShardedVecStore.search` pod recipe
from examples/multichip.py.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from otters_tpu.parallel import init_distributed, make_mesh, ShardedVecStore
from otters_tpu.types import Metric

coord, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
n_dev = len(jax.devices())
assert n_dev == 2 * jax.local_device_count(), (n_dev, jax.local_device_count())

mesh = make_mesh(rows=n_dev, batch=1)
rng = np.random.default_rng(0)  # same data on every process
n, d, k = 512, 16, 7
vectors = rng.normal(size=(n, d)).astype(np.float32)
queries = rng.normal(size=(2, d)).astype(np.float32)

store = ShardedVecStore(mesh, vectors)
got = store.search(queries, Metric.Cosine, k=k)

qi = 1 / np.linalg.norm(queries, axis=1)
vi = 1 / np.linalg.norm(vectors, axis=1)
s = (queries @ vectors.T) * qi[:, None] * vi[None, :]
flat = s.reshape(-1)
order = np.argsort(-flat, kind="stable")[:k]
want_rows = (order % n).tolist()
assert [r.index for r in got] == want_rows, (
    [r.index for r in got], want_rows)
np.testing.assert_allclose(
    [r.score for r in got], flat[order], rtol=1e-5, atol=1e-6)
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_search():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        if rc != 0 and (
            "UNIMPLEMENTED" in err or "not supported" in err.lower()
        ):
            pytest.skip(
                f"multi-process CPU collectives unsupported here: "
                f"{err.splitlines()[-1] if err else rc}"
            )
        assert rc == 0, f"proc {pid} failed:\n{out}\n{err[-3000:]}"
        assert f"proc {pid} OK" in out


_META_WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu.parallel import init_distributed, make_mesh

coord, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
n_dev = len(jax.devices())
mesh = make_mesh(rows=n_dev, batch=1)

rng = np.random.default_rng(1)  # same data on every process
n, d, chunk, k = 2048, 16, 256, 6
vectors = rng.normal(size=(n, d)).astype(np.float32)
price = ((np.arange(n) // chunk) % 2 * 50.0 + np.arange(n) % 10).astype(
    np.float64
)
tag = ["blue" if (i // chunk) % 4 == 0 else "red" for i in range(n)]
cols = [
    Column("price", DataType.Float64).from_values(price),
    Column("tag", DataType.String).from_values(tag),
]
store = (
    MetaStore.from_columns(cols)
    .with_vectors(vectors)
    .with_chunk_size(chunk)
    .build_sharded(mesh)   # DIRECT per-shard placement across BOTH processes
)
queries = rng.normal(size=(2, d)).astype(np.float32)
r = (
    store.query_batch(queries, Metric.Cosine)
    .meta_filter(col("price").lt(10.0) & col("tag").eq("blue"))
    .take(k)
    .collect()
)
mask = (price < 10.0) & np.array([t == "blue" for t in tag])
qi = 1 / np.linalg.norm(queries, axis=1)
vi = 1 / np.linalg.norm(vectors, axis=1)
s = (queries @ vectors.T) * qi[:, None] * vi[None, :]
s[:, ~mask] = -np.inf
flat = s.reshape(-1)
order = np.argsort(-flat, kind="stable")[:k]
want_rows = (order % n).tolist()
assert r.indices == want_rows, (r.indices, want_rows)
np.testing.assert_allclose(r.scores, flat[order], rtol=1e-5, atol=1e-6)
st = store.last_query_stats()
assert st.evaluated_chunks == (n // chunk) // 4, st.evaluated_chunks
print(f"proc {pid} OK", flush=True)
"""


_EXOTIC_WORKER = r"""
import os, sys, warnings
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from otters_tpu import Column, DataType, Metric, MetaStore, col
from otters_tpu.parallel import init_distributed, make_mesh

coord, pid, save_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
n_dev = len(jax.devices())
mesh = make_mesh(rows=n_dev, batch=1)

rng = np.random.default_rng(7)  # same data on every process
n, d, chunk = 2048, 16, 256
vectors = rng.normal(size=(n, d)).astype(np.float32)
tag = [f"item-{i % 11}{'-x' if i % 3 == 0 else ''}" for i in range(n)]
cols = [Column("tag", DataType.String).from_values(tag)]
store = (
    MetaStore.from_columns(cols)
    .with_vectors(vectors)
    .with_chunk_size(chunk)
    .with_storage_dtype("int8")
    .with_rerank_source(keep_host_f32=True)
    .build_sharded(mesh)
)
queries = rng.normal(size=(2, d)).astype(np.float32)
qi = 1 / np.linalg.norm(queries, axis=1)
vi = 1 / np.linalg.norm(vectors, axis=1)
s_all = (queries @ vectors.T) * qi[:, None] * vi[None, :]

# 1) hostmask predicate (contains) across processes, exact via rerank
r = (
    store.query_batch(queries, Metric.Cosine)
    .meta_filter(col("tag").contains("-x"))
    .take(6, rerank_from=48)
    .collect()
)
mask = np.array(["-x" in t for t in tag])
s = s_all.copy(); s[:, ~mask] = -np.inf
flat = s.reshape(-1)
order = np.argsort(-flat, kind="stable")[:6]
assert r.indices == (order % n).tolist(), (r.indices, (order % n).tolist())
print(f"proc {pid} hostmask OK", flush=True)

# 2) rerank resolve + int8 exactness certificate across processes
r2 = (
    store.query_batch(queries, Metric.Cosine)
    .take(5, rerank_from=40)
    .collect()
)
st = store.last_query_stats()
assert st.certified is True, st
flat2 = s_all.reshape(-1)
want2 = (np.argsort(-flat2, kind="stable")[:5] % n).tolist()
assert r2.indices == want2, (r2.indices, want2)
print(f"proc {pid} certified rerank OK", flush=True)

# 3) forced 64-bit hash collision: every string hashes identically, so the
#    device Eq mask passes everything and the exact host-mask redo must run
#    (collision probability is engineered to 1 here)
from otters_tpu.ops import hashing
orig = hashing.hash_strings
def colliding(strings):
    nn = len(strings)
    return (np.full(nn, 12345, np.uint64), np.full(nn, 99991, np.uint64))
hashing.hash_strings = colliding
hashing_string_orig = hashing.hash_string
hashing.hash_string = lambda s: (np.uint64(12345), np.uint64(99991))
try:
    collided_store = (
        MetaStore.from_columns(
            [Column("tag", DataType.String).from_values(tag)]
        )
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build_sharded(mesh)
    )
    r3 = (
        collided_store.query_batch(queries, Metric.Cosine)
        .meta_filter(col("tag").eq("item-7"))
        .take(6)
        .collect()
    )
finally:
    hashing.hash_strings = orig
    hashing.hash_string = hashing_string_orig
mask3 = np.array([t == "item-7" for t in tag])
s3 = s_all.copy(); s3[:, ~mask3] = -np.inf
flat3 = s3.reshape(-1)
order3 = np.argsort(-flat3, kind="stable")[:6]
assert r3.indices == (order3 % n).tolist(), (r3.indices, (order3 % n).tolist())
print(f"proc {pid} collision redo OK", flush=True)

# 4) per-shard save on BOTH processes + reload onto the same mesh
store.delete_rows([3, 700])
store.save(save_dir)  # collective (valid gather) + per-process shard files
import jax.experimental.multihost_utils as mhu
mhu.sync_global_devices("save done")
re_sh = MetaStore.load(save_dir, mesh=mesh)
assert len(re_sh) == n - 2
r4a = store.query_batch(queries, Metric.Cosine).take(5, rerank_from=40).collect()
r4b = re_sh.query_batch(queries, Metric.Cosine).take(5, rerank_from=40).collect()
assert r4a.indices == r4b.indices, (r4a.indices, r4b.indices)
np.testing.assert_allclose(r4a.scores, r4b.scores, rtol=1e-5, atol=1e-6)
assert re_sh.last_query_stats().certified is True
print(f"proc {pid} save/load OK", flush=True)

# 5) take-all across processes: per-shard windowed collection merged by a
#    cross-process allgather in the exact single-device tie order
f32_store = (
    MetaStore.from_columns(
        [Column("tag", DataType.String).from_values(tag)]
    )
    .with_vectors(vectors)
    .with_chunk_size(chunk)
    .build_sharded(mesh)
)
r5 = (
    f32_store.query_batch(queries[:1], Metric.Cosine)
    .meta_filter(col("tag").eq("item-3"))
    .collect()  # no take(k): EVERY passing row
)
mask5 = np.array([t == "item-3" for t in tag])
s5 = s_all[:1].copy(); s5[:, ~mask5] = -np.inf
flat5 = s5.reshape(-1)
order5 = [int(i) for i in np.argsort(-flat5, kind="stable") if flat5[i] > -np.inf]
assert r5.indices == order5, (len(r5.indices), len(order5), r5.indices[:5], order5[:5])
print(f"proc {pid} take-all OK", flush=True)
print(f"proc {pid} OK", flush=True)
"""


def test_two_process_exotic_paths(tmp_path):
    """Round-4 item 7: hostmask predicates, the hash-collision exact-mask
    redo, rerank resolve with the int8 certificate, and per-shard
    save/load — all across 2 real OS processes."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    save_dir = str(tmp_path / "mh_store")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EXOTIC_WORKER, coord, str(pid), save_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        if rc != 0 and (
            "UNIMPLEMENTED" in err or "not supported" in err.lower()
        ):
            pytest.skip(
                f"multi-process CPU collectives unsupported here: "
                f"{err.splitlines()[-1] if err else rc}"
            )
        assert rc == 0, f"proc {pid} failed:\n{out}\n{err[-3000:]}"
        assert f"proc {pid} OK" in out


def test_two_process_build_sharded_metastore():
    """Round-3: the DIRECT sharded build + full meta query (zonemaps, Bloom,
    psum stats, all-gather merge) across two OS processes."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _META_WORKER, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        if rc != 0 and (
            "UNIMPLEMENTED" in err or "not supported" in err.lower()
        ):
            pytest.skip(
                f"multi-process CPU collectives unsupported here: "
                f"{err.splitlines()[-1] if err else rc}"
            )
        assert rc == 0, f"proc {pid} failed:\n{out}\n{err[-3000:]}"
        assert f"proc {pid} OK" in out
