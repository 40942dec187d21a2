"""otters-tpu benchmark: exact filtered cosine top-10 throughput.

Headline metric (BASELINE.md north star, scaled to one chip): queries/sec at
exact top-10 over N x 768 vectors with a zonemap-pruned metadata filter,
256-query batches, f32 HIGHEST precision (recall@10 = 1.0 by construction).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "qps", "vs_baseline": ...}

vs_baseline is measured against a CPU brute-force proxy run on this host
(numpy/BLAS matmul + argpartition top-k — a stand-in for the reference's
Rust SIMD+rayon scan, which cannot be built here: no rustc in the image;
torch-CPU measures within 10% of it). The proxy is measured on a subsample
and scaled linearly in rows; the reference is credited the same 50% zonemap
pruning the TPU path gets. NOTE: this container exposes ONE CPU core, so
the proxy is single-core; against a hypothetical 32-core rayon box, divide
vs_baseline by ~32 — the BASELINE.md ">10x single-CPU otters" target still
clears by an order of magnitude. Details go to stderr; the single JSON line
goes to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# ---- configuration ---------------------------------------------------------
N = 1_000_000
D = 768
B = 256  # queries per batch
K = 10
CHUNK = 1024
TIMED_BATCHES = 16
CPU_SUB_N = 200_000
CPU_SUB_B = 32


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_store():
    import jax

    # persist compiled executables so reruns skip the (minutes-long on
    # remote-compile setups) Pallas/XLA compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from otters_tpu import Column, DataType, MetaStore

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    vectors = jax.random.normal(key, (N, D), dtype=jax.numpy.float32)
    vectors.block_until_ready()
    log(f"device data gen: {time.perf_counter() - t0:.2f}s")

    # price clustered per chunk (demo.rs pattern): even chunks expensive,
    # odd cheap -> `price < 50` prunes exactly half the chunks.
    idx = np.arange(N)
    even = (idx // CHUNK) % 2 == 0
    price = np.where(even, 80.0 + (idx % 20), 10.0 + (idx % 20)).astype(np.float64)
    version = np.where(even, 1, 3).astype(np.int32)

    cols = [
        Column("price", DataType.Float64).from_values(list(price)),
        Column("version", DataType.Int32).from_values(list(version)),
    ]
    t0 = time.perf_counter()
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(vectors)
        .with_chunk_size(CHUNK)
        .build()
    )
    bs = store.build_stats()
    log(
        f"build: total={bs.build_total_duration:.2f}s "
        f"ingest={bs.vectors_ingest_duration:.2f}s "
        f"zonemap={bs.zonemap_build_duration:.2f}s chunks={bs.n_chunks}"
    )
    return store


def run_tpu(store) -> float:
    from otters_tpu import Cmp, Metric, col

    rng = np.random.default_rng(1)
    # query batches prepared up front (host->device off the timed path, as
    # in a pipeline fed by an upstream embedding model)
    import jax.numpy as jnp

    batches = [
        jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        for _ in range(TIMED_BATCHES)
    ]
    import jax

    jax.block_until_ready(batches)
    bi = [0]

    def dispatch():
        q = batches[bi[0] % TIMED_BATCHES]
        bi[0] += 1
        return (
            store.query_batch(q, Metric.Cosine)
            .meta_filter(col("price").lt(50.0) & col("version").gte(2))
            .vec_filter(-1.0, Cmp.Gt)
            .take(K)
            .collect_async()
        )

    # warm-up / compile
    t0 = time.perf_counter()
    r = dispatch().result()
    log(
        f"warm-up (compile): {time.perf_counter() - t0:.2f}s, "
        f"{len(r)} results, stats={store.last_query_stats().evaluated_chunks}"
        f"/{store.last_query_stats().total_chunks} chunks evaluated"
    )
    assert len(r) == K

    # sequential (one in flight at a time)
    t0 = time.perf_counter()
    for _ in range(TIMED_BATCHES):
        r = dispatch().result()
    seq_dt = time.perf_counter() - t0
    log(
        f"tpu sequential: {TIMED_BATCHES} x {B} queries in {seq_dt:.3f}s -> "
        f"{B * TIMED_BATCHES / seq_dt:.1f} q/s"
    )

    # pipelined (collect_async: dispatch all, then one batched resolve);
    # best of 3 rounds — the shared host/tunnel adds ~2x run-to-run noise
    from otters_tpu.meta import resolve

    best = 0.0
    for round_i in range(3):
        t0 = time.perf_counter()
        pending = [dispatch() for _ in range(TIMED_BATCHES)]
        results = resolve(pending)
        dt = time.perf_counter() - t0
        qps = B * TIMED_BATCHES / dt
        assert all(len(r) == K for r in results)
        log(
            f"tpu pipelined round {round_i}: {TIMED_BATCHES} x {B} queries "
            f"in {dt:.3f}s -> {qps:.1f} q/s"
        )
        best = max(best, qps)
    return best


def cpu_proxy_qps() -> float:
    """CPU brute-force proxy for the reference implementation."""
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(CPU_SUB_N, D)).astype(np.float32)
    inv = 1.0 / np.linalg.norm(vecs, axis=1)
    q = rng.normal(size=(CPU_SUB_B, D)).astype(np.float32)
    qinv = 1.0 / np.linalg.norm(q, axis=1)

    dt = float("inf")  # best of 3: favor the reference under host noise
    for _ in range(3):
        t0 = time.perf_counter()
        scores = (q @ vecs.T) * qinv[:, None] * inv[None, :]
        flat = scores.reshape(-1)
        top = np.argpartition(-flat, K)[:K]
        _ = flat[top]
        dt = min(dt, time.perf_counter() - t0)

    # scale rows up to N, credit the reference the same 50% chunk pruning
    per_query = dt / CPU_SUB_B * (N / CPU_SUB_N) * 0.5
    qps = 1.0 / per_query
    log(
        f"cpu proxy: {CPU_SUB_B}q x {CPU_SUB_N} rows in {dt:.3f}s -> "
        f"scaled (with 50% pruning credit) {qps:.2f} q/s"
    )
    return qps


def main() -> None:
    import os

    tpu_qps = None
    try:
        store = build_store()
        tpu_qps = run_tpu(store)
    except Exception as e:  # insurance: fall back to the pure-XLA path
        log(f"pallas path failed ({type(e).__name__}: {e}); retrying XLA-only")
        os.environ["OTTERS_DISABLE_PALLAS"] = "1"
    if tpu_qps is None:
        # rebuild OUTSIDE the except block: the exception's traceback kept
        # the failed run's frames (and the first store's HBM) alive until
        # the handler exited
        store = None
        tpu_qps = run_tpu(build_store())
    cpu_qps = cpu_proxy_qps()
    result = {
        "metric": "filtered_cosine_exact_top10_qps_1Mx768",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
