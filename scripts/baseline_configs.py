"""BASELINE.md measurement configs 1-4 (config 5 = bench.py's 10M headline).

1. VecStore cosine top-5 on the demo catalog (8 x 4, chunk_size=4)
2. VecStore dot / L2 + vec_filter top-k, 100k x 128
3. MetaStore numeric zonemap pruning (price/version ranges), chunk 1024
4. MetaStore Bloom string eq + DateTime range, prune-heavy scan

Prints one JSON line per config with per-query latency (sequential,
includes the device->host fetch) and pipelined throughput where batching
applies.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit_seq(fn, reps=30):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def config1():
    from otters_tpu import Metric, VecStore

    vectors = [
        [0.9, 0.1, 0.0, 0.0], [0.8, 0.2, 0.1, 0.0],
        [0.1, 0.9, 0.1, 0.0], [0.0, 0.8, 0.2, 0.1],
        [0.1, 0.1, 0.9, 0.1], [0.0, 0.1, 0.8, 0.2],
        [0.2, 0.0, 0.1, 0.9], [0.1, 0.0, 0.2, 0.8],
    ]
    store = VecStore(4)
    store.add_vectors(vectors)
    q = [0.85, 0.15, 0.05, 0.0]

    def run():
        return store.query(q, Metric.Cosine).take(5).collect()

    r = run()
    assert len(r) == 5 and r[0].index == 0
    dt = timeit_seq(run)
    emit(config=1, what="demo catalog 8x4 cosine top-5",
         per_query_ms=round(dt * 1e3, 3))


def config2():
    from otters_tpu import Cmp, Metric, VecStore

    rng = np.random.default_rng(0)
    n, d, k = 100_000, 128, 10
    store = VecStore(d)
    store.add_vectors(rng.normal(size=(n, d)).astype(np.float32))
    q = rng.normal(size=(64, d)).astype(np.float32)
    for metric, cmp, thr, take_min in (
        (Metric.DotProduct, Cmp.Gt, 5.0, False),
        (Metric.Euclidean, Cmp.Lt, 300.0, True),
    ):
        def run():
            plan = store.query(q, metric).filter(thr, cmp)
            plan = plan.take_min(k) if take_min else plan.take_max(k)
            return plan.collect()

        r = run()
        assert len(r) == k
        dt = timeit_seq(run)
        emit(config=2, what=f"100k x 128 {metric.value} + vec_filter top-10, 64q",
             per_batch_ms=round(dt * 1e3, 2),
             qps=round(64 / dt, 1))


def config3():
    import jax

    from otters_tpu import Column, DataType, Metric, MetaStore, col

    n, d, chunk = 1_000_000, 128, 1024
    vectors = jax.random.normal(jax.random.PRNGKey(0), (n, d), "float32")
    idx = np.arange(n)
    price = ((idx // chunk) % 10 * 10.0 + idx % 10).astype(np.float64)
    version = ((idx // chunk) % 4 + 1).astype(np.int32)
    store = (
        MetaStore.from_columns([
            Column("price", DataType.Float64).from_values(price),
            Column("version", DataType.Int32).from_values(version),
        ])
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build()
    )
    q = np.random.default_rng(1).normal(size=(64, d)).astype(np.float32)
    expr = col("price").lt(30.0) & col("version").gte(2)

    def run():
        return (
            store.query_batch(q, Metric.Cosine).meta_filter(expr).take(10)
            .collect()
        )

    r = run()
    assert len(r) == 10
    st = store.last_query_stats()
    dt = timeit_seq(run, reps=20)
    emit(config=3, what="1M x 128 numeric zonemap pruning, cosine top-10, 64q",
         evaluated_chunks=st.evaluated_chunks, total_chunks=st.total_chunks,
         per_batch_ms=round(dt * 1e3, 2), qps=round(64 / dt, 1))


def config4():
    import jax

    from otters_tpu import Column, DataType, Metric, MetaStore, col

    n, d, chunk = 1_000_000, 128, 1024
    vectors = jax.random.normal(jax.random.PRNGKey(2), (n, d), "float32")
    idx = np.arange(n)
    cat = np.where((idx // chunk) % 100 == 0, "rare", "common")
    days = ((idx // chunk) % 365).astype(np.int64)
    millis = 1704067200000 + days * 86400_000  # 2024-01-01 + chunk-day
    store = (
        MetaStore.from_columns([
            Column("cat", DataType.String).from_values(list(cat)),
            Column("ts", DataType.DateTime).from_values(millis),
        ])
        .with_vectors(vectors)
        .with_chunk_size(chunk)
        .build()
    )
    q = np.random.default_rng(3).normal(size=(64, d)).astype(np.float32)
    expr = col("cat").eq("rare") & col("ts").lt("2024-02-01")

    def run():
        return (
            store.query_batch(q, Metric.Cosine).meta_filter(expr).take(10)
            .collect()
        )

    r = run()
    st = store.last_query_stats()
    assert st.evaluated_chunks < st.total_chunks // 10, (
        "prune-heavy scan should drop >90% of chunks",
        st.evaluated_chunks, st.total_chunks,
    )
    assert len(r) == 10
    dt = timeit_seq(run, reps=20)
    emit(config=4, what="1M x 128 Bloom eq + DateTime range (prune-heavy), 64q",
         evaluated_chunks=st.evaluated_chunks, total_chunks=st.total_chunks,
         per_batch_ms=round(dt * 1e3, 2), qps=round(64 / dt, 1))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except Exception:
        pass
    for fn in (config1, config2, config3, config4):
        t0 = time.perf_counter()
        fn()
        log(f"{fn.__name__} done in {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
