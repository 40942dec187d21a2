"""Round-2 batched TPU experiments (run ONCE in background; compiles are
minutes each on the remote compile service).

1. narrow-batch kernel (b=1/8) Mosaic compile + exactness vs XLA
2. b=1 @ 1M x 768: pruned pallas vs unpruned pallas vs XLA panel timing
3. int8 kernel @ 1M x 768 b=256: compile + exactness + timing
4. b=256 f32 @ 1M x 768 regression timing (qaux layout change)
5. compile-cache probes: second-filter compile time; serialize_executable
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    return jax.device_get(x)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring
    from otters_tpu.types import Cmp, Metric

    log("platform:", jax.devices()[0].platform)

    # ---------- 1. narrow-batch small-scale exactness on TPU ----------
    rng = np.random.default_rng(0)
    n, d = 131072, 128
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    dv = scoring.materialize(vecs)
    n_pad = dv.vectors.shape[0]
    for b in (1, 8):
        q = rng.normal(size=(b, d)).astype(np.float32)
        t = pk.choose_tile(d, n_pad, pk._pad_b(b))
        alive = jnp.ones(n_pad // t, dtype=bool)
        t0 = time.perf_counter()
        rows, scores, ok, check = fetch(pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            jnp.asarray(q), None, jnp.float32(0.0), alive,
            metric=Metric.Cosine, k=10, take_min=False, cmp=None,
        ))
        log(f"exp1 b={b}: compile+run {time.perf_counter()-t0:.1f}s")
        qi = 1 / np.linalg.norm(q, axis=1)
        vi = 1 / np.linalg.norm(vecs, axis=1)
        s = (q @ vecs.T) * qi[:, None] * vi[None, :]
        want = np.sort(s.reshape(-1))[::-1][:10]
        err = np.abs(np.sort(scores)[::-1] - want).max()
        log(f"exp1 b={b}: ok={ok.all()} max_err={err:.2e}")
        assert ok.all() and err < 1e-5, "exp1 FAILED"
    log("exp1 PASS: narrow-batch kernel exact on TPU")

    # ---------- 2. b=1 @ 1M x 768 pruning payoff ----------
    key = jax.random.PRNGKey(0)
    N, D = 1_000_000, 768
    V = jax.random.normal(key, (N, D), dtype=jnp.float32)
    dv1 = scoring.materialize_from_device(V)
    n_pad1 = dv1.vectors.shape[0]
    del V
    q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    t1 = pk.choose_tile(D, n_pad1, pk._pad_b(1))
    n_tiles1 = n_pad1 // t1
    # 50% pruning: even tiles alive, row mask matches
    alive_half = jnp.asarray(np.arange(n_tiles1) % 2 == 0)
    rmask_half_np = np.zeros(n_pad1, dtype=bool)
    for ti in range(0, n_tiles1, 2):
        rmask_half_np[ti * t1:(ti + 1) * t1] = True
    rmask_half = jnp.asarray(rmask_half_np)
    alive_all = jnp.ones(n_tiles1, dtype=bool)

    def run_pallas_b1(alive, rmask):
        return pk.pallas_topk(
            dv1.vectors, dv1.norms_sq, dv1.inv_norms, dv1.valid,
            q1, rmask, jnp.float32(-1.0), alive,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt,
        )

    def timeit(fn, reps=20):
        fetch(fn())  # compile+warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        fetch(r)
        return (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    fetch(run_pallas_b1(alive_all, None))
    log(f"exp2 compile unpruned: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    fetch(run_pallas_b1(alive_half, rmask_half))
    log(f"exp2 compile pruned: {time.perf_counter()-t0:.1f}s")
    dt_un = timeit(lambda: run_pallas_b1(alive_all, None))
    dt_pr = timeit(lambda: run_pallas_b1(alive_half, rmask_half))
    # XLA panel path b=1 (no pruning possible)
    qn = np.asarray(q1)
    t0 = time.perf_counter()
    _ = scoring.run_vec_topk(dv1, qn, Metric.Cosine, 10, False, None, None)
    log(f"exp2 panel-XLA compile: {time.perf_counter()-t0:.1f}s")
    import os
    os.environ["OTTERS_DISABLE_PALLAS"] = "1"
    t0 = time.perf_counter()
    _ = scoring.run_vec_topk(dv1, qn, Metric.Cosine, 10, False, None, None)
    dt_xla0 = time.perf_counter() - t0
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = scoring.run_vec_topk(dv1, qn, Metric.Cosine, 10, False, None, None)
    dt_xla = (time.perf_counter() - t0) / reps
    del os.environ["OTTERS_DISABLE_PALLAS"]
    log(f"exp2 b=1 1Mx768: pallas unpruned {dt_un*1e3:.2f}ms  "
        f"pruned50 {dt_pr*1e3:.2f}ms  xla-panel {dt_xla*1e3:.2f}ms "
        f"(first {dt_xla0*1e3:.1f}ms)")
    log(f"exp2 speedup pruned-vs-unpruned: {dt_un/dt_pr:.2f}x; "
        f"pruned-vs-xla: {dt_xla/dt_pr:.2f}x")

    # ---------- 3. int8 @ 1M x 768, b=256 ----------
    V8src = jax.random.normal(jax.random.PRNGKey(1), (n_pad1, D), dtype=jnp.float32)
    dv8 = scoring.materialize_from_device(V8src, n_valid=N, dtype=jnp.int8)
    del V8src
    q256 = jnp.asarray(rng.normal(size=(256, D)).astype(np.float32))
    t8 = pk.choose_tile(D, n_pad1, pk._pad_b(256))
    alive8 = jnp.ones(n_pad1 // t8, dtype=bool)

    def run_int8():
        return pk.pallas_topk(
            dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
            q256, None, jnp.float32(0.0), alive8,
            metric=Metric.Cosine, k=10, take_min=False, cmp=None,
        )

    t0 = time.perf_counter()
    rows8, s8, ok8, _ = fetch(run_int8())
    log(f"exp3 int8 compile+run: {time.perf_counter()-t0:.1f}s ok={ok8.all()}")
    dt8 = timeit(run_int8, reps=10)
    log(f"exp3 int8 1Mx768 b=256 unfiltered: {dt8*1e3:.2f}ms/batch "
        f"-> {256/dt8:.0f} q/s")
    # spot-exactness vs XLA int8 path on 3 queries
    rowsx, sx, okx = scoring.run_vec_topk(
        dv8, np.asarray(q256[:3]), Metric.Cosine, 10, False, None, None)
    t3 = pk.choose_tile(D, n_pad1, pk._pad_b(3))
    rows3, s3, ok3, _ = fetch(pk.pallas_topk(
        dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
        q256[:3], None, jnp.float32(0.0), jnp.ones(n_pad1 // t3, dtype=bool),
        metric=Metric.Cosine, k=10, take_min=False, cmp=None,
    ))
    match = sorted(np.asarray(rows3).tolist()) == sorted(np.asarray(rowsx).tolist())
    log(f"exp3 int8 pallas==xla rows: {match}")

    # ---------- 4. b=256 f32 regression ----------
    t4 = pk.choose_tile(D, n_pad1, pk._pad_b(256))
    n_t4 = n_pad1 // t4
    alive_h4 = jnp.asarray(np.arange(n_t4) % 2 == 0)
    rm4 = np.zeros(n_pad1, dtype=bool)
    for ti in range(0, n_t4, 2):
        rm4[ti * t4:(ti + 1) * t4] = True
    rm4 = jnp.asarray(rm4)

    def run_f32_256():
        return pk.pallas_topk(
            dv1.vectors, dv1.norms_sq, dv1.inv_norms, dv1.valid,
            q256, rm4, jnp.float32(-1.0), alive_h4,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt,
        )

    t0 = time.perf_counter()
    fetch(run_f32_256())
    log(f"exp4 compile: {time.perf_counter()-t0:.1f}s")
    dt256 = timeit(run_f32_256, reps=10)
    log(f"exp4 f32 b=256 1Mx768 pruned50: {dt256*1e3:.2f}ms/batch "
        f"(round-1 figure ~6.8ms) -> {256/dt256:.0f} q/s")

    # fast-exact (bf16_3x certify) timing
    def run_f32_256_fast():
        return pk.pallas_topk(
            dv1.vectors, dv1.norms_sq, dv1.inv_norms, dv1.valid,
            q256, rm4, jnp.float32(-1.0), alive_h4,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt, fast=True,
        )

    t0 = time.perf_counter()
    out = fetch(run_f32_256_fast())
    log(f"exp4 fast compile: {time.perf_counter()-t0:.1f}s check={out[3]}")
    dtf = timeit(run_f32_256_fast, reps=10)
    log(f"exp4 fast-exact b=256: {dtf*1e3:.2f}ms/batch")

    # ---------- 5. compile-cache probes ----------
    # (a) does a second meta filter (same shapes) pay the Mosaic compile again?
    from otters_tpu import Column, DataType, MetaStore, col
    idx = np.arange(200_000)
    price = (idx % 100).astype(np.float64)
    version = (idx % 5).astype(np.int32)
    cols = [
        Column("price", DataType.Float64).from_values(price),
        Column("version", DataType.Int32).from_values(version),
    ]
    vv = jax.random.normal(jax.random.PRNGKey(2), (200_000, 256), jnp.float32)
    store = (MetaStore.from_columns(cols).with_vectors(vv)
             .with_chunk_size(1024).build())
    qq = rng.normal(size=(64, 256)).astype(np.float32)
    t0 = time.perf_counter()
    store.query_batch(qq, Metric.Cosine).meta_filter(
        col("price").lt(50.0)).take(10).collect()
    dt_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    store.query_batch(qq, Metric.Cosine).meta_filter(
        col("version").gte(2)).take(10).collect()
    dt_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    store.query_batch(qq, Metric.Cosine).meta_filter(
        col("price").gt(10.0) & col("version").lt(3)).take(10).collect()
    dt_c = time.perf_counter() - t0
    log(f"exp5a meta compile: filter1 {dt_a:.1f}s filter2 {dt_b:.1f}s "
        f"filter3(2-clause) {dt_c:.1f}s")

    # (b) serialize_executable probe
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize,
        )

        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        xx = jnp.ones((256, 256))
        c = f.lower(xx).compile()
        blob, in_tree, out_tree = serialize(c)
        log(f"exp5b serialize_executable: OK, {len(blob)} bytes")
        c2 = deserialize_and_load(blob, in_tree, out_tree)
        log(f"exp5b deserialize+run: {fetch(c2(xx))}")
    except Exception as e:
        log(f"exp5b serialize_executable FAILED: {type(e).__name__}: {e}")

    log("ALL EXPERIMENTS DONE")


if __name__ == "__main__":
    main()
