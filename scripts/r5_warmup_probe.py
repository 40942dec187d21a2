"""Where does the 17.5 s first-query warm-up go? (real TPU only)

BENCH_r05_local measured cold_first_query_s=17.3 in a FRESH process and
warmup_first_query_s=17.56 in the main process — identical, so the cost is
NOT compile (the AOT disk cache was warm for the second) but some per-
process one-time work. This probe wraps ``aot.load_or_compile`` with
per-key timing and splits the first bench-shaped query into phases:

  plan build -> collect_async (host lowering + dispatch) -> result()
  (device wait + rerank + materialize), at 2M rows then optionally the
  full 10M bench store (``--10m``).

Usage: python scripts/r5_warmup_probe.py [--10m]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from otters_tpu import aot  # noqa: E402

_loads = []
_orig = aot.load_or_compile


def timed_load(key, jitted, args, static_kwargs):
    t0 = time.perf_counter()
    before = dict(aot.stats)
    out = _orig(key, jitted, args, static_kwargs)
    dt = time.perf_counter() - t0
    if dt > 0.05:
        how = (
            "mem"
            if aot.stats == before
            else ("disk" if aot.stats["disk_hits"] > before["disk_hits"]
                  else "compile")
        )
        _loads.append((dt, how, key[:60]))
    return out


aot.load_or_compile = timed_load
# meta.py binds `from . import aot` (module object), so patching the
# attribute on the module is enough.


def probe(store, label, query_fn):
    print(f"-- {label} --")
    for i in range(3):
        _loads.clear()
        t0 = time.perf_counter()
        plan = query_fn()
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        pending = plan.collect_async()
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = pending.result()
        t_res = time.perf_counter() - t0
        st = store.last_query_stats()
        print(
            f"  q{i}: plan={t_plan * 1e3:.0f}ms dispatch={t_disp * 1e3:.0f}ms "
            f"result={t_res * 1e3:.0f}ms  (prune={st.prune_duration * 1e3:.0f} "
            f"score={st.score_duration * 1e3:.0f} merge={st.merge_duration * 1e3:.0f} "
            f"certified={st.certified} width={st.scan_k_wide} "
            f"n={len(r)})"
        )
        for dt, how, key in _loads:
            print(f"      aot {how} {dt:.2f}s  {key}")


def main():
    import bench

    print("platform:", jax.devices()[0].platform)
    print("aot stats at start:", dict(aot.stats))

    if "--10m" in sys.argv:
        store, _, _ = bench.build_10m()
        n = bench.N10
    else:
        # 2M-row replica of the bench store (same columns/filter/rerank)
        n = 2_000_000
        from otters_tpu import MetaStore
        from otters_tpu.ops import scoring

        t0 = time.perf_counter()
        dv8 = scoring.materialize_int8_slabs(
            bench.row_vectors, n, bench.D, bench.SLAB
        )
        float(np.asarray(dv8.norms_sq[123]))
        print(f"synth+int8 {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        cols, _ = bench._columns(n, with_strings=True)
        store = (
            MetaStore.from_columns(cols)
            .with_vectors(dv8, n_rows=n)
            .with_chunk_size(bench.CHUNK)
            .with_rerank_source(fetch_vectors=bench.fetch_vectors_batch)
            .build()
        )
        float(jnp.asarray(store._chunk_lens[0]))
        print(f"build {time.perf_counter() - t0:.1f}s")

    from otters_tpu import Metric

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(bench.B, bench.D)).astype(np.float32))
    jax.block_until_ready(q)
    filt = bench._filter_expr()

    probe(
        store, "filtered + rerank + certify (bench warm-up shape)",
        lambda: store.query_batch(q, Metric.Cosine)
        .meta_filter(filt)
        .take(bench.K, rerank_from=bench.K_WIDE),
    )
    probe(
        store, "filtered, NO rerank, NO certify",
        lambda: store.query_batch(q, Metric.Cosine)
        .meta_filter(filt)
        .take(bench.K, certify=False),
    )
    probe(
        store, "unfiltered + rerank + certify",
        lambda: store.query_batch(q, Metric.Cosine)
        .take(bench.K, rerank_from=bench.K_WIDE),
    )
    from otters_tpu import col

    seq = col("category").eq(bench.CAT_VOCAB[3])
    probe(
        store, "string-eq + rerank + certify (bench string_eq shape)",
        lambda: store.query_batch(q, Metric.Cosine)
        .meta_filter(seq)
        .take(bench.K, rerank_from=bench.K_WIDE),
    )
    # steady-state pipelined rate for the string-eq config, with the
    # resolve() host path split out: dispatch-all wall vs resolve wall
    from otters_tpu.meta import resolve

    for label, make in (
        ("string_eq", lambda: store.query_batch(q, Metric.Cosine)
         .meta_filter(seq).take(bench.K, rerank_from=bench.K_WIDE)),
        ("string_eq certify=False", lambda: store.query_batch(q, Metric.Cosine)
         .meta_filter(seq).take(bench.K, rerank_from=bench.K_WIDE,
                                certify=False)),
        ("string_eq NO rerank", lambda: store.query_batch(q, Metric.Cosine)
         .meta_filter(seq).take(bench.K, certify=False)),
    ):
        make().collect_async().result()  # warm this variant
        for _ in range(2):
            t0 = time.perf_counter()
            pending = [make().collect_async() for _ in range(16)]
            t_disp = time.perf_counter() - t0
            resolve(pending)
            dt = time.perf_counter() - t0
            print(
                f"  pipelined {label}: {16 * bench.B / dt:.0f} q/s "
                f"(dispatch-all {t_disp * 1e3:.0f}ms, total {dt * 1e3:.0f}ms)"
            )
    print("aot stats at end:", dict(aot.stats))


if __name__ == "__main__":
    main()
