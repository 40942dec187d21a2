"""otters-tpu benchmark: the BASELINE.md north star on one chip.

Headline metric: queries/sec at exact-rerank top-10 over 10M x 768 vectors
with a zonemap-pruned metadata filter (50% of chunks), 256-query batches.
The 10M store uses int8 HBM storage (30.7 GB f32 cannot exist on a 16 GB
chip; 7.7 GB int8 can); each batch takes a widened candidate set (k'=100)
from the quantized scan and re-ranks it in exact f32 against regenerated
true vectors. recall@10 vs exact f32 ground truth is measured and reported.

Secondary configs (reported in the JSON "extras"): 4M x 768 exact f32
(largest f32 config that fits HBM), 1M x 768 exact f32 (round-1 headline,
for continuity), build times, warm-up, and the CPU proxy details.

vs_baseline: measured CPU brute-force proxy (torch if available, else
numpy/BLAS; multi-threaded across every visible core) on a subsample,
scaled linearly in rows, credited the same 50% pruning — then scaled to a
hypothetical 32-core reference box (this container exposes ONE core; the
per-core ratio is also reported). The >10x BASELINE target is against that
32-core extrapolation, no further arithmetic needed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# ---- configuration ---------------------------------------------------------
# Sizes are env-tunable ONLY so the full bench FLOW can be smoke-tested on
# CPU at tiny scale (OTTERS_BENCH_SCALE_DIV=N divides the row counts);
# reported BENCH numbers always come from the defaults on real hardware.
_DIV = max(1, int(os.environ.get("OTTERS_BENCH_SCALE_DIV", "1")))
N10 = 10_000_000 // _DIV
N4 = 4_000_000 // _DIV
N1 = 1_000_000 // _DIV
D = 768 if _DIV == 1 else 64
B = 256 if _DIV == 1 else 16
K = 10
K_WIDE = 100  # int8 candidate widening before exact f32 re-rank
CHUNK = 1024
SLAB = 1_000_000 // _DIV
TIMED_BATCHES = 16 if _DIV == 1 else 4
CPU_SUB_N = 200_000 // _DIV
CPU_SUB_B = 32
GT_QUERIES = 64 if _DIV == 1 else 8  # ground-truth recall sample


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _configure_jax():
    import jax

    from otters_tpu.utils import honor_jax_platforms_env

    # a CPU smoke run (JAX_PLATFORMS=cpu) must not initialize — and
    # possibly hang on — the tunnel; the env must win over sitecustomize
    honor_jax_platforms_env()

    cache_dir = "/tmp/jax_comp_cache"
    if os.environ.get("OTTERS_BENCH_COLD"):
        # cold probe: a virgin compilation cache too
        import tempfile

        cache_dir = tempfile.mkdtemp(prefix="jax_cold_cache_")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def cold_probe() -> None:
    """--cold-probe: measure the FIRST-EVER-machine experience on the 10M
    store — run by main() in a fresh subprocess whose env points
    OTTERS_AOT_CACHE at an empty dir (round-2 verdict item 2b). Prints one
    JSON line {cold_build_s, cold_first_query_s}."""
    _configure_jax()
    store, build_s, synth_s = build_10m()
    import jax.numpy as jnp

    from otters_tpu import Metric

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    t0 = time.perf_counter()
    r = (
        store.query_batch(q, Metric.Cosine)
        .meta_filter(_filter_expr())
        .take(K, rerank_from=K_WIDE)
        .collect()
    )
    first_q = time.perf_counter() - t0
    assert len(r) == K
    print(json.dumps({
        "cold_build_s": round(build_s, 1),
        "cold_first_query_s": round(first_q, 1),
        "cold_synth_s": round(synth_s, 1),
    }))


def run_cold_probe_subprocess():
    """Spawn the cold probe BEFORE this process touches the TPU (one TPU
    process at a time). Non-fatal: returns {} on any failure.

    The cold probe compiles the REAL 10M programs into its hermetic cache
    dir; on success those executables are PROMOTED (host file copy) into
    the shared AOT cache — the signature keys are identical (same code
    version, backend, shapes) — so every later process this session,
    including main() and the warm-restart probe, starts like a production
    restart: deserialize in ~0.3 s instead of recompiling ~16 s
    (hwlogs/warmup.log). The cold number itself stays virgin."""
    import subprocess
    import tempfile

    cold_dir = tempfile.mkdtemp(prefix="otters_cold_aot_")
    env = dict(
        os.environ,
        OTTERS_BENCH_COLD="1",
        OTTERS_AOT_CACHE=cold_dir,
        OTTERS_AOT_NO_WARM="1",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cold-probe"],
            env=env, stdout=subprocess.PIPE, timeout=3000,
        )
        lines = [
            ln for ln in proc.stdout.decode().strip().splitlines() if ln
        ]
        if proc.returncode == 0 and lines:
            out = json.loads(lines[-1])
            out["aot_blobs_promoted"] = _promote_cold_blobs(cold_dir)
            log(f"cold probe: {out}")
            return out
    except Exception:
        import traceback

        log("cold probe failed (non-fatal):\n" + traceback.format_exc())
    return {}


def _promote_cold_blobs(cold_dir: str) -> int:
    """Copy the cold probe's serialized executables into the shared AOT
    cache (same keys: code version + backend + avals are unchanged)."""
    import shutil

    from otters_tpu import aot

    dst = aot.cache_dir()
    if not dst:
        return 0
    os.makedirs(dst, exist_ok=True)
    n = 0
    try:
        for name in os.listdir(cold_dir):
            if not name.endswith(".jaxexe"):
                continue
            target = os.path.join(dst, name)
            if not os.path.exists(target):
                shutil.copy2(os.path.join(cold_dir, name), target)
                n += 1
    except OSError:
        pass
    return n


def warm_restart_probe() -> None:
    """--warm-restart-probe: the production RESTART experience — a fresh
    process on a machine whose shared AOT cache already holds this code
    version's executables (the cold probe's, promoted). Re-runs the REAL
    bench build + first certified filtered query, so the AOT keys, cert
    widths, and data distribution are exactly the headline's. (An earlier
    cheap-synthetic-data variant was both slower to generate over the
    tunnel and cert-hostile: float32 sin hashing of large row indices
    collapses to duplicate rows, whose exact score ties widen the
    certificate ladder to its cap — hwlogs/warmrestart.log.) Prints one
    JSON line."""
    _configure_jax()
    store, build_s, synth_s = build_10m()
    import jax.numpy as jnp

    from otters_tpu import Metric

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    t0 = time.perf_counter()
    r = (
        store.query_batch(q, Metric.Cosine)
        .meta_filter(_filter_expr())
        .take(K, rerank_from=K_WIDE)
        .collect()
    )
    first_q = time.perf_counter() - t0
    assert len(r) == K
    print(json.dumps({
        "warm_restart_build_s": round(build_s, 1),
        "warm_restart_synth_s": round(synth_s, 1),
        "warm_restart_first_query_s": round(first_q, 2),
    }))


def run_warm_restart_subprocess():
    """Measure the restart warm-up AFTER the cold probe promoted its blobs
    and BEFORE this process touches the TPU. Non-fatal."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--warm-restart-probe"],
            env=dict(os.environ), stdout=subprocess.PIPE, timeout=2400,
        )
        lines = [
            ln for ln in proc.stdout.decode().strip().splitlines() if ln
        ]
        if proc.returncode == 0 and lines:
            out = json.loads(lines[-1])
            log(f"warm restart probe: {out}")
            return out
    except Exception:
        import traceback

        log("warm restart probe failed (non-fatal):\n" + traceback.format_exc())
    return {}


CAT_VOCAB = [f"cat_{v:02d}" for v in range(16)]


def _columns(n: int, with_strings: bool = False):
    """price/version clustered per chunk (demo.rs pattern): even chunks
    expensive v1, odd chunks cheap v3 -> the filter prunes exactly half.
    with_strings adds a String (Bloom) category column clustered 16 ways
    per chunk and a DateTime column — BASELINE config 4's column mix at
    full 10M scale (round-2 verdict item 2c)."""
    from otters_tpu import Column, DataType

    idx = np.arange(n)
    chunk_id = idx // CHUNK
    even = chunk_id % 2 == 0
    price = np.where(even, 80.0 + (idx % 20), 10.0 + (idx % 20)).astype(
        np.float64
    )
    version = np.where(even, 1, 3).astype(np.int32)
    cols = [
        Column("price", DataType.Float64).from_values(price),
        Column("version", DataType.Int32).from_values(version),
    ]
    if with_strings:
        cat_code = chunk_id % 16
        cat = [CAT_VOCAB[c] for c in cat_code]
        # epoch millis spanning 2023-2024, clustered by chunk
        base = 1_672_531_200_000  # 2023-01-01
        listed = (base + (chunk_id % 730) * 86_400_000).astype(np.int64)
        cols.append(Column("category", DataType.String).from_values(cat))
        cols.append(Column("listed", DataType.DateTime).from_values(listed))
    return cols, (~even)


def _filter_expr():
    from otters_tpu import col

    return col("price").lt(50.0) & col("version").gte(2)


# ---- deterministic per-row vectors (regenerable for exact re-rank) ---------


def _row_vectors(start: int, rows: int):
    """f32 [rows, D]: row i's vector depends only on i (counter-based RNG),
    so any candidate row can be regenerated bit-identically later."""
    import jax
    import jax.numpy as jnp

    base = jax.random.PRNGKey(42)
    idx = jnp.uint32(start) + jnp.arange(rows, dtype=jnp.uint32)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(idx)
    return jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))(keys)


_row_vectors_jit = None


def row_vectors(start: int, rows: int):
    global _row_vectors_jit
    import jax

    if _row_vectors_jit is None:
        _row_vectors_jit = jax.jit(_row_vectors, static_argnums=(1,))
    return _row_vectors_jit(start, rows)


_FETCH_PAD = 2048  # fixed jit shape for candidate regeneration: 16 in-flight
# batches x K_WIDE unique candidates fit one block; bigger blocks fetch
# megabytes per resolve over the tunnel and dominate the pipeline
_fetch_jit = None


def fetch_vectors_batch(ids):
    """Regenerate true f32 rows for candidate ids (counter-based RNG): the
    store's public rerank source (builder.with_rerank_source)."""
    global _fetch_jit
    import jax
    import jax.numpy as jnp

    if _fetch_jit is None:

        @jax.jit
        def f(idv):
            base = jax.random.PRNGKey(42)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(idv)
            return jax.vmap(
                lambda k: jax.random.normal(k, (D,), jnp.float32)
            )(keys)

        _fetch_jit = f
    ids = np.asarray(ids, dtype=np.uint32)
    if len(ids) <= _FETCH_PAD:
        pad = np.zeros(_FETCH_PAD, np.uint32)
        pad[: len(ids)] = ids
        # returned ON DEVICE: resolve()'s batched device rerank consumes it
        # without ever fetching the candidate matrix to the host
        return _fetch_jit(pad)[: len(ids)]
    out = np.empty((len(ids), D), np.float32)
    for off in range(0, len(ids), _FETCH_PAD):
        blk = ids[off : off + _FETCH_PAD]
        pad = np.zeros(_FETCH_PAD, np.uint32)
        pad[: len(blk)] = blk
        out[off : off + len(blk)] = np.asarray(_fetch_jit(pad))[: len(blk)]
    return out


# ---- 10M x 768 int8 + exact f32 re-rank -------------------------------------


def build_10m():
    import jax

    from otters_tpu import MetaStore
    from otters_tpu.ops import scoring

    t0 = time.perf_counter()
    dv8 = scoring.materialize_int8_slabs(row_vectors, N10, D, SLAB)
    # block_until_ready does NOT sync on tunneled backends; a value fetch
    # does. Without it the slab synthesis (device-RNG generation of 10M
    # rows, the DATASET creation — not index build) drains inside whatever
    # fetches next and was mis-attributed to warm-up in earlier rounds.
    float(np.asarray(dv8.norms_sq[12345]))
    ingest = time.perf_counter() - t0
    log(f"10M data synthesis + int8 quantization: {ingest:.1f}s "
        f"({dv8.vectors.nbytes / 1e9:.2f} GB HBM)")

    t0 = time.perf_counter()
    cols, _ = _columns(N10, with_strings=True)
    cols_dur = time.perf_counter() - t0
    log(f"10M column staging (incl 10M-row String + DateTime): {cols_dur:.1f}s")
    t0 = time.perf_counter()
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(dv8, n_rows=N10)
        .with_chunk_size(CHUNK)
        .with_rerank_source(fetch_vectors=fetch_vectors_batch)
        .build()
    )
    bs = store.build_stats()
    # true-sync the zonemap arrays too, so build time is honest and the
    # warm-up below measures only the first QUERY
    import jax.numpy as _jq

    float(_jq.asarray(store._chunk_lens[0]))
    build_total = time.perf_counter() - t0
    log(f"10M build: zonemap={bs.zonemap_build_duration:.2f}s "
        f"drained_total={build_total:.2f}s chunks={bs.n_chunks} "
        f"(data synthesis {ingest:.1f}s reported separately)")
    return store, build_total, ingest


GT_SLAB = 500_000  # smaller slabs: the 7.7 GB int8 store is still resident


def ground_truth_10m(queries_np: np.ndarray, odd_mask_chunks: np.ndarray):
    """Exact f32 filtered global top-K by scanning regenerated slabs."""
    import jax

    from otters_tpu import Metric
    from otters_tpu.ops import scoring

    t0 = time.perf_counter()
    best = []  # (score, row)
    for start in range(0, N10, GT_SLAB):
        rows = min(GT_SLAB, N10 - start)
        slab = row_vectors(start, GT_SLAB)[:rows]
        dv = scoring.materialize_from_device(slab, n_valid=rows)
        idx = np.arange(start, start + dv.vectors.shape[0])
        rmask = np.zeros(dv.vectors.shape[0], dtype=bool)
        in_range = idx < N10
        rmask[in_range] = odd_mask_chunks[idx[in_range] // CHUNK]
        r, s, ok = scoring.run_vec_topk(
            dv, queries_np, Metric.Cosine, K, take_min=False, cmp=None,
            thr=None, row_mask=jax.numpy.asarray(rmask),
        )
        best.extend(
            (float(sc), start + int(row)) for row, sc, o in zip(r, s, ok) if o
        )
        del dv, slab
    best.sort(key=lambda t: -t[0])
    log(f"ground truth pass: {time.perf_counter() - t0:.1f}s")
    return [row for _, row in best[:K]]


def run_10m(store):
    import jax
    import jax.numpy as jnp

    from otters_tpu import Metric, col
    from otters_tpu.evaluate import recall_at_k
    from otters_tpu.meta import resolve

    rng = np.random.default_rng(1)
    batches = [
        jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        for _ in range(TIMED_BATCHES)
    ]
    jax.block_until_ready(batches)
    filters = {
        "filtered": _filter_expr(),
        "unfiltered": None,
        "string_eq": col("category").eq(CAT_VOCAB[3]),
    }
    bi = [0]

    def dispatch(which):
        # "filtered_uncert" = the headline filter with the round-4 int8
        # exactness certificate DISABLED (round-3 measured behavior) so a
        # certificate-induced qps delta reads as what it is, not a
        # regression; every other config runs certify auto (the default
        # user experience: recall 1.0 by construction)
        certify = False if which == "filtered_uncert" else None
        fkey = "filtered" if which == "filtered_uncert" else which
        q = batches[bi[0] % TIMED_BATCHES]
        bi[0] += 1
        plan = store.query_batch(q, Metric.Cosine)
        if filters[fkey] is not None:
            plan = plan.meta_filter(filters[fkey])
        # PUBLIC rerank API (round-2 verdict item 3): the scan widens to
        # K_WIDE int8 candidates, result() exact-f32-reranks to top-K —
        # the measured qps is the true end-to-end exact-top-10 rate
        return plan.take(
            K, rerank_from=K_WIDE, certify=certify
        ).collect_async()

    # warm-up / compile (AOT cache makes reruns near-instant)
    t0 = time.perf_counter()
    r = dispatch("filtered").result()
    warm = time.perf_counter() - t0
    st = store.last_query_stats()
    log(f"10M warm-up (compile): {warm:.2f}s, {len(r)} results, "
        f"{st.evaluated_chunks}/{st.total_chunks} chunks evaluated")
    assert len(r) == K
    # odd-indexed chunks survive: exactly floor(total / 2) of them
    assert st.evaluated_chunks == st.total_chunks // 2, (
        st.evaluated_chunks, st.total_chunks,
    )

    # let the background jit warm finish so timing measures the steady-state
    # dispatch path (queries keep being served by the AOT executable even if
    # this times out)
    from otters_tpu import aot

    t0 = time.perf_counter()
    aot.wait_jit_ready(timeout=420.0)
    log(f"jit warm switch: {time.perf_counter() - t0:.1f}s")

    disp = {}

    def timed_qps(which, rounds=5):
        # >= 5 trials per config with dispersion recorded (the round-3 1M
        # tunnel-variance lesson, ROUND3.md): a future regression must be
        # distinguishable from tunnel noise in the artifact itself.
        # The reported value is the MEDIAN (VERDICT r4 weak-7: max-of-5
        # flattered the headline 3.3x); max/min stay in extras.dispersion.
        dispatch(which).result()  # compile this variant
        # warm the FULL pipeline depth once: resolve()'s batched device
        # rerank compiles per (group size, union bucket) shape, which a
        # single-query warm never exercises — round 0 otherwise pays that
        # compile inside its timing (r5 hwlogs/bench.log: round 0 1.303 s
        # vs 0.35 s steady ⇒ dispersion min 3.3k q/s on a 12k median). The
        # first-query/restart costs stay measured by the cold and
        # warm-restart probes.
        # twice: the background jit warm for a signature only starts on
        # its SECOND use — one warm resolve would start it mid-round-0
        for _ in range(2):
            resolve([dispatch(which) for _ in range(TIMED_BATCHES)])
        aot.wait_jit_ready(timeout=420.0)
        vals = []
        for round_i in range(rounds):
            t0 = time.perf_counter()
            pending = [dispatch(which) for _ in range(TIMED_BATCHES)]
            results = resolve(pending)
            dt = time.perf_counter() - t0
            qps = B * TIMED_BATCHES / dt
            assert all(len(x) == K for x in results)
            log(f"10M {which} round {round_i}: {TIMED_BATCHES} x {B} q in "
                f"{dt:.3f}s -> {qps:.1f} q/s")
            vals.append(qps)
        disp[which] = _dispersion(vals)
        import statistics

        return statistics.median(vals)

    best = timed_qps("filtered")
    # scan-only continuity metric (round-2's headline definition: k'=100
    # candidates, no rerank) so rounds stay comparable
    qps_scan = None
    try:
        bi_s = [0]

        def dispatch_scan():
            q = batches[bi_s[0] % TIMED_BATCHES]
            bi_s[0] += 1
            return (
                store.query_batch(q, Metric.Cosine)
                .meta_filter(filters["filtered"])
                .take(K_WIDE)
                .collect_async()
            )

        dispatch_scan().result()
        aot.wait_jit_ready(timeout=420.0)
        for _ in range(3):
            t0 = time.perf_counter()
            results = resolve([dispatch_scan() for _ in range(TIMED_BATCHES)])
            dt = time.perf_counter() - t0
            qps_scan = max(qps_scan or 0.0, B * TIMED_BATCHES / dt)
        log(f"10M scan-only (k'=100, r2 definition): {qps_scan:.1f} q/s")
    except Exception:
        import traceback as _tb

        log("scan-only section failed (non-fatal):\n" + _tb.format_exc())
    qps_unf = qps_str = None
    try:
        qps_unf = timed_qps("unfiltered")
        st = store.last_query_stats()
        assert st.evaluated_chunks == st.total_chunks
    except Exception:
        import traceback as _tb

        log("unfiltered section failed (non-fatal):\n" + _tb.format_exc())
    try:
        qps_str = timed_qps("string_eq")
        st = store.last_query_stats()
        # category is clustered 16 ways per chunk: 1/16 of chunks survive
        want = sum(
            1 for c in range(st.total_chunks) if c % 16 == 3
        )
        assert st.evaluated_chunks == want, (st.evaluated_chunks, want)
        log(f"string-eq prune: {st.evaluated_chunks}/{st.total_chunks}")
    except Exception:
        import traceback as _tb

        log("string_eq section failed (non-fatal):\n" + _tb.format_exc())
    qps_uncert = None
    try:
        qps_uncert = timed_qps("filtered_uncert")
        log(f"10M filtered UNcertified (round-3 continuity): "
            f"{qps_uncert:.1f} q/s")
    except Exception:
        import traceback as _tb

        log("filtered_uncert section failed (non-fatal):\n"
            + _tb.format_exc())

    # wide-batch scaling: B=512 amortizes phase-2/top-k overhead across
    # twice the queries. Reported in extras; the headline stays the
    # BASELINE config's 256-query batches.
    qps512 = None
    try:
        b512 = [
            jnp.asarray(rng.normal(size=(2 * B, D)).astype(np.float32))
            for _ in range(8)
        ]
        jax.block_until_ready(b512)
        bi512 = [0]

        def dispatch512():
            q = b512[bi512[0] % len(b512)]
            bi512[0] += 1
            return (
                store.query_batch(q, Metric.Cosine)
                .meta_filter(filters["filtered"])
                .take(K, rerank_from=K_WIDE)
                .collect_async()
            )

        dispatch512().result()  # compile
        for _ in range(2):  # group-shape warm (2nd use starts the jit warm)
            resolve([dispatch512() for _ in range(8)])
        aot.wait_jit_ready(timeout=420.0)
        for _ in range(3):
            t0 = time.perf_counter()
            results = resolve([dispatch512() for _ in range(8)])
            dt = time.perf_counter() - t0
            q512 = 2 * B * 8 / dt
            assert all(len(x) == K for x in results)
            qps512 = max(qps512 or 0.0, q512)
        log(f"10M wide-batch B={2 * B}: {qps512:.1f} q/s")
    except Exception:
        import traceback as _tb

        log("B=512 section failed (non-fatal):\n" + _tb.format_exc())

    # recall@10 vs exact f32 ground truth, filtered AND unfiltered, through
    # the same public API the timed path uses
    q_small = np.asarray(batches[0][:GT_QUERIES])
    res_f = (
        store.query_batch(q_small, Metric.Cosine)
        .meta_filter(filters["filtered"])
        .take(K, rerank_from=K_WIDE)
        .collect()
    )
    st_f = store.last_query_stats()
    certified = st_f.certified
    cert_kwide = st_f.scan_k_wide
    log(f"10M int8 exactness certificate: certified={certified} "
        f"(scan width {cert_kwide})")
    odd_chunks = np.zeros(-(-N10 // CHUNK), dtype=bool)
    odd_chunks[1::2] = True
    want_f = ground_truth_10m(q_small, odd_chunks)
    rec = recall_at_k(want_f, res_f.indices)
    log(f"10M filtered recall@10 (public rerank API): {rec:.3f}")
    rec_unf = None
    try:
        res_u = (
            store.query_batch(q_small, Metric.Cosine)
            .take(K, rerank_from=K_WIDE)
            .collect()
        )
        want_u = ground_truth_10m(
            q_small, np.ones(-(-N10 // CHUNK), dtype=bool)
        )
        rec_unf = recall_at_k(want_u, res_u.indices)
        log(f"10M unfiltered recall@10: {rec_unf:.3f}")
    except Exception:
        import traceback as _tb

        log("unfiltered recall failed (non-fatal):\n" + _tb.format_exc())
    return {
        "qps10": best, "warm": warm, "rec": rec, "qps512": qps512,
        "qps_unf": qps_unf, "qps_str": qps_str, "rec_unf": rec_unf,
        "qps_scan": qps_scan, "certified": certified,
        "cert_kwide": cert_kwide, "dispersion": disp,
        "qps_uncert": qps_uncert,
    }


# ---- f32 configs -------------------------------------------------------------


def _dispersion(vals):
    """median/min/max over the trial qps values (ROUND3.md tunnel-variance
    lesson: a single number can't be told apart from 2x tunnel noise)."""
    import statistics

    return {
        "median": round(statistics.median(vals), 1),
        "min": round(min(vals), 1),
        "max": round(max(vals), 1),
        "n": len(vals),
    }


def run_f32(n: int, label: str):
    import jax
    import jax.numpy as jnp

    from otters_tpu import Metric, MetaStore
    from otters_tpu.meta import resolve

    from otters_tpu.ops import scoring

    t0 = time.perf_counter()
    # donated slab writes: peak HBM = store + one slab (concatenate would
    # briefly double a 12 GB store)
    dv = scoring.materialize_f32_slabs(row_vectors, n, D, GT_SLAB)
    float(np.asarray(dv.norms_sq[123]))  # true sync (see build_10m)
    cols, _ = _columns(n)
    store = (
        MetaStore.from_columns(cols)
        .with_vectors(dv, n_rows=n)
        .with_chunk_size(CHUNK)
        .build()
    )
    float(jnp.asarray(store._chunk_lens[0]))
    log(f"{label} f32 synth+build (drained): {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(2)
    batches = [
        jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        for _ in range(TIMED_BATCHES)
    ]
    jax.block_until_ready(batches)
    expr = _filter_expr()
    bi = [0]

    def dispatch():
        q = batches[bi[0] % TIMED_BATCHES]
        bi[0] += 1
        return (
            store.query_batch(q, Metric.Cosine)
            .meta_filter(expr)
            .take(K)
            .collect_async()
        )

    t0 = time.perf_counter()
    r = dispatch().result()
    log(f"{label} warm-up: {time.perf_counter() - t0:.2f}s ({len(r)} results)")
    assert len(r) == K
    from otters_tpu import aot

    aot.wait_jit_ready(timeout=420.0)
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        pending = [dispatch() for _ in range(TIMED_BATCHES)]
        results = resolve(pending)
        dt = time.perf_counter() - t0
        vals.append(B * TIMED_BATCHES / dt)
    log(f"{label} f32 pipelined: {max(vals):.1f} q/s "
        f"(median {_dispersion(vals)['median']})")
    return max(vals), _dispersion(vals)


# ---- CPU proxy ---------------------------------------------------------------


def cpu_proxy_qps():
    """Multi-threaded CPU brute-force proxy for the reference (torch if
    available, else numpy/BLAS). Returns (measured qps at N10 rows with 50%
    pruning credit, cores used)."""
    import os

    cores = os.cpu_count() or 1
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(CPU_SUB_N, D)).astype(np.float32)
    q = rng.normal(size=(CPU_SUB_B, D)).astype(np.float32)
    try:
        import torch

        torch.set_num_threads(cores)
        tv = torch.from_numpy(vecs)
        tq = torch.from_numpy(q)
        tinv = 1.0 / tv.norm(dim=1)
        tqinv = 1.0 / tq.norm(dim=1)
        dt = float("inf")
        for _ in range(7):  # best-of-7: shared-host contention makes single
            t0 = time.perf_counter()  # measurements swing ~5x; min-dt is the
            scores = (tq @ tv.T) * tqinv[:, None] * tinv[None, :]  # fair
            _ = torch.topk(scores.reshape(-1), K)  # (conservative) estimate
            dt = min(dt, time.perf_counter() - t0)
        engine = f"torch x{cores} threads"
    except Exception:
        inv = 1.0 / np.linalg.norm(vecs, axis=1)
        qinv = 1.0 / np.linalg.norm(q, axis=1)
        dt = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            scores = (q @ vecs.T) * qinv[:, None] * inv[None, :]
            flat = scores.reshape(-1)
            _ = flat[np.argpartition(-flat, K)[:K]]
            dt = min(dt, time.perf_counter() - t0)
        engine = f"numpy x{cores} core"
    per_query = dt / CPU_SUB_B * (N10 / CPU_SUB_N) * 0.5  # 50% pruning credit
    qps = 1.0 / per_query
    log(f"cpu proxy ({engine}): {CPU_SUB_B}q x {CPU_SUB_N} rows in {dt:.3f}s "
        f"-> {qps:.2f} q/s at 10M rows (pruning credited)")
    return qps, cores


def main() -> dict:
    # cold-cache probe FIRST: it runs in its own process and must not
    # overlap this one's device use
    cold = {} if os.environ.get("OTTERS_BENCH_NO_COLD") else (
        run_cold_probe_subprocess()
    )
    warm_restart = {} if os.environ.get("OTTERS_BENCH_NO_COLD") else (
        run_warm_restart_subprocess()
    )
    _configure_jax()
    import gc
    import traceback

    from otters_tpu import aot

    def drain():
        # background jit-warm threads hold the section's device arrays in
        # their closures; drain them so HBM is actually released before the
        # next multi-GB store is built
        aot.wait_jit_ready(timeout=300.0)
        gc.collect()

    store = None
    r10 = {}
    try:
        if os.environ.get("OTTERS_BENCH_FORCE_FAIL"):  # retry-path test hook
            raise RuntimeError("forced failure (OTTERS_BENCH_FORCE_FAIL)")
        store, build_s, synth_s = build_10m()
        r10 = run_10m(store)
        qps10 = r10["qps10"]
        warm, rec = r10["warm"], r10["rec"]
    except Exception:  # insurance: always emit a JSON line for the driver
        log("10M section failed:\n" + traceback.format_exc())
        qps10 = warm = rec = build_s = synth_s = None
    finally:
        store = None  # release the 7.7 GB store even on failure
    drain()
    disp1 = disp4 = None
    try:
        qps4, disp4 = run_f32(N4, "4M")
    except Exception:
        log("4M section failed:\n" + traceback.format_exc())
        qps4 = None
    drain()
    try:
        qps1, disp1 = run_f32(N1, "1M")
    except Exception:
        log("1M section failed:\n" + traceback.format_exc())
        qps1 = None
    drain()
    try:
        cpu_qps, cores = cpu_proxy_qps()
    except Exception:
        log("cpu proxy failed:\n" + traceback.format_exc())
        cpu_qps, cores = None, 1
    if qps10 is None and qps1 is None and qps4 is None:
        return {
            "metric": "filtered_cosine_exact_top10_qps",
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
            "extras": {"error": "all sections failed; see stderr"},
        }
    if qps10 is None:
        # degraded headline: the largest f32 config that ran
        dq, dn, dl = (qps1, N1, "1M") if qps1 is not None else (qps4, N4, "4M")
        vs = (
            0.0
            if cpu_qps is None
            else round(dq / (cpu_qps * N10 / dn / cores * 32), 1)
        )
        result = {
            "metric": f"filtered_cosine_exact_top10_qps_{dl}x768",
            "value": round(dq, 1),
            "unit": "qps",
            "vs_baseline": vs,
            "extras": {"degraded": "10M section failed; see stderr"},
        }
        return result

    # conservative baseline: extrapolate the measured per-core proxy to a
    # 32-core reference box
    ref_cores = 32
    if cpu_qps is None:
        cpu_qps = float("nan")
    cpu_32core = cpu_qps / cores * ref_cores
    qps512 = r10.get("qps512")
    qps_unf = r10.get("qps_unf")
    qps_str = r10.get("qps_str")
    rec_unf = r10.get("rec_unf")
    qps_scan = r10.get("qps_scan")
    result = {
        "metric": "filtered_cosine_rerank_top10_qps_10Mx768",
        "value": round(qps10, 1),
        "unit": "qps",
        "vs_baseline": round(qps10 / cpu_32core, 1),
        "extras": {
            "recall_at_10_after_rerank": round(rec, 4),
            # int8 exactness certificate on the headline path: True means
            # recall 1.0 BY CONSTRUCTION (round-4 verdict item 1)
            "certified": r10.get("certified"),
            "cert_scan_k_wide": r10.get("cert_kwide"),
            "recall_at_10_unfiltered": (
                None if rec_unf is None else round(rec_unf, 4)
            ),
            "qps_10M_unfiltered": (
                None if qps_unf is None else round(qps_unf, 1)
            ),
            "qps_10M_string_eq": (
                None if qps_str is None else round(qps_str, 1)
            ),
            "qps_10M_scan_only_k100": (
                None if qps_scan is None else round(qps_scan, 1)
            ),
            "qps_10M_filtered_uncertified": (
                None
                if r10.get("qps_uncert") is None
                else round(r10["qps_uncert"], 1)
            ),
            "build_10m_with_strings_s": round(build_s, 1),
            "data_synthesis_10m_s": round(synth_s, 1),
            # first query of the MAIN process. With the cold probe's
            # executables promoted into the shared AOT cache this is the
            # restart experience (deserialize, ~1 s); the once-per-code-
            # version compile cost is cold_compile_s.
            "warmup_first_query_s": round(warm, 2),
            "warm_restart_first_query_s": warm_restart.get(
                "warm_restart_first_query_s"
            ),
            "warm_restart_build_s": warm_restart.get("warm_restart_build_s"),
            "warm_restart_synth_s": warm_restart.get("warm_restart_synth_s"),
            "aot_blobs_promoted": cold.get("aot_blobs_promoted"),
            "cold_compile_s": cold.get("cold_first_query_s"),
            "cold_build_s": cold.get("cold_build_s"),
            "qps_10Mx768_B512": None if qps512 is None else round(qps512, 1),
            "qps_4Mx768_f32_exact": None if qps4 is None else round(qps4, 1),
            "qps_1Mx768_f32_exact": None if qps1 is None else round(qps1, 1),
            # median/min/max over >= 5 trials per config (round-4 item 8)
            "dispersion": {
                **(r10.get("dispersion") or {}),
                **({"4M_f32": disp4} if disp4 else {}),
                **({"1M_f32": disp1} if disp1 else {}),
            },
            "cpu_proxy_qps_measured": round(cpu_qps, 2),
            "cpu_proxy_cores": cores,
            "vs_baseline_per_core": round(qps10 / (cpu_qps / cores), 1),
            "baseline_assumed_cores": ref_cores,
        },
    }
    return result


def _supervise() -> None:
    """Run the real bench in a CHILD process under a hard timeout, retrying
    once in a fresh interpreter. This covers BOTH failure modes seen on the
    tunnel: transient errors (stale device state clears when the process
    exits) and outright hangs (a process stuck on a tunnel RPC with zero
    CPU, observed after an earlier process was killed mid-use) — a hang
    would otherwise silently eat the whole benchmarking budget."""
    import subprocess

    timeout_s = int(os.environ.get("OTTERS_BENCH_TIMEOUT_S", "5400"))

    # fast backend pre-probe: a dead tunnel hangs jax.devices() with zero
    # CPU, and paying 2 x timeout_s to discover that wastes hours of the
    # benchmarking budget. Probe in a throwaway child first (honoring an
    # explicit JAX_PLATFORMS the same way _configure_jax does).
    probe_s = int(os.environ.get("OTTERS_BENCH_PROBE_TIMEOUT_S", "240"))
    probe_src = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "p and jax.config.update('jax_platforms', p)\n"
        "print(len(jax.devices()))\n"
    )
    for probe_try in (1, 2):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_s, stdout=subprocess.DEVNULL, check=True,
            )
            break
        except Exception as e:
            log(f"backend probe {probe_try} failed ({type(e).__name__})")
            if probe_try == 2:
                print(json.dumps({
                    "metric": "filtered_cosine_rerank_top10_qps_10Mx768",
                    "value": 0.0,
                    "unit": "qps",
                    "vs_baseline": 0.0,
                    "extras": {
                        "error": "backend unreachable: jax.devices() hung "
                        f"or failed twice within {probe_s}s (dead tunnel?)",
                        "note": "device relay outage — the standing "
                        "hardware numbers are BENCH_r03.json / "
                        "BENCH_r03_local.json; see ROUND4.md 'tunnel "
                        "outage' for the full-flow CPU smoke evidence",
                    },
                }))
                return

    last_lines: list = []
    for attempt in (1, 2):
        env = dict(os.environ, OTTERS_BENCH_CHILD="1")
        if attempt == 2:
            env["OTTERS_BENCH_NO_COLD"] = "1"  # don't re-pay the cold probe
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            log(f"bench attempt {attempt} hit the {timeout_s}s watchdog")
            continue
        lines = [
            ln for ln in proc.stdout.decode().strip().splitlines() if ln
        ]
        if lines:
            last_lines = lines
            try:
                extras = json.loads(lines[-1]).get("extras", {})
                healthy = "error" not in extras and "degraded" not in extras
            except Exception:
                healthy = False
            if proc.returncode == 0 and (healthy or attempt == 2):
                print(lines[-1])
                return
            log(f"bench attempt {attempt} unhealthy; retrying fresh")
        else:
            log(f"bench attempt {attempt} produced no output")
    if last_lines:
        print(last_lines[-1])
    else:
        print(json.dumps({
            "metric": "filtered_cosine_rerank_top10_qps_10Mx768",
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
            "extras": {"error": "both bench attempts hung or died"},
        }))


if __name__ == "__main__":
    if "--cold-probe" in sys.argv:
        cold_probe()
        sys.exit(0)
    if "--warm-restart-probe" in sys.argv:
        warm_restart_probe()
        sys.exit(0)
    if os.environ.get("OTTERS_BENCH_CHILD") or os.environ.get(
        "OTTERS_BENCH_RETRY"
    ):
        print(json.dumps(main()))
        sys.exit(0)
    _supervise()
