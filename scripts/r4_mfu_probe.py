"""Round-4 MFU probes at the 10M x 768 north star (real TPU only).

Answers, in order (VERDICT round-3 item 2 says *check the wall first*):

  P0  int8 MXU rate, Mosaic vs plain XLA: round-2 probes measured Mosaic
      int8 dots at the bf16 rate (~197 TOPS on v5e), not the 2x int8 mode.
      If a plain-XLA `lax.dot_general(int8, int8) -> int32` hits 2x, the
      unfiltered scan has a different ceiling than we think.
  P1  where the unfiltered 10M batch=256 time goes: phase-1-only (k-free
      bin maxima) vs full kernel at k'=100 vs k'=400 (the certificate's
      steady-state width) vs k'=1024.
  P2  tile-size sweep at b=256 within the VMEM formula.
  P3  end-to-end qps with certification on vs off (collect_async+resolve
      pipeline, 16 batches), on synthetic gaussian data.

Timing discipline: the axon tunnel makes block_until_ready a no-op — every
measurement uses N dependent iterations (host-chained jit calls; fori_loop
around a big matmul hangs the axon remote compiler) + ONE value fetch
(see scripts/README.md).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

D = 768
B = 256


def timed_loop(fn, state, consts=(), iters=8, label=""):
    """N dependent applications of fn + one scalar fetch -> seconds/iter.

    Dependent chaining is done on the HOST (each jitted call consumes the
    previous call's output) rather than with ``lax.fori_loop``: on the axon
    backend, compiling a fori_loop whose body holds a 1M-row matmul hangs
    the remote compiler indefinitely (reproduced 2026-08-19; plain jit of
    the same body compiles in ~1 s). Dispatch is async, so the chain still
    serializes on the device and ONE final fetch bounds the wall time.

    ``consts`` is a pytree of device arrays passed as a jit ARGUMENT:
    closing over multi-GB jax Arrays bakes them into the lowered module as
    constants, and shipping a 7.7 GB module hangs the axon remote compiler
    (reproduced 2026-08-19 on P1; same root cause as the P0 hang).
    """

    step = jax.jit(fn)
    out = step(state, consts)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = state
    for _ in range(iters):
        out = step(out, consts)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label}: {dt * 1e3:.2f} ms/iter")
    return dt


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(np.asarray(leaf.reshape(-1)[0]))


def p0_int8_rate():
    print("P0: int8 MXU rate, Mosaic (via existing kernel) vs plain XLA")
    n = 1 << 20
    key = jax.random.PRNGKey(0)
    v8 = jax.random.randint(key, (n, D), -127, 128, dtype=jnp.int8)
    q8 = jax.random.randint(key, (B, D), -127, 128, dtype=jnp.int8)

    def xla_dot(c, consts):
        q8, v8 = consts
        s = lax.dot_general(
            q8, v8,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jnp.max(s, axis=1).astype(jnp.int32) + c

    dt = timed_loop(
        xla_dot, jnp.zeros((B,), jnp.int32), (q8, v8), label="XLA int8 dot 1M"
    )
    tops = 2 * n * D * B / dt / 1e12
    print(f"  -> {tops:.1f} TOPS (v5e bf16 peak ~197, int8 2x mode ~394)")

    def xla_bf16(c, consts):
        q8, v8 = consts
        s = lax.dot_general(
            q8.astype(jnp.bfloat16), v8.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s, axis=1) + c

    dtb = timed_loop(
        xla_bf16, jnp.zeros((B,), jnp.float32), (q8, v8), label="XLA bf16 dot 1M"
    )
    print(f"  -> bf16 {2 * n * D * B / dtb / 1e12:.1f} TOPS "
          f"(int8/bf16 speed ratio {dtb / dt:.2f}x)")


def _build_10m_int8():
    from otters_tpu.ops import scoring

    n = 10_000_000

    def slab(start, rows):
        k = jax.random.fold_in(jax.random.PRNGKey(7), start)
        return jax.random.normal(k, (rows, D), jnp.float32)

    t0 = time.perf_counter()
    dv = scoring.materialize_int8_slabs(slab, n, D, 1 << 20)
    float(np.asarray(dv.norms_sq[123]))
    print(f"  built 10M int8 in {time.perf_counter() - t0:.1f}s")
    return dv, n


def p1_phase_split(dv, n):
    from otters_tpu.ops import pallas_topk as pk

    print("P1: unfiltered scan cost vs k' (b=256)")
    n_pad = dv.vectors.shape[0]
    qk = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32)
    t = pk.choose_tile(D, n_pad, pk._pad_b(B))
    alive = jnp.ones(n_pad // t, dtype=jnp.bool_)
    consts = (dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, qk, alive)
    for k in (10, 100, 400, 1024):
        def step(c, consts, k=k):
            vecs, nsq, inv, valid, qk, alive = consts
            rows, scores, ok, check, bound = pk.pallas_topk(
                vecs, nsq, inv, valid,
                qk + c * 0, None, jnp.float32(0.0), alive,
                metric=__import__("otters_tpu.types", fromlist=["Metric"]).Metric.Cosine,
                k=k, take_min=False, cmp=None, prec="default",
            )
            return c + scores[0]

        dt = timed_loop(step, jnp.float32(0.0), consts, iters=4, label=f"k'={k}")
        print(f"    -> {B / dt:.0f} q/s, "
              f"{2 * n * D * B / dt / 1e12:.0f} TOPS-equivalent")


def p1b_xla_vs_pallas(dv, n):
    """If Mosaic runs int8 dots at the bf16 rate while XLA engages the 2x
    int8 MXU mode (P0 decides), the XLA scan path could beat the fused
    kernel on UNFILTERED scans (where tile-skipping buys nothing)."""
    import os

    from otters_tpu.ops import scoring
    from otters_tpu.types import Metric

    print("P1b: XLA scan path vs pallas, 10M unfiltered b=256 k'=100")
    qk = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (B, D), jnp.float32)
    )
    os.environ["OTTERS_DISABLE_PALLAS"] = "1"
    try:
        rows, scores, ok = scoring.run_vec_topk(
            dv, qk, Metric.Cosine, 100, False, None, None
        )  # warm
        t0 = time.perf_counter()
        for _ in range(4):
            rows, scores, ok = scoring.run_vec_topk(
                dv, qk, Metric.Cosine, 100, False, None, None
            )
        dt = (time.perf_counter() - t0) / 4
        print(f"  XLA path: {dt * 1e3:.2f} ms/iter -> {B / dt:.0f} q/s, "
              f"{2 * n * D * B / dt / 1e12:.0f} TOPS-equivalent")
    finally:
        del os.environ["OTTERS_DISABLE_PALLAS"]


def p2_tile_sweep(dv, n):
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.types import Metric

    print("P2: tile sweep at b=256, k'=100")
    n_pad = dv.vectors.shape[0]
    qk = jax.random.normal(jax.random.PRNGKey(4), (B, D), jnp.float32)
    b_pad = pk._pad_b(B)
    print(f"  choose_tile picks {pk.choose_tile(D, n_pad, b_pad)}")
    # the kernel derives the tile from tile_alive's length (n_pad // len);
    # sweep by handing it alive arrays of different lengths
    for t in (512, 1024, 1536, 2048, 3072, 4096):
        if n_pad % t or t % pk.BIN:
            continue
        vmem = b_pad * D * 4 + 2 * t * D * 4 + 3 * t * b_pad * 4
        if vmem > 13 * (1 << 20):
            print(f"  tile {t}: skipped (VMEM {vmem >> 20} MiB)")
            continue
        alive = jnp.ones(n_pad // t, dtype=jnp.bool_)
        consts = (dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, qk, alive)

        def step(c, consts):
            vecs, nsq, inv, valid, qk, alive = consts
            rows, scores, ok, check, bound = pk.pallas_topk(
                vecs, nsq, inv, valid,
                qk + c * 0, None, jnp.float32(0.0), alive,
                metric=Metric.Cosine, k=100, take_min=False, cmp=None,
                prec="default",
            )
            return c + scores[0]

        try:
            dt = timed_loop(step, jnp.float32(0.0), consts, iters=4, label=f"tile={t}")
            print(f"    -> {B / dt:.0f} q/s")
        except Exception as e:
            print(f"  tile {t}: failed ({type(e).__name__}: {e})")


def p3_cert_end_to_end():
    from otters_tpu import Column, DataType, Metric, MetaStore
    from otters_tpu.meta import resolve
    from otters_tpu.ops import scoring

    print("P3: end-to-end certified vs uncertified (2M rows, b=256)")
    n = 2_000_000

    def slab(start, rows):
        k = jax.random.fold_in(jax.random.PRNGKey(9), start)
        return jax.random.normal(k, (rows, D), jnp.float32)

    dv = scoring.materialize_int8_slabs(slab, n, D, 1 << 20)
    host = np.concatenate(
        [np.asarray(slab(s, min(1 << 20, n - s)), np.float32)
         for s in range(0, n, 1 << 20)]
    )[:n]
    ids = Column("id", DataType.Int64).from_values(list(range(n)))
    store = (
        MetaStore.from_columns([ids])
        .with_vectors(dv, n_rows=n)
        .with_chunk_size(2048)
        .with_rerank_source(fetch_vectors=lambda i: host[np.asarray(i)])
        .build()
    )
    qs = [jax.random.normal(jax.random.PRNGKey(100 + i), (B, D), jnp.float32)
          for i in range(16)]
    import os

    for certify in (False, None):
        def dispatch(i):
            return (
                store.query_batch(qs[i % 16], Metric.Cosine)
                .take(10, rerank_from=100, certify=certify)
                .collect_async()
            )

        r = dispatch(0).result()
        st = store.last_query_stats()
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            resolve([dispatch(i) for i in range(16)])
            best = max(best, 16 * B / (time.perf_counter() - t0))
        print(f"  certify={certify}: {best:.0f} q/s "
              f"(certified={st.certified}, width={st.scan_k_wide})")

    # P3b: resolve-unit chunking sweep — a positive OTTERS_RESOLVE_GROUP_MAX
    # overlaps each unit's host-side rerank prep (union gather + h2d) with
    # the device scans still running for later units
    print("P3b: OTTERS_RESOLVE_GROUP_MAX sweep (certify=None)")
    for gmax in ("0", "2", "4", "8"):
        os.environ["OTTERS_RESOLVE_GROUP_MAX"] = gmax
        try:
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                resolve([
                    store.query_batch(qs[i % 16], Metric.Cosine)
                    .take(10, rerank_from=100)
                    .collect_async()
                    for i in range(16)
                ])
                best = max(best, 16 * B / (time.perf_counter() - t0))
            print(f"  gmax={gmax}: {best:.0f} q/s")
        finally:
            del os.environ["OTTERS_RESOLVE_GROUP_MAX"]


if __name__ == "__main__":
    # Sections are argv-selectable so a flaky axon tunnel (or one probe
    # hanging the remote compiler, as P0's int8 dot_general did on
    # 2026-08-19) can be retried/skipped per-section under its own
    # `timeout` instead of sinking the whole batch.
    import sys

    want = set(sys.argv[1:]) or {"p0", "p1", "p1b", "p2", "p3"}
    print("platform:", jax.devices()[0].platform)
    if "p0" in want:
        p0_int8_rate()
    if want & {"p1", "p1b", "p2"}:
        dv, n = _build_10m_int8()
        if "p1" in want:
            p1_phase_split(dv, n)
        if "p1b" in want:
            p1b_xla_vs_pallas(dv, n)
        if "p2" in want:
            p2_tile_sweep(dv, n)
        del dv
    if "p3" in want:
        p3_cert_end_to_end()
