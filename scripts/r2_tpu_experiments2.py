"""Round-2 TPU experiments, batch 2: validate kernel perf fixes.

a. f32 b=256 @ 1M x 768 pruned50 (qaux layout revert — expect ~6.8ms again)
b. fast-exact b=256 (expect < strict)
c. b=1 @ 1M x 768: pruned50 vs unpruned vs xla (expect >=2x prune payoff)
d. int8 b=256 unfiltered (expect <= 6.6ms)
e. serialize_executable on a program CONTAINING a pallas_call kernel
f. exactness spot-checks vs numpy at 1M scale (hardware, not interpret)
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


def timeit(fn, reps=20):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring
    from otters_tpu.types import Cmp, Metric

    rng = np.random.default_rng(0)
    N, D = 1_000_000, 768
    V = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
    dv = scoring.materialize_from_device(V)
    del V
    n_pad = dv.vectors.shape[0]
    q256 = jnp.asarray(rng.normal(size=(256, D)).astype(np.float32))
    q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))

    def half_setup(b):
        t = pk.choose_tile(D, n_pad, pk._pad_b(b))
        n_t = n_pad // t
        alive = jnp.asarray(np.arange(n_t) % 2 == 0)
        rm = np.zeros(n_pad, dtype=bool)
        for ti in range(0, n_t, 2):
            rm[ti * t:(ti + 1) * t] = True
        return t, n_t, alive, jnp.asarray(rm)

    # ---- a/b: b=256 f32 ----
    t256, nt256, alive256, rm256 = half_setup(256)
    log(f"b=256: t={t256} n_tiles={nt256}")

    def run256(fast=False):
        return pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            q256, rm256, jnp.float32(-1.0), alive256,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt, fast=fast)

    t0 = time.perf_counter()
    fetch(run256())
    log(f"a compile: {time.perf_counter()-t0:.1f}s")
    dt = timeit(run256, 10)
    log(f"a f32 b=256 pruned50: {dt*1e3:.2f}ms ({256/dt:.0f} q/s) "
        f"[was 10.79 regressed / 6.8 round-1]")
    t0 = time.perf_counter()
    out = fetch(run256(fast=True))
    log(f"b fast compile: {time.perf_counter()-t0:.1f}s check={out[3]}")
    dtf = timeit(lambda: run256(fast=True), 10)
    log(f"b fast-exact b=256 pruned50: {dtf*1e3:.2f}ms [was 15.99]")

    # unpruned b=256 for the ratio
    alive_all256 = jnp.ones(nt256, dtype=bool)

    def run256_all():
        return pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            q256, None, jnp.float32(-1.0), alive_all256,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt)

    dtu = timeit(run256_all, 10)
    log(f"a2 f32 b=256 unpruned: {dtu*1e3:.2f}ms -> prune payoff {dtu/dt:.2f}x")

    # ---- c: b=1 ----
    t1, nt1, alive1, rm1 = half_setup(1)
    log(f"b=1: t={t1} n_tiles={nt1}")

    def run1(alive, rm):
        return pk.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            q1, rm, jnp.float32(-1.0), alive,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt)

    alive_all1 = jnp.ones(nt1, dtype=bool)
    t0 = time.perf_counter()
    fetch(run1(alive_all1, None))
    log(f"c compile: {time.perf_counter()-t0:.1f}s")
    dt_un = timeit(lambda: run1(alive_all1, None), 20)
    dt_pr = timeit(lambda: run1(alive1, rm1), 20)
    log(f"c b=1 1Mx768: unpruned {dt_un*1e3:.2f}ms pruned50 {dt_pr*1e3:.2f}ms "
        f"-> payoff {dt_un/dt_pr:.2f}x [was 6.89/4.61 = 1.49x]")
    # 90% pruning for the steep case
    alive90 = jnp.asarray(np.arange(nt1) % 10 == 0)
    rm90 = np.zeros(n_pad, dtype=bool)
    for ti in range(0, nt1, 10):
        rm90[ti * t1:(ti + 1) * t1] = True
    dt_90 = timeit(lambda: run1(alive90, jnp.asarray(rm90)), 20)
    log(f"c b=1 pruned90: {dt_90*1e3:.2f}ms -> {dt_un/dt_90:.2f}x")

    # exactness on hardware (pruned50, b=1)
    rows, scores, ok, _ = fetch(run1(alive1, rm1))
    Vh = np.asarray(dv.vectors[:N])
    qi = 1 / np.linalg.norm(np.asarray(q1), axis=1)
    vi = np.asarray(dv.inv_norms[:N])
    s = (np.asarray(q1) @ Vh.T) * qi[:, None] * vi[None, :]
    rm_h = np.asarray(rm1)[:N]
    s[:, ~rm_h] = -np.inf
    want = np.sort(s.reshape(-1))[::-1][:10]
    err = np.abs(np.sort(scores)[::-1] - want).max()
    log(f"f exactness b=1 pruned on hw: max_err={err:.2e} ok={ok.all()}")
    assert err < 1e-5

    # ---- d: int8 ----
    V8src = jax.random.normal(jax.random.PRNGKey(1), (n_pad, D), jnp.float32)
    dv8 = scoring.materialize_from_device(V8src, n_valid=N, dtype=jnp.int8)
    del V8src
    t8 = pk.choose_tile(D, n_pad, pk._pad_b(256))
    alive8 = jnp.ones(n_pad // t8, dtype=bool)

    def run8():
        return pk.pallas_topk(
            dv8.vectors, dv8.norms_sq, dv8.inv_norms, dv8.valid,
            q256, None, jnp.float32(0.0), alive8,
            metric=Metric.Cosine, k=10, take_min=False, cmp=None)

    t0 = time.perf_counter()
    fetch(run8())
    log(f"d compile: {time.perf_counter()-t0:.1f}s")
    dt8 = timeit(run8, 10)
    log(f"d int8 b=256 unfiltered: {dt8*1e3:.2f}ms ({256/dt8:.0f} q/s) [was 6.63]")

    # ---- e: serialize a pallas-containing executable ----
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize,
        )

        lowered = jax.jit(
            lambda a, b, c, d_, q, rm, th, al: pk.pallas_topk(
                a, b, c, d_, q, rm, th, al,
                metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt),
        ).lower(dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q256, rm256,
                jnp.float32(-1.0), alive256)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        log(f"e compile for AOT: {time.perf_counter()-t0:.1f}s")
        blob, in_tree, out_tree = serialize(compiled)
        log(f"e serialize: {len(blob)/1e6:.2f} MB")
        t0 = time.perf_counter()
        c2 = deserialize_and_load(blob, in_tree, out_tree)
        out2 = fetch(c2(dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
                        q256, rm256, jnp.float32(-1.0), alive256))
        log(f"e deserialize+run: {time.perf_counter()-t0:.2f}s "
            f"ok={np.asarray(out2[2]).all()}")
    except Exception as e:
        log(f"e serialize pallas FAILED: {type(e).__name__}: {e}")

    log("DONE2")


if __name__ == "__main__":
    main()
