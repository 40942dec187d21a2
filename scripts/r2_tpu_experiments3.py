"""Round-2 TPU experiments, batch 3.

A/B the round-1 kernel (git b139e6a, at /tmp/pallas_topk_r1.py) against the
current one at b=256 (strict + fast), re-run b=1 after the gather fix, and
probe serialize_executable on a pallas-containing program.
"""

import importlib.util
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


def load_r1():
    spec = importlib.util.spec_from_file_location(
        "pallas_topk_r1", "/tmp/pallas_topk_r1.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["pallas_topk_r1"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring
    from otters_tpu.types import Cmp, Metric

    pk_r1 = load_r1()

    rng = np.random.default_rng(0)
    N, D = 1_000_000, 768
    V = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
    dv = scoring.materialize_from_device(V)
    del V
    n_pad = dv.vectors.shape[0]
    q256 = jnp.asarray(rng.normal(size=(256, D)).astype(np.float32))
    q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))

    def half_setup(mod, b):
        if hasattr(mod, "_pad_b"):
            t = mod.choose_tile(D, n_pad, mod._pad_b(b))
        else:
            t = mod.choose_tile(D, n_pad, mod._round_up(b, mod.LANE))
        n_t = n_pad // t
        alive = jnp.asarray(np.arange(n_t) % 2 == 0)
        rm = np.zeros(n_pad, dtype=bool)
        for ti in range(0, n_t, 2):
            rm[ti * t:(ti + 1) * t] = True
        return t, n_t, alive, jnp.asarray(rm)

    def runner(mod, q, alive, rm, fast=False):
        return lambda: mod.pallas_topk(
            dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
            q, rm, jnp.float32(-1.0), alive,
            metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt, fast=fast)

    # ---- A/B at b=256 ----
    for name, mod in (("r1", pk_r1), ("r2", pk)):
        t, n_t, alive, rm = half_setup(mod, 256)
        log(f"{name} b=256: t={t} n_tiles={n_t}")
        for fast in (False, True):
            fn = runner(mod, q256, alive, rm, fast)
            t0 = time.perf_counter()
            out = fetch(fn())
            c = time.perf_counter() - t0
            dt = timeit(fn, 10)
            log(f"{name} b=256 fast={fast}: {dt*1e3:.2f}ms "
                f"(compile {c:.1f}s, check={out[3]})")

    # ---- b=1 current kernel after gather fix ----
    t1, nt1, alive1, rm1 = half_setup(pk, 1)
    log(f"r2 b=1: t={t1} n_tiles={nt1}")
    alive_all = jnp.ones(nt1, dtype=bool)
    fn_un = runner(pk, q1, alive_all, None)
    fn_pr = runner(pk, q1, alive1, rm1)
    t0 = time.perf_counter()
    rows, scores, ok, _ = fetch(fn_pr())
    log(f"r2 b=1 compile: {time.perf_counter()-t0:.1f}s")
    dt_un = timeit(fn_un, 20)
    dt_pr = timeit(fn_pr, 20)
    log(f"r2 b=1: unpruned {dt_un*1e3:.2f}ms pruned50 {dt_pr*1e3:.2f}ms "
        f"payoff {dt_un/dt_pr:.2f}x [batch1: 6.89/4.61]")
    alive90 = jnp.asarray(np.arange(nt1) % 10 == 0)
    rm90 = np.zeros(n_pad, dtype=bool)
    for ti in range(0, nt1, 10):
        rm90[ti * t1:(ti + 1) * t1] = True
    dt_90 = timeit(runner(pk, q1, alive90, jnp.asarray(rm90)), 20)
    log(f"r2 b=1 pruned90: {dt_90*1e3:.2f}ms payoff {dt_un/dt_90:.2f}x")

    # hardware exactness for pruned b=1
    Vh = np.asarray(dv.vectors[:N])
    qi = 1 / np.linalg.norm(np.asarray(q1), axis=1)
    vi = np.asarray(dv.inv_norms[:N])
    s = (np.asarray(q1) @ Vh.T) * qi[:, None] * vi[None, :]
    s[:, ~np.asarray(rm1)[:N]] = -np.inf
    want = np.sort(s.reshape(-1))[::-1][:10]
    err = np.abs(np.sort(np.asarray(scores))[::-1] - want).max()
    log(f"r2 b=1 pruned exactness: max_err={err:.2e} ok={np.asarray(ok).all()}")
    assert err < 1e-5

    # ---- serialize a pallas-containing executable ----
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize,
        )

        t256, _, alive256, rm256 = half_setup(pk, 256)
        lowered = jax.jit(
            lambda a, b, c, d_, q, rm, th, al: pk.pallas_topk(
                a, b, c, d_, q, rm, th, al,
                metric=Metric.Cosine, k=10, take_min=False, cmp=Cmp.Gt),
        ).lower(dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid, q256, rm256,
                jnp.float32(-1.0), alive256)
        compiled = lowered.compile()
        blob, in_tree, out_tree = serialize(compiled)
        log(f"serialize pallas exe: {len(blob)/1e6:.2f} MB")
        t0 = time.perf_counter()
        c2 = deserialize_and_load(blob, in_tree, out_tree)
        out2 = fetch(c2(dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
                        q256, rm256, jnp.float32(-1.0), alive256))
        log(f"deserialize+run: {time.perf_counter()-t0:.2f}s "
            f"ok={np.asarray(out2[2]).all()}")
    except Exception as e:
        log(f"serialize pallas FAILED: {type(e).__name__}: {e}")

    log("DONE3")


if __name__ == "__main__":
    main()
