"""Experiment: row-tile size sweep for the fused kernel at the 10M north star.

choose_tile caps T at 1024 for d=768/b=256 (3 MiB vector-tile budget). At
10M rows that is ~9.8k grid steps (~4.9k live at 50% pruning); if fixed
per-step cost is ~1µs the overhead is ~40% of the batch. Sweep T by scaling
the budgets and time the production pallas_topk (int8 storage, alternating
tile_alive at chunk granularity) per 256-query batch.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 10_000_000
D = 768
B = 256
K = 100
CHUNK = 1024


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from otters_tpu.ops import pallas_topk as pk
    from otters_tpu.ops import scoring
    from otters_tpu.types import Cmp, Metric

    def _rows(start, rows):
        base = jax.random.PRNGKey(42)
        idx = jnp.uint32(start) + jnp.arange(rows, dtype=jnp.uint32)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(idx)
        return jax.vmap(lambda k: jax.random.normal(k, (D,), jnp.float32))(keys)

    rows_jit = jax.jit(_rows, static_argnums=(1,))
    t0 = time.perf_counter()
    dv = scoring.materialize_int8_slabs(rows_jit, N, D, 1_000_000)
    jax.block_until_ready(dv)
    log(f"ingest: {time.perf_counter()-t0:.1f}s")
    n_pad = dv.vectors.shape[0]

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    rmask_np = np.zeros(n_pad, dtype=bool)
    # odd chunks alive (the bench's 50% pattern)
    for c in range(1, n_pad // CHUNK, 2):
        rmask_np[c * CHUNK : (c + 1) * CHUNK] = True
    rmask = jnp.asarray(rmask_np)

    orig_choose = pk.choose_tile

    def run_with_T(mult):
        def patched(d, n_pad_=0, b_pad=pk.LANE):
            t = orig_choose(d, 0, b_pad) * mult
            if n_pad_:
                while t > pk.BIN and n_pad_ % t != 0:
                    t -= pk.BIN
            return t

        pk.choose_tile = patched
        try:
            t_rows = patched(D, n_pad, pk._pad_b(B))
            n_tiles = n_pad // t_rows
            alive_np = np.zeros(n_tiles, dtype=bool)
            rr = rmask_np.reshape(n_tiles, t_rows)
            alive_np = rr.any(axis=1)
            alive = jnp.asarray(alive_np)
            log(f"T={t_rows}: {n_tiles} tiles, {int(alive_np.sum())} alive")

            def f():
                return pk.pallas_topk(
                    dv.vectors, dv.norms_sq, dv.inv_norms, dv.valid,
                    q, rmask, jnp.float32(-2.0), alive,
                    metric=Metric.Cosine, k=K, take_min=False, cmp=Cmp.Gt,
                    fast=False,
                )

            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            log(f"T={t_rows}: compile+run {time.perf_counter()-t0:.1f}s")
            # pipelined timing like the bench
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [f() for _ in range(8)]
                jax.block_until_ready(outs)
                dt = (time.perf_counter() - t0) / 8
                best = dt if best is None else min(best, dt)
            log(f"T={t_rows}: {best*1e3:.2f} ms/batch -> {B/best:.0f} q/s, "
                f"eff-TFLOPs {N*0.5*D*2*B/best/1e12:.1f}")
            return out
        finally:
            pk.choose_tile = orig_choose

    ref = None
    for mult in (1, 2, 4):
        try:
            out = run_with_T(mult)
            got = np.asarray(out[0])
            if ref is None:
                ref = got
            else:
                same = np.array_equal(np.sort(ref), np.sort(got))
                log(f"  rows match T-base: {same}")
        except Exception as e:
            log(f"mult={mult} FAILED: {type(e).__name__}: {str(e)[:200]}")
    log("DONE tile sweep")


if __name__ == "__main__":
    main()
