"""Experiment: native int8 MXU matmul in the Pallas kernel.

v5e rates int8 at 2x bf16 throughput. The int8 storage path currently
upcasts to f32 and runs the MXU at DEFAULT (bf16) — exact but half the
potential rate. Probe whether Mosaic lowers an int8 x int8 -> int32
dot_general, and how it times against the bf16 path at 1M x 768 x 256q.
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel_i8(q_ref, v_ref, out_ref):
    q = q_ref[:]  # [B, D] int8
    v = v_ref[:]  # [T, D] int8
    dots = jax.lax.dot_general(
        q, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] = dots


def kernel_bf16(q_ref, v_ref, out_ref):
    q = q_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    dots = jax.lax.dot_general(
        q, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out_ref[:] = dots


def run(kind, B, T, D, n_tiles, reps=30):
    rng = np.random.default_rng(0)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (n_tiles * T, D)), jnp.int8)
    kern = kernel_i8 if kind == "i8" else kernel_bf16
    out_dtype = jnp.int32 if kind == "i8" else jnp.float32

    @jax.jit
    def f(q, v):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((B, D), lambda g: (0, 0)),
                pl.BlockSpec((T, D), lambda g: (g, 0)),
            ],
            out_specs=pl.BlockSpec((B, T), lambda g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T), out_dtype),
        )(q, v)

    t0 = time.perf_counter()
    out = jax.device_get(f(q8, v8))
    log(f"{kind}: compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(q8, v8)
    jax.device_get(r)
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * B * D * T * n_tiles
    log(f"{kind}: {dt*1e3:.2f}ms -> {flops/dt/1e12:.1f} T(fl)ops/s")
    # exactness vs int32 numpy
    want = np.asarray(q8, np.int32) @ np.asarray(v8[:T], np.int32).T
    got = np.asarray(out)
    err = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
    log(f"{kind}: max int err vs numpy = {err}")
    return dt


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except Exception:
        pass
    B, T, D, n_tiles = 256, 1024, 768, 512
    try:
        dt8 = run("i8", B, T, D, n_tiles)
    except Exception as e:
        log(f"i8 kernel FAILED: {type(e).__name__}: {e}")
        dt8 = None
    dtb = run("bf16", B, T, D, n_tiles)
    if dt8:
        log(f"int8 speedup over bf16: {dtb/dt8:.2f}x")
    log("DONE4")


if __name__ == "__main__":
    main()
