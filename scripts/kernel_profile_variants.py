import time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD, D, B = 1007616, 768, 256
V = jax.random.normal(jax.random.PRNGKey(0), (N_PAD, D), dtype=jnp.float32)
Q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.float32)
VH = V.astype(jnp.bfloat16)
VL = (V - VH.astype(jnp.float32)).astype(jnp.bfloat16)

def k_mm(q_ref, v_ref, out_ref):
    dots = jax.lax.dot_general(q_ref[:], v_ref[:], (((1,),(1,)),((),())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = dots[:, :2]

def k_mm_bins(nb):
    def k(q_ref, v_ref, out_ref):
        dots = jax.lax.dot_general(q_ref[:], v_ref[:], (((1,),(1,)),((),())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        for j in range(nb):
            out_ref[0, :, j] = jnp.max(dots[:, j*512:(j+1)*512], axis=1)
    return k

def k_planes(nb):
    def k(q_ref, vh_ref, vl_ref, out_ref):
        dn = (((1,),(1,)),((),()))
        q = q_ref[:]
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        dots = (jax.lax.dot_general(qh, vh_ref[:], dn, preferred_element_type=jnp.float32)
              + jax.lax.dot_general(qh, vl_ref[:], dn, preferred_element_type=jnp.float32)
              + jax.lax.dot_general(ql, vh_ref[:], dn, preferred_element_type=jnp.float32))
        for j in range(nb):
            out_ref[0, :, j] = jnp.max(dots[:, j*512:(j+1)*512], axis=1)
    return k

def run(kern, t, out_tail, label, n_v_inputs=1):
    nt = N_PAD // t
    vspecs = [pl.BlockSpec((t, D), lambda g: (g,0), memory_space=pltpu.VMEM)] * n_v_inputs
    f = pl.pallas_call(kern,
        grid=(nt,),
        in_specs=[pl.BlockSpec((B, D), lambda g: (0,0), memory_space=pltpu.VMEM)] + vspecs,
        out_specs=pl.BlockSpec((1,)+out_tail, lambda g: (g,)+(0,)*len(out_tail), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt,)+out_tail, jnp.float32))
    if n_v_inputs == 1:
        gi = jax.jit(lambda q, v: f(q, v).max())
        g = lambda q: gi(q, V)
    else:
        gi = jax.jit(lambda q, vh, vl: f(q, vh, vl).max())
        g = lambda q: gi(q, VH, VL)
    t0 = time.perf_counter()
    jax.device_get(g(Q))
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter()
    outs=[g(Q+i) for i in range(5)]
    jax.device_get(outs)
    print(f"{label}: {(time.perf_counter()-t0)/5*1e3:.1f} ms ({nt} steps)", flush=True)

run(k_mm, 1024, (B,2), "A mm-only t=1024")
run(k_mm_bins(2), 1024, (B,2), "B mm+binmax t=1024 (f32 HIGHEST baseline)")
run(k_planes(2), 1024, (B,2), "D planes bf16x3+binmax t=1024", n_v_inputs=2)
