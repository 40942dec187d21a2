"""Certified-exact search over quantized storage.

The reference's core promise is recall@k = 1.0 BY CONSTRUCTION
(reference README.md:7-14). Quantized int8 storage is 4x smaller in HBM but
approximate — otters-tpu restores the promise with a certificate: the scan
returns a sound upper bound on the true cosine of every row it did NOT
hand to the exact re-rank; if the k-th exact score beats that bound, no
unexamined row could have entered the top-k, so recall 1.0 is proven, not
measured. On failure the scan auto-widens (4x per round) and remembers the
working width per plan shape.

Run: python examples/certified_search.py [n] [d]
"""

import sys

import numpy as np

from otters_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over sitecustomize

from otters_tpu import Column, DataType, Metric, MetaStore  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
d = int(sys.argv[2]) if len(sys.argv) > 2 else 128

rng = np.random.default_rng(0)
vecs = rng.normal(size=(n, d)).astype(np.float32)

# adversarial cluster: 200 rows within int8 quantization error of each
# other — a narrow quantized scan provably cannot rank them correctly
u = rng.normal(size=d)
u /= np.linalg.norm(u)
w = rng.normal(size=(200, d))
w -= (w @ u)[:, None] * u[None, :]
w /= np.linalg.norm(w, axis=1, keepdims=True)
eps = 0.05 + 0.25 * rng.permutation(200) / 200
vecs[:200] = (u[None, :] + eps[:, None] * w).astype(np.float32)

ids = Column("id", DataType.Int64).from_values(list(range(n)))
store = (
    MetaStore.from_columns([ids])
    .with_vectors(vecs)
    .with_chunk_size(1024)
    .with_storage_dtype("int8")             # 4x HBM saving
    .with_rerank_source(keep_host_f32=True)  # exactness source
    .build()
)

q = u.astype(np.float32)
res = store.query(q, Metric.Cosine).take(10, rerank_from=50).collect()
stats = store.last_query_stats()
print(f"certified          : {stats.certified}")
print(f"scan width used    : {stats.scan_k_wide} (asked for 50)")
print(f"top-10 row ids     : {res.indices}")

# prove it against the f32 oracle
s = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
want = np.argsort(-s, kind="stable")[:10].tolist()
assert res.indices == want, (res.indices, want)
print("matches f32 oracle : True")

# the width is remembered: the next query starts wide and certifies in
# one dispatch
res2 = store.query(q, Metric.Cosine).take(10, rerank_from=50).collect()
print(f"second query width : {store.last_query_stats().scan_k_wide} "
      "(no re-widening)")

# certify=False restores the fixed-width measured behavior
store.query(q, Metric.Cosine).take(10, rerank_from=50, certify=False).collect()
print(f"certify=False      : certified={store.last_query_stats().certified}")
