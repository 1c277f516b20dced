"""Probe: int4 ancestry kernel on the real TPU at the bench shape.

Checks (1) Mosaic compiles _kernel_i4 (int8 bit-ops + sublane concat),
(2) numerics match the XLA reference, (3) per-call time vs the int8
kernel at B=128 K=10 T·S=2020.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.ops import decode_attention as da

B, L, H, K, Dh = 128, 1, 8, 10, 64
T, S = 202, 10
TS = T * S
rng = np.random.RandomState(0)

q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
kn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
vn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
cols = jnp.asarray(rng.randint(-7, 8, (B, L, H, TS, 2 * Dh)), jnp.int8)
kv4 = da.i4_pack(cols, TS // 2)
kv8 = cols
sk = jnp.asarray(rng.rand(B, L, H, TS) * 0.05 + 0.01, jnp.float32)
sv = jnp.asarray(rng.rand(B, L, H, TS) * 0.05 + 0.01, jnp.float32)
step = 150
anc = rng.randint(0, S, (B, K, T))
t_idx = np.arange(T)[None, None]
flat_idx = np.where(t_idx < step, t_idx * S + anc, -1)
flat = jnp.asarray(np.repeat(flat_idx, S, axis=2), jnp.int32)

print("platform:", jax.devices()[0].platform)
print("supported_i4:", da.supported_i4(kv4), " supported_i8:", da.supported(kv8))

out4 = da.ancestry_decode_attention_i4(q, kn, vn, kv4, sk, sv, flat, 0)
ref4 = da.reference_i4(q, kn, vn, kv4, sk, sv, flat, 0)
err = np.max(np.abs(np.asarray(out4, np.float32) - np.asarray(ref4, np.float32)))
print("i4 kernel vs reference max abs err:", err)


@partial(jax.jit, static_argnames=("n", "which"))
def chain(q, kn, vn, kv4, kv8, sk, sv, flat, n, which):
    def body(qc, _):
        if which == "i4":
            out = da.ancestry_decode_attention_i4(qc, kn, vn, kv4, sk, sv, flat, 0)
        else:
            out = da.ancestry_decode_attention_i8(qc, kn, vn, kv8, sk, sv, flat, 0)
        return out.astype(qc.dtype), ()
    out, _ = jax.lax.scan(body, q, None, length=n)
    return out.sum()


args = (q, kn, vn, kv4, kv8, sk, sv, flat)
for which in ("i8", "i4"):
    float(chain(*args, n=2, which=which))
    float(chain(*args, n=100, which=which))
    t = {}
    for n in (2, 100):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args, n=n, which=which))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per_call = (t[100] - t[2]) / 98 * 1e3
    print(f"{which}: {per_call:.3f} ms/call")
