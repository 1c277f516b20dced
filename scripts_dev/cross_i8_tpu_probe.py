"""Probe: int8 cross-decode kernel on the real TPU at bench shapes.

Checks (1) Mosaic compiles cross_decode_attention_i8, (2) numerics match
the dequantized XLA reference, (3) per-call time vs the bf16 kernel at
the bench operating point (B=128, H=8, K=10, S=63, Dh=64).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.ops import decode_attention as da

B, H, K, S, Dh = 128, 8, 10, 63, 64
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
kv = jnp.asarray(rng.randn(B, H, S, 2 * Dh), jnp.float32) * 0.3
bias = jnp.zeros((B, S), jnp.float32)

sk = jnp.max(jnp.abs(kv[..., :Dh]), axis=-1) / 127.0
sv = jnp.max(jnp.abs(kv[..., Dh:]), axis=-1) / 127.0
k_q = jnp.round(kv[..., :Dh] / sk[..., None])
v_q = jnp.round(kv[..., Dh:] / sv[..., None])
kv_q = jnp.clip(jnp.concatenate([k_q, v_q], -1), -127, 127).astype(jnp.int8)
kv_bf = kv.astype(jnp.bfloat16)

print("platform:", jax.devices()[0].platform)
print("cross_supported(bf16):", da.cross_supported(kv_bf))

out_i8 = da.cross_decode_attention_i8(q, kv_q, sk, sv, bias)
ref_i8 = da.cross_reference_i8(q, kv_q, sk, sv, bias)
err = np.max(np.abs(np.asarray(out_i8, np.float32) - np.asarray(ref_i8, np.float32)))
print("kernel-vs-reference max abs err:", err)

out_bf = da.cross_decode_attention(q, kv_bf, bias)
full = np.asarray(da.cross_reference(q.astype(jnp.float32), kv, bias))
print("i8 vs fp32 max err:", np.max(np.abs(np.asarray(out_i8, np.float32) - full)))
print("bf16 vs fp32 max err:", np.max(np.abs(np.asarray(out_bf, np.float32) - full)))


@partial(jax.jit, static_argnames=("n", "which"))
def chain(q, n, which):
    def body(qc, _):
        if which == "i8":
            out = da.cross_decode_attention_i8(qc, kv_q, sk, sv, bias)
        else:
            out = da.cross_decode_attention(qc, kv_bf, bias)
        return out.astype(qc.dtype), ()
    out, _ = jax.lax.scan(body, q, None, length=n)
    return out


for which in ("bf16", "i8"):
    for n in (10, 210):
        chain(q, n, which).block_until_ready()
    t = {}
    for n in (10, 210):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            chain(q, n, which).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per_call = (t[210] - t[10]) / 200
    print(f"{which}: {per_call*1e6:.1f} us/call")
