"""Reorder strategies INSIDE a lax.while_loop on the real stacked cache."""
import time
import jax, jax.numpy as jnp, numpy as np

B, K, NL, T, H, D = 8, 5, 6, 201, 8, 64
BK = B * K
kv0 = jnp.asarray(np.random.RandomState(0).randn(BK, 2, NL, T, H, D).astype(np.float32), jnp.bfloat16)

def variant_take(kv, flat):
    return jnp.take(kv, flat, axis=0)

def variant_onehot(kv, flat):
    onehot = jax.nn.one_hot(flat, BK, dtype=kv.dtype)  # (BK, BK)
    kvr = kv.reshape(BK, -1)
    return (onehot @ kvr).reshape(kv.shape)

def variant_dus(kv, flat):
    # per-row dynamic slices, stacked
    rows = [jax.lax.dynamic_index_in_dim(kv, flat[i], axis=0, keepdims=False)
            for i in range(BK)]
    return jnp.stack(rows, axis=0)

def bench(fn, n):
    def body(c):
        i, kv = c
        flat = (jnp.arange(BK) + i) % BK
        kv = fn(kv, flat)
        return (i + 1, kv)
    @jax.jit
    def run(kv):
        i, kv = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.zeros((), jnp.int32), kv))
        return kv.astype(jnp.float32).sum()
    float(run(kv0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(run(kv0)); best = min(best, time.perf_counter() - t0)
    return best

for name, fn in [("take", variant_take), ("onehot_bk", variant_onehot), ("dus_stack", variant_dus)]:
    t10 = bench(fn, 10); t50 = bench(fn, 50)
    per = (t50 - t10) / 40
    gb = BK * 2 * NL * T * H * D * 2 * 2 / 1e9
    print(f"{name}: {per*1e3:.2f} ms/reorder ({gb/per:.0f} GB/s r+w)")

def variant_bmm(kv, flat):
    idx = flat.reshape(B, K) - (jnp.arange(B)[:, None] * K)
    onehot = jax.nn.one_hot(idx, K, dtype=kv.dtype)  # (B,K,K)
    kvr = kv.reshape(B, K, -1)
    out = jnp.einsum("bjk,bkn->bjn", onehot, kvr, preferred_element_type=kv.dtype)
    return out.reshape(kv.shape)

t10 = bench(variant_bmm, 10); t50 = bench(variant_bmm, 50)
per = (t50 - t10) / 40
gb = BK * 2 * NL * T * H * D * 2 * 2 / 1e9
print(f"bmm_beamlead: {per*1e3:.2f} ms/reorder ({gb/per:.0f} GB/s r+w)")
