import time
import jax, jax.numpy as jnp, numpy as np
from mm_s2ut.ops.beam_reorder import reorder_rows

B, K, NL, T, H, D = 8, 5, 6, 201, 8, 64
BK = B * K
kv0 = jnp.asarray(np.random.RandomState(0).randn(BK, 2, NL, T, H, D).astype(np.float32), jnp.bfloat16)

# correctness on TPU
idx = jnp.asarray(np.random.RandomState(1).randint(0, BK, BK), jnp.int32)
out = reorder_rows(kv0, idx)
np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(kv0, np.float32)[np.asarray(idx)])
print("tpu correctness ok")

def bench(n):
    def body(c):
        i, kv = c
        flat = (jnp.arange(BK) + i) % BK
        kv = reorder_rows(kv, flat)
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

t10, t50 = bench(10), bench(50)
per = (t50 - t10) / 40
gb = BK * 2 * NL * T * H * D * 2 * 2 / 1e9
print(f"pallas_reorder: {per*1e3:.2f} ms/reorder ({gb/per:.0f} GB/s r+w)")
