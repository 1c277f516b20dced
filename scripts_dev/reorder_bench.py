"""Microbenchmark beam-reorder strategies for the KV cache on TPU."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, K, L, H, D = 8, 5, 201, 8, 64
N_TENSORS = 12
rng = np.random.RandomState(0)
caches = [jnp.asarray(rng.randn(B * K, L, H, D).astype(np.float32), jnp.bfloat16)
          for _ in range(N_TENSORS)]
idx = jnp.asarray(rng.randint(0, K, (B, K)), jnp.int32)


def via_take_along(caches, idx):
    out = []
    for x in caches:
        xr = x.reshape(B, K, L, H, D)
        g = jnp.take_along_axis(xr, idx.reshape(B, K, 1, 1, 1), axis=1)
        out.append(g.reshape(B * K, L, H, D))
    return out


def via_flat_take(caches, idx):
    flat = (jnp.arange(B)[:, None] * K + idx).reshape(-1)
    return [jnp.take(x, flat, axis=0) for x in caches]


def via_onehot_matmul(caches, idx):
    onehot = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)  # (B, Kt, Kf)
    out = []
    for x in caches:
        xr = x.reshape(B, K, L * H * D)
        g = jnp.einsum("bjk,bkn->bjn", onehot, xr)
        out.append(g.reshape(B * K, L, H, D))
    return out


def bench(fn):
    f = jax.jit(lambda cs, i: [y.sum() for y in fn(cs, i)])
    g16 = jax.jit(lambda cs, i: sum(sum(y.sum() for y in fn(cs, i)) for _ in range(1)))
    # unrolled repeats inside one program
    def rep(n):
        @jax.jit
        def r(cs, i):
            cur = cs
            for _ in range(n):
                cur = fn(cur, i)
            # consume every tensor so nothing is dead-code-eliminated
            return sum(y.astype(jnp.float32).sum() for y in cur)
        return r
    r2, r18 = rep(2), rep(18)
    float(r2(caches, idx)); float(r18(caches, idx))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(r2(caches, idx)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r18(caches, idx)); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / 16)
    return best


for name, fn in [("take_along_axis", via_take_along),
                 ("flat_take", via_flat_take),
                 ("onehot_matmul", via_onehot_matmul)]:
    t = bench(fn)
    gb = N_TENSORS * B * K * L * H * D * 2 * 2 / 1e9  # read+write
    print(f"{name}: {t * 1e3:.2f} ms/reorder  ({gb / t:.0f} GB/s effective)")
