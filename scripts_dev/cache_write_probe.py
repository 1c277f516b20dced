"""Probe: is the per-step KV-cache dynamic_update_slice copying the cache?

Times while_loop bodies over the real cache shape (B,2,L,H,T*K,Dh):
  a) DUS write only
  b) 6 ancestry-kernel reads only
  c) reads + DUS write (the decode-step structure)
  d) reads + write where the cache is SPLIT per layer (6 carries)
Two-point timing over loop lengths.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mm_s2ut.ops import decode_attention as da

B = int(os.environ.get("PROBE_B", "32"))
K = 5
CAP = 201
L, H, Dh = 6, 8, 64
TS = CAP * K
N1, N2 = 20, 120

rng = np.random.RandomState(0)
kv0 = jnp.zeros((B, 2, L, H, TS, Dh), jnp.bfloat16)
q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16)
rows = jnp.asarray(rng.randn(B, 2, L, H, K, Dh), jnp.bfloat16)
anc = jnp.zeros((B, K, CAP), jnp.int32)
t_idx = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
flat_rep = jnp.repeat(jnp.where(t_idx < CAP - 1, t_idx * K + anc, -1), K, axis=2)
fn = da.ancestry_decode_attention if da.supported(kv0) else da.reference


def timeit2(make, *args):
    f1, f2 = make(N1), make(N2)
    float(f1(*args)); float(f2(*args))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def write_only(n):
    @jax.jit
    def run(kv, rows):
        def body(c):
            i, kv = c
            kv = jax.lax.dynamic_update_slice_in_dim(
                kv, rows, jnp.minimum(i, CAP - 2) * K, axis=4
            )
            return (i + 1, kv)
        i, kv = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.zeros((), jnp.int32), kv))
        return kv.sum()
    return run


def read_only(n):
    @jax.jit
    def run(kv, q, flat_rep):
        def body(c):
            i, acc = c
            for layer in range(L):
                acc = acc + fn(q, q, q, kv, flat_rep, layer)
            return (i + 1, acc)
        i, acc = jax.lax.while_loop(
            lambda c: c[0] < n, body, (jnp.zeros((), jnp.int32), jnp.zeros_like(q))
        )
        return acc.sum()
    return run


def read_write(n):
    @jax.jit
    def run(kv, q, flat_rep, rows):
        def body(c):
            i, kv, acc = c
            for layer in range(L):
                acc = acc + fn(q, q, q, kv, flat_rep, layer)
            kv = jax.lax.dynamic_update_slice_in_dim(
                kv, rows, jnp.minimum(i, CAP - 2) * K, axis=4
            )
            return (i + 1, kv, acc)
        i, kv, acc = jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (jnp.zeros((), jnp.int32), kv, jnp.zeros_like(q)),
        )
        return acc.sum() + kv.sum()
    return run


def split_read_write(n):
    kvs0 = [jnp.zeros((B, 2, H, TS, Dh), jnp.bfloat16) for _ in range(L)]
    rows_l = jnp.asarray(rng.randn(B, 2, H, K, Dh), jnp.bfloat16)

    @jax.jit
    def run(q, flat_rep, rows_l, *kvs):
        def body(c):
            i, acc, *kvs = c
            kvs = list(kvs)
            for layer in range(L):
                kv5 = kvs[layer][:, :, None]  # (B,2,1,H,TS,Dh)
                acc = acc + fn(q, q, q, kv5, flat_rep, 0)
                kvs[layer] = jax.lax.dynamic_update_slice_in_dim(
                    kvs[layer], rows_l, jnp.minimum(i, CAP - 2) * K, axis=3
                )
            return (i + 1, acc, *kvs)
        out = jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (jnp.zeros((), jnp.int32), jnp.zeros_like(q), *kvs),
        )
        return out[1].sum() + out[2].sum()
    return lambda q=q, f=flat_rep, r=rows_l, k=tuple(kvs0): run(q, f, r, *k)


print(f"B={B} cache={B*2*L*H*TS*Dh*2/1e6:.0f} MB")
for name, make, args in [
    ("write only      ", write_only, (kv0, rows)),
    ("read only (6x)  ", read_only, (kv0, q, flat_rep)),
    ("read+write      ", read_write, (kv0, q, flat_rep, rows)),
    ("split read+write", split_read_write, ()),
]:
    print(f"{name}: {timeit2(make, *args)*1e3:.3f} ms/step")
