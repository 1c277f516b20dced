"""Probe: native jnp.int4 support on this TPU/jaxlib.

Checks (1) int4 array creation + dynamic_update_slice on a non-minor
axis, (2) Pallas kernel loading an int4 block and casting to bf16,
(3) per-call time of an int4-slab matmul kernel vs the int8 one at the
bench shape (does the DMA actually halve?).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("platform:", jax.devices()[0].platform)

# 1. int4 array + DUS on axis 1 (non-minor).
try:
    x = jnp.zeros((4, 16, 128), jnp.int4)
    rows = jnp.ones((4, 2, 128), jnp.int4)
    y = jax.jit(lambda x, r: jax.lax.dynamic_update_slice_in_dim(x, r, 6, axis=1))(x, rows)
    print("DUS int4 ok:", np.asarray(y.astype(jnp.int8)).sum() == 4 * 2 * 128)
except Exception as e:
    print("DUS int4 FAILED:", type(e).__name__, str(e)[:200])

# 2. Pallas load int4 + cast.
def _k(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.bfloat16) * 2.0

try:
    x = jnp.asarray(np.random.randint(-7, 7, (8, 256, 128)), jnp.int4)
    out = pl.pallas_call(
        _k,
        grid=(8,),
        in_specs=[pl.BlockSpec((None, 256, 128), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((None, 256, 128), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 256, 128), jnp.bfloat16),
    )(x)
    ref = np.asarray(x.astype(jnp.float32)) * 2.0
    print("pallas int4 load ok:", np.allclose(np.asarray(out, np.float32), ref))
except Exception as e:
    print("pallas int4 FAILED:", type(e).__name__, str(e)[:300])

# 3. DMA-halving check: time a slab-reading kernel at int8 vs int4.
B, H, TS, Dh = 128, 8, 2010, 64
K = 10


def _attnish(q_ref, kv_ref, o_ref):
    q = q_ref[...]
    kv = kv_ref[...].astype(q.dtype)
    k2 = kv[:, :, :Dh]
    v2 = kv[:, :, Dh:]
    s = jax.lax.dot_general(q, k2, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, 2, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, 2, keepdims=True)).astype(v2.dtype)
    o_ref[...] = jax.lax.dot_general(
        w, v2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def bench(dt):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
    kv = jnp.asarray(rng.randint(-7, 7, (B, H, TS, 2 * Dh)), dt)

    call = pl.pallas_call(
        _attnish,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, TS, 2 * Dh), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), jnp.bfloat16),
    )

    @partial(jax.jit, static_argnames=("n",))
    def chain(q, kv, n):
        def body(qc, _):
            return call(qc, kv), ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out.sum()

    float(chain(q, kv, n=2)); float(chain(q, kv, n=100))
    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(q, kv, n=n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(100) - timed(2)) / 98 * 1e3


for dt in (jnp.int8, jnp.int4):
    try:
        print(f"{jnp.dtype(dt).name}: {bench(dt):.3f} ms/call")
    except Exception as e:
        print(f"{jnp.dtype(dt).name} bench FAILED:", type(e).__name__, str(e)[:300])
