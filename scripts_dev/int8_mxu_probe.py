"""Probe: int8 x int8 -> int32 dot_general inside a Mosaic kernel.

If the MXU takes int8 operands natively (2x bf16 rate on v5e) the decode
kernel can matmul the quantized slab directly — no int8->bf16 convert,
half the MXU passes. Checks compile, numerics, and per-call time vs the
bf16-operand baseline at the bench shape.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NEG_INF = -1e9
B, H, K, Dh = 128, 8, 10, 64
T, S = 202, 10
TS = T * S


def k_bf16(q_ref, kv_ref, o_ref):
    q = q_ref[...]
    kv = kv_ref[...]
    k2 = kv[:, :, :Dh].astype(q.dtype)
    v2 = kv[:, :, Dh:].astype(q.dtype)
    s = jax.lax.dot_general(q, k2, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, 2, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, 2, keepdims=True)).astype(v2.dtype)
    out = jax.lax.dot_general(w, v2, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def k_i8mxu(q_ref, kv_ref, o_ref):
    # q pre-quantized int8 on the host for the probe; real kernel would
    # quantize per (h, k) row in-kernel.
    q = q_ref[...]  # int8
    kv = kv_ref[...]
    k2 = kv[:, :, :Dh]
    v2 = kv[:, :, Dh:]
    s = jax.lax.dot_general(q, k2, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32).astype(jnp.float32)
    s = s * (1.0 / (127.0 * 127.0))
    m = jnp.max(s, 2, keepdims=True)
    p = jnp.exp(s - m)
    w8 = jnp.round(p / jnp.sum(p, 2, keepdims=True) * 127.0).astype(jnp.int8)
    out = jax.lax.dot_general(w8, v2, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (out.astype(jnp.float32) / (127.0 * 127.0)).astype(o_ref.dtype)


rng = np.random.RandomState(0)
qf = rng.randn(B, H, K, Dh).astype(np.float32) * 0.3
q8 = np.clip(np.round(qf / (np.abs(qf).max() / 127.0)), -127, 127).astype(np.int8)
kv8 = jnp.asarray(rng.randint(-127, 128, (B, H, TS, 2 * Dh)), jnp.int8)


def build(kernel, qdt):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, TS, 2 * Dh), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), jnp.bfloat16),
    )


for name, kern, qv in (
    ("bf16-mxu", k_bf16, jnp.asarray(qf, jnp.bfloat16)),
    ("int8-mxu", k_i8mxu, jnp.asarray(q8)),
):
    try:
        call = build(kern, qv.dtype)

        @partial(jax.jit, static_argnames=("n",))
        def chain(q, kv, n, call=call, dt=qv.dtype):
            # Chain the carry into q so the call isn't loop-invariant.
            def body(c, _):
                qc = (q.astype(jnp.float32) + c).astype(dt)
                return call(qc, kv).astype(jnp.float32) * 1e-6, ()
            out, _ = jax.lax.scan(body, jnp.zeros((B, H, K, Dh), jnp.float32), None, length=n)
            return out.sum()

        float(chain(qv, kv8, n=2))
        float(chain(qv, kv8, n=100))
        t = {}
        for n in (2, 100):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(qv, kv8, n=n))
                best = min(best, time.perf_counter() - t0)
            t[n] = best
        print(f"{name}: {(t[100] - t[2]) / 98 * 1e3:.3f} ms/call")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:300]}")
