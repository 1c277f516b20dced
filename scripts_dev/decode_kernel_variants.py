"""Decode-attention kernel micro-variants, timed standalone on TPU.

Shapes: bench operating point B=32, H=8, Dh=64, T=201, beam S.
Variants:
  v0: current production kernel (per-head python loop, q@k^T).
  v1: batched dot_general over H (no python head loop).
  v2: transposed score matmul (k2 @ q^T → (TS, K)) — long axis streams.
  v3: v1 + int8 cache.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.ops import decode_attention as da

B, H, Dh, T, L = 32, 8, 64, 201, 6
NEG_INF = -1e9


def _kernel_v1(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, o_ref):
    H_, K, Dh_ = q_ref.shape
    flat_rep = flat_ref[...]
    TS = flat_rep.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_rep == col)[None]  # (1, K, TS)
    q = q_ref[...]
    kv = kv_ref[...]  # (H, TS, 2Dh)
    k2 = kv[:, :, :Dh_]
    v2 = kv[:, :, Dh_:]
    scores = jax.lax.dot_general(
        q, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, K, TS)
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = jnp.sum(
        q.astype(jnp.float32) * kn_ref[...].astype(jnp.float32), axis=2, keepdims=True
    )  # (H, K, 1)
    m = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=2, keepdims=True) + p_self
    w = (p / denom).astype(v2.dtype)
    out = jax.lax.dot_general(
        w, v2, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, K, Dh)
    out = out + (p_self / denom) * vn_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _kernel_v2(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, o_ref):
    H_, K, Dh_ = q_ref.shape
    flat_rep = flat_ref[...]
    TS = flat_rep.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (TS, K), 0)
    on_path_t = flat_rep.T == col  # (TS, K)
    for h in range(H_):
        q = q_ref[h]
        kv = kv_ref[h]
        k2 = kv[:, :Dh_]
        v2 = kv[:, Dh_:]
        scores_t = jax.lax.dot_general(
            k2, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TS, K)
        scores_t = jnp.where(on_path_t, scores_t, NEG_INF)
        kn = kn_ref[h]
        vn = vn_ref[h]
        self_logit = jnp.sum(
            q.astype(jnp.float32) * kn.astype(jnp.float32), axis=1
        )[None, :]  # (1, K)
        m = jnp.maximum(jnp.max(scores_t, axis=0, keepdims=True), self_logit)
        p = jnp.exp(scores_t - m)  # (TS, K)
        p_self = jnp.exp(self_logit - m)  # (1, K)
        denom = jnp.sum(p, axis=0, keepdims=True) + p_self
        w = (p / denom).astype(v2.dtype)  # (TS, K)
        out_t = jax.lax.dot_general(
            w, v2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (K, Dh)
        out_t = out_t + (p_self / denom).T * vn.astype(jnp.float32)
        o_ref[h] = out_t.astype(o_ref.dtype)


def make_call(kernel, S, dtype=jnp.bfloat16):
    TS = T * S

    @partial(jax.jit, static_argnames=())
    def run(q, kn, vn, kv, flat):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, S, TS), lambda b: (b, 0, 0)),
                pl.BlockSpec((None, H, S, Dh), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((None, H, S, Dh), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((None, H, S, Dh), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((None, None, H, TS, 2 * Dh), lambda b: (b, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, H, S, Dh), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, S, Dh), jnp.bfloat16),
        )(flat, q, kn, vn, kv)

    return run


def timed_loop(fn, args, n=100):
    # Chain via output-to-input dependency to avoid pipelining illusions:
    # accumulate outputs into q.
    @partial(jax.jit, static_argnames=("steps",))
    def loop(q, kn, vn, kv, flat, steps):
        def body(carry, _):
            qq = carry
            out = fn(qq, kn, vn, kv, flat)
            return (qq + 0.001 * out).astype(qq.dtype), ()

        q2, _ = jax.lax.scan(body, q, length=steps)
        return q2.sum()

    float(loop(*args, steps=2))
    float(loop(*args, steps=n))

    def t(steps):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(*args, steps=steps))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n) - t(2)) / (n - 2) * 1e3


for S in (5, 10):
    TS = T * S
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, Dh), jnp.bfloat16) * 0.1
    kn = jnp.asarray(rng.randn(B, H, S, Dh), jnp.bfloat16) * 0.1
    vn = jnp.asarray(rng.randn(B, H, S, Dh), jnp.bfloat16) * 0.1
    kv = jnp.asarray(rng.randn(B, 1, H, TS, 2 * Dh), jnp.bfloat16) * 0.1
    anc = rng.randint(0, S, (B, S, T))
    t_idx = np.arange(T)[None, None, :]
    flat = np.where(t_idx < 150, t_idx * S + anc, -1)
    flat = jnp.asarray(np.repeat(flat, S, axis=2), jnp.int32)

    # v0: production kernel via the public wrapper (layer=0).
    def v0(q, kn, vn, kv, flat):
        return da.ancestry_decode_attention(q, kn, vn, kv, flat, 0)

    print(f"S={S} v0 per-head loop : {timed_loop(v0, (q, kn, vn, kv, flat)):.4f} ms", flush=True)
    v1 = make_call(_kernel_v1, S)
    print(f"S={S} v1 batched dotgen: {timed_loop(v1, (q, kn, vn, kv, flat)):.4f} ms", flush=True)
    v2 = make_call(_kernel_v2, S)
    print(f"S={S} v2 transposed    : {timed_loop(v2, (q, kn, vn, kv, flat)):.4f} ms", flush=True)
    # sanity: outputs agree
    o0 = np.asarray(v0(q, kn, vn, kv, flat), np.float32)
    o1 = np.asarray(v1(q, kn, vn, kv, flat), np.float32)
    o2 = np.asarray(v2(q, kn, vn, kv, flat), np.float32)
    print("  max|v1-v0|", np.abs(o1 - o0).max(), " max|v2-v0|", np.abs(o2 - o0).max(), flush=True)
