"""Probe: which int4-unpack strategy is fastest inside the Mosaic kernel.

Variants (all compute the same masked attention at the bench shape):
  i8        — baseline int8 kernel (no unpack)
  i4_i32    — widen to int32, shift-unpack, split matmuls (current)
  i4_i8sh   — int8-native shifts (no widening), split matmuls
  i4_float  — int8→f32 convert then arithmetic nibble extraction, split
  i4_concat — int8-native shifts + sublane concat, single matmuls
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
P = TS // 2


def _body(q, k2, v2, sk, sv, on_path, kn, vn, o_ref):
    dims = (((2,), (2,)), ((0,), (0,)))
    scores = jax.lax.dot_general(q, k2, dims, preferred_element_type=jnp.float32)
    scores = scores * sk[:, None, :]
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = jnp.sum(q.astype(jnp.float32) * kn.astype(jnp.float32), 2, keepdims=True)
    m = jnp.maximum(jnp.max(scores, 2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, 2, keepdims=True) + p_self
    w = ((p / denom) * sv[:, None, :]).astype(v2.dtype)
    out = jax.lax.dot_general(w, v2, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = out + (p_self / denom) * vn.astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _body_split(q, klo, khi, vlo, vhi, sk, sv, on_path, kn, vn, o_ref):
    dims = (((2,), (2,)), ((0,), (0,)))
    scores = jnp.concatenate([
        jax.lax.dot_general(q, klo, dims, preferred_element_type=jnp.float32),
        jax.lax.dot_general(q, khi, dims, preferred_element_type=jnp.float32),
    ], axis=2)
    scores = scores * sk[:, None, :]
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = jnp.sum(q.astype(jnp.float32) * kn.astype(jnp.float32), 2, keepdims=True)
    m = jnp.maximum(jnp.max(scores, 2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, 2, keepdims=True) + p_self
    w = ((p / denom) * sv[:, None, :]).astype(vlo.dtype)
    wv = (((2,), (1,)), ((0,), (0,)))
    out = (jax.lax.dot_general(w[:, :, :P], vlo, wv, preferred_element_type=jnp.float32)
           + jax.lax.dot_general(w[:, :, P:], vhi, wv, preferred_element_type=jnp.float32))
    out = out + (p_self / denom) * vn.astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def k_i8(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, sk_ref, sv_ref, o_ref):
    q = q_ref[...]
    kv = kv_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_ref[...] == col)[None]
    _body(q, kv[:, :, :Dh].astype(q.dtype), kv[:, :, Dh:].astype(q.dtype),
          sk_ref[...], sv_ref[...], on_path, kn_ref[...], vn_ref[...], o_ref)


def k_i4_i32(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, sk_ref, sv_ref, o_ref):
    q = q_ref[...]
    wide = kv_ref[...].astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(wide, 28), jnp.int32(28)).astype(q.dtype)
    hi = jax.lax.shift_right_arithmetic(wide, jnp.int32(4)).astype(q.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_ref[...] == col)[None]
    _body_split(q, lo[:, :, :Dh], hi[:, :, :Dh], lo[:, :, Dh:], hi[:, :, Dh:],
                sk_ref[...], sv_ref[...], on_path, kn_ref[...], vn_ref[...], o_ref)


def k_i4_i8sh(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, sk_ref, sv_ref, o_ref):
    q = q_ref[...]
    b = kv_ref[...]
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, jnp.int8(4)), jnp.int8(4)).astype(q.dtype)
    hi = jax.lax.shift_right_arithmetic(b, jnp.int8(4)).astype(q.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_ref[...] == col)[None]
    _body_split(q, lo[:, :, :Dh], hi[:, :, :Dh], lo[:, :, Dh:], hi[:, :, Dh:],
                sk_ref[...], sv_ref[...], on_path, kn_ref[...], vn_ref[...], o_ref)


def k_i4_float(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, sk_ref, sv_ref, o_ref):
    q = q_ref[...]
    f = kv_ref[...].astype(jnp.float32)  # byte value in [-128, 127], exact
    hi = jnp.floor(f / 16.0)
    lo_u = f - 16.0 * hi                 # [0, 15]
    lo = lo_u - 16.0 * (lo_u >= 8.0)
    lo = lo.astype(q.dtype)
    hi = hi.astype(q.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_ref[...] == col)[None]
    _body_split(q, lo[:, :, :Dh], hi[:, :, :Dh], lo[:, :, Dh:], hi[:, :, Dh:],
                sk_ref[...], sv_ref[...], on_path, kn_ref[...], vn_ref[...], o_ref)


def k_i4_concat(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, sk_ref, sv_ref, o_ref):
    q = q_ref[...]
    b = kv_ref[...]
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
    kv = jnp.concatenate([lo, hi], axis=1).astype(q.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_ref[...] == col)[None]
    _body(q, kv[:, :, :Dh], kv[:, :, Dh:], sk_ref[...], sv_ref[...],
          on_path, kn_ref[...], vn_ref[...], o_ref)


def build(kernel, packed):
    width = P if packed else TS
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, TS), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, width, 2 * Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, TS), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, TS), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), jnp.bfloat16),
    )


import sys
sys.path.insert(0, "/root/repo")
from mm_s2ut.ops import decode_attention as da

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
kn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
vn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
cols = jnp.asarray(rng.randint(-7, 8, (B, H, TS, 2 * Dh)), jnp.int8)
kv4 = np.asarray(da.i4_pack(cols, P))
kv4 = jnp.asarray(kv4)
sk = jnp.asarray(rng.rand(B, H, TS) * 0.05 + 0.01, jnp.float32)
sv = jnp.asarray(rng.rand(B, H, TS) * 0.05 + 0.01, jnp.float32)
step = 150
anc = rng.randint(0, S, (B, K, T))
t_idx = np.arange(T)[None, None]
flat = jnp.asarray(np.repeat(np.where(t_idx < step, t_idx * S + anc, -1), S, axis=2), jnp.int32)

VARIANTS = {
    "i8": (k_i8, cols),
    "i4_i32": (k_i4_i32, kv4),
    "i4_i8sh": (k_i4_i8sh, kv4),
    "i4_float": (k_i4_float, kv4),
    "i4_concat": (k_i4_concat, kv4),
}

ref = None
for name, (kern, slab) in VARIANTS.items():
    try:
        call = build(kern, packed=slab.shape[2] == P)

        @partial(jax.jit, static_argnames=("n",))
        def chain(q, kn, vn, slab, sk, sv, flat, n, call=call):
            def body(qc, _):
                return call(flat, qc, kn, vn, slab, sk, sv), ()
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out

        out = np.asarray(chain(q, kn, vn, slab, sk, sv, flat, n=1), np.float32)
        if ref is None:
            ref = out
        err = np.max(np.abs(out - ref))
        float(chain(q, kn, vn, slab, sk, sv, flat, n=100).sum())
        t = {}
        for n in (2, 100):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                chain(q, kn, vn, slab, sk, sv, flat, n=n).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            t[n] = best
        per = (t[100] - t[2]) / 98 * 1e3
        print(f"{name:10s}: {per:.3f} ms/call  (max err vs i8: {err:.4f})")
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__} {str(e)[:200]}")
