"""Probe: ancestry self-attn int8 kernel batch-blocking at B=128 K=10.

The production kernel runs grid (B,) with a ~2 MB slab DMA per program
(H=8, TS=2010, 128 int8 lanes) — measured 0.377 ms/call vs a 0.32 ms
byte floor. Blocking NB=2 batch rows doubles the slab DMA and halves the
program count; VMEM caps NB at 2 (2 x 4.1 MB double-buffered + scales).
"""
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mm_s2ut.ops import decode_attention as da
from mm_s2ut.ops.decode_attention import _quantize_q, NEG_INF

B = int(os.environ.get("PROBE_B", "128"))
K = int(os.environ.get("PROBE_K", "10"))
CAP, L, H, Dh = 201, 6, 8, 64
TS = CAP * K
N1, N2 = 20, 120


@jax.jit
def _mk():
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    kv = jax.random.randint(k0, (B, L, H, TS, 2 * Dh), -127, 127, jnp.int8)
    sk = jax.random.uniform(k1, (B, L, H, TS)) * 0.01
    sv = jax.random.uniform(k1, (B, L, H, TS)) * 0.01
    q = jax.random.normal(k2, (B, H, K, Dh), jnp.bfloat16)
    kn = jax.random.normal(k3, (B, H, K, Dh), jnp.bfloat16)
    vn = jax.random.normal(k3, (B, H, K, Dh), jnp.bfloat16)
    anc = jnp.zeros((B, K, CAP), jnp.int32)
    t_idx = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
    flat = jnp.where(t_idx < CAP - 1, t_idx * K + anc, -1)
    flat_rep = jnp.repeat(flat, K, axis=2)
    return kv, sk, sv, q, kn, vn, flat_rep


kv0, sk0, sv0, q0, kn0, vn0, flat0 = _mk()
jax.block_until_ready(kv0)
print("arrays ready", flush=True)


def _kernel_i8_nb(flat_ref, q8_ref, qs_ref, sl_ref, vn_ref, kv_ref, sk_ref,
                  sv_ref, o_ref):
    NB, H_, K_, Dh_ = q8_ref.shape
    TS_ = flat_ref.shape[2]
    flat_rep = flat_ref[...]  # (NB, K, TS)
    col = jax.lax.broadcasted_iota(jnp.int32, (NB, K_, TS_), 2)
    on_path = (flat_rep == col)[:, None]  # (NB, 1, K, TS)
    q8 = q8_ref[...].reshape(NB * H_, K_, Dh_)
    kv = kv_ref[...]  # (NB, H, TS, 2Dh) int8
    s32 = jax.lax.dot_general(
        q8, kv[:, :, :, :Dh_].reshape(NB * H_, TS_, Dh_),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(NB, H_, K_, TS_)
    scores = (
        s32.astype(jnp.float32)
        * qs_ref[...][..., None]
        * sk_ref[...][:, :, None, :]
    )
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = sl_ref[...][..., None]  # (NB, H, K, 1)
    m = jnp.maximum(jnp.max(scores, axis=3, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=3, keepdims=True) + p_self
    w_eff = (p / denom) * sv_ref[...][:, :, None, :]
    ws = jnp.max(w_eff, axis=3, keepdims=True) / 127.0 + 1e-20
    w8 = jnp.round(w_eff / ws).astype(jnp.int8)
    out32 = jax.lax.dot_general(
        w8.reshape(NB * H_, K_, TS_), kv[:, :, :, Dh_:].reshape(NB * H_, TS_, Dh_),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(NB, H_, K_, Dh_)
    out = out32.astype(jnp.float32) * ws
    out = out + (p_self / denom) * vn_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def ancestry_i8_nb(q, k_new, v_new, kv, sk, sv, flat_rep, layer, nb):
    B_, H_, K_, Dh_ = q.shape
    TS_ = kv.shape[3]
    q8, qs, sl = _quantize_q(q, k_new)
    return pl.pallas_call(
        _kernel_i8_nb,
        grid=(B_ // nb,),
        in_specs=[
            pl.BlockSpec((nb, K_, TS_), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, H_, K_, Dh_), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H_, K_), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, H_, K_), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, H_, K_, Dh_), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(
                (nb, None, H_, TS_, 2 * Dh_), lambda b: (b, layer, 0, 0, 0)
            ),
            pl.BlockSpec((nb, None, H_, TS_), lambda b: (b, layer, 0, 0)),
            pl.BlockSpec((nb, None, H_, TS_), lambda b: (b, layer, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, H_, K_, Dh_), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, H_, K_, Dh_), q.dtype),
    )(flat_rep.astype(jnp.int32), q8, qs, sl, v_new, kv, sk, sv)


def timeit2(make):
    f1, f2 = make(N1), make(N2)
    jax.block_until_ready(f1()); jax.block_until_ready(f2())
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f1()); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(f2()); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def loop(call, n):
    @jax.jit
    def run(q, kv, sk, sv, flat_rep):
        def body(c, _):
            acc = c
            for layer in range(L):
                acc = acc + call(q + acc * 0.01, kn0, vn0, kv, sk, sv,
                                 flat_rep, layer)
            return acc, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
        return out.sum()
    return lambda: run(q0, kv0, sk0, sv0, flat0)


ref = jax.jit(functools.partial(da.ancestry_decode_attention_i8, layer=0))(
    q0, kn0, vn0, kv0, sk0, sv0, flat0)
rows = [("s0 grid(B)", lambda *a, **k: da.ancestry_decode_attention_i8(*a, **k))]
for nb in (2,):
    if B % nb == 0:
        rows.append((f"s1 nb={nb}  ", functools.partial(
            lambda *a, nb=nb: ancestry_i8_nb(*a, nb=nb))))

for name, call in rows:
    try:
        got = jax.jit(lambda *a: call(*a, 0))(q0, kn0, vn0, kv0, sk0, sv0, flat0)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        dt = timeit2(functools.partial(loop, call))
        print(f"{name}: {dt*1e3:.3f} ms/step  max|err|={err:.5f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:250]}", flush=True)
