"""Probe: cross-decode kernel grid blocking at B=128 K=10 S=250 int8.

The production cross kernel runs grid (B,) = 128 programs/layer, each a
256 KB slab DMA + a tiny (K=10)-row compute: per-program overhead
dominates (bisect: ~0.87 ms/step vs a ~0.3 ms byte floor). Variants
block NB batch rows per program so the slab DMA grows NB x and program
count drops NB x.
"""
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B = int(os.environ.get("PROBE_B", "128"))
K = int(os.environ.get("PROBE_K", "10"))
S, L, H, Dh = 250, 6, 8, 64
N1, N2 = 20, 120

rng = np.random.RandomState(0)
kv = jnp.asarray(rng.randint(-127, 127, (B, H, S, 2 * Dh)), jnp.int8)
sk = jnp.asarray(rng.rand(B, H, S).astype(np.float32) * 0.01)
sv = jnp.asarray(rng.rand(B, H, S).astype(np.float32) * 0.01)
bias = jnp.zeros((B, S), jnp.float32)
q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16)


def timeit2(make):
    f1, f2 = make(N1), make(N2)
    jax.block_until_ready(f1()); jax.block_until_ready(f2())
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f1()); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(f2()); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def _kernel_nb(q_ref, kv_ref, sk_ref, sv_ref, bias_ref, o_ref):
    NB, H_, K_, Dh_ = q_ref.shape
    q_ = q_ref[...].reshape(NB * H_, K_, Dh_)
    kv_ = kv_ref[...]
    k2 = kv_[:, :, :, :Dh_].astype(q_.dtype).reshape(NB * H_, S, Dh_)
    v2 = kv_[:, :, :, Dh_:].astype(q_.dtype).reshape(NB * H_, S, Dh_)
    scores = jax.lax.dot_general(
        q_, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(NB, H_, K_, S)
    scores = scores * sk_ref[...][:, :, None, :]
    scores = scores + bias_ref[...][:, None]
    m = jnp.max(scores, axis=3, keepdims=True)
    p = jnp.exp(scores - m)
    w = ((p / jnp.sum(p, axis=3, keepdims=True))
         * sv_ref[...][:, :, None, :]).astype(v2.dtype)
    out = jax.lax.dot_general(
        w.reshape(NB * H_, K_, S), v2,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.reshape(NB, H_, K_, Dh_).astype(o_ref.dtype)


def cross_nb(q, kv, sk, sv, bias, nb):
    B_, H_, K_, Dh_ = q.shape
    S_ = kv.shape[2]
    bias_k = jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :], (B_, K_, S_))
    return pl.pallas_call(
        functools.partial(_kernel_nb),
        grid=(B_ // nb,),
        in_specs=[
            pl.BlockSpec((nb, H_, K_, Dh_), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H_, S_, 2 * Dh_), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H_, S_), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, H_, S_), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, K_, S_), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, H_, K_, Dh_), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, H_, K_, Dh_), q.dtype),
    )(q, kv, sk, sv, bias_k)


def loop(call, n):
    @jax.jit
    def run(q, kv, sk, sv, bias):
        def body(c, _):
            acc = c
            for _ in range(L):
                acc = acc + call(q + acc * 0.01, kv, sk, sv, bias)
            return acc, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
        return out.sum()
    return lambda: run(q, kv, sk, sv, bias)


from mm_s2ut.ops.decode_attention import cross_decode_attention_i8, cross_reference_i8

ref = jax.jit(cross_reference_i8)(q, kv, sk, sv, bias)
rows = [("c0 grid(B)      ", lambda q, kv, sk, sv, b: cross_decode_attention_i8(q, kv, sk, sv, b))]
for nb in (4, 8, 16, 32):
    if B % nb == 0:
        rows.append((f"c1 nb={nb:<2d}        ",
                     functools.partial(lambda q, kv, sk, sv, b, nb: cross_nb(q, kv, sk, sv, b, nb), nb=nb)))

for name, call in rows:
    try:
        got = jax.jit(lambda q, kv, sk, sv, b: call(q, kv, sk, sv, b))(q, kv, sk, sv, bias)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        dt = timeit2(functools.partial(loop, call))
        print(f"{name}: {dt*1e3:.3f} ms/step  max|err|={err:.5f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:250]}", flush=True)
