"""Probe: interleaved KV cache (B, L, H, T·S, 2·Dh=128).

  1. DUS write speed at S=5 (unaligned slots) with 128 lanes.
  2. Ancestry kernel reading k/v as static lane slices of the 128-wide
     block — correctness vs the current reference, and speed of the
     combined read+write loop (the real decode-step cache cost).
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, K, CAP, L, H, Dh = 32, 5, 201, 6, 8, 64
TS = CAP * K
N1, N2 = 20, 120
NEG_INF = -1e9


def timeit2(make, *args):
    f1, f2 = make(N1), make(N2)
    float(f1(*args)); float(f2(*args))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


# --- interleaved ancestry kernel ------------------------------------------
def _kernel(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, o_ref):
    q = q_ref[...]  # (K, Dh)
    Kb, Dhb = q.shape
    kv = kv_ref[...]  # (TS, 2*Dh)
    k2 = kv[:, :Dhb]
    v2 = kv[:, Dhb:]
    TSb = k2.shape[0]
    scores = jax.lax.dot_general(
        q, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    flat_rep = flat_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (Kb, TSb), 1)
    scores = jnp.where(flat_rep == col, scores, NEG_INF)
    kn = kn_ref[...]
    vn = vn_ref[...]
    self_logit = jnp.sum(
        q.astype(jnp.float32) * kn.astype(jnp.float32), axis=1, keepdims=True
    )
    m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=1, keepdims=True) + p_self
    w = (p / denom).astype(v2.dtype)
    out = jnp.dot(w, v2, preferred_element_type=jnp.float32)
    out = out + (p_self / denom) * vn.astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer",))
def interleaved_attention(q, k_new, v_new, kv, flat_rep, layer):
    # kv: (B, L, H, TS, 2*Dh)
    Bq, Hq, Kq, Dhq = q.shape
    TSq = kv.shape[3]
    return pl.pallas_call(
        _kernel,
        grid=(Bq, Hq),
        in_specs=[
            pl.BlockSpec((None, Kq, TSq), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((None, None, Kq, Dhq), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((None, None, Kq, Dhq), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((None, None, Kq, Dhq), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((None, None, None, TSq, 2 * Dhq),
                         lambda b, h: (b, layer, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, Kq, Dhq), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, Kq, Dhq), q.dtype),
    )(flat_rep.astype(jnp.int32), q, k_new, v_new, kv)


rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
kn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
vn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
kvi = jnp.asarray(rng.randn(B, L, H, TS, 2 * Dh), jnp.float32) * 0.3
anc = jnp.asarray(rng.randint(0, K, (B, K, CAP)), jnp.int32)
t_idx = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
flat = jnp.where(t_idx < 37, t_idx * K + anc, -1)
flat_rep = jnp.repeat(flat, K, axis=2)

# correctness vs the current (split) reference
from mm_s2ut.ops import decode_attention as da
kv_split = jnp.stack(
    [kvi[..., :Dh], kvi[..., Dh:]], axis=1
).transpose(0, 1, 2, 3, 4, 5)  # (B, 2, L, H, TS, Dh)
ref = np.asarray(jax.jit(da.reference, static_argnums=5)(q, kn, vn, kv_split, flat_rep, 2))
got = np.asarray(interleaved_attention(q, kn, vn, kvi, flat_rep, 2))
print("interleaved kernel maxdiff:", np.abs(got - ref).max())

# --- combined read+write loop ---------------------------------------------
kvb = kvi.astype(jnp.bfloat16)
rows = jnp.asarray(rng.randn(B, L, H, K, 2 * Dh), jnp.bfloat16)
qb, knb, vnb = (x.astype(jnp.bfloat16) for x in (q, kn, vn))


def rw_loop(n):
    @jax.jit
    def run(kv, q, kn, vn, flat_rep, rows):
        def body(c):
            i, kv, acc = c
            for layer in range(L):
                acc = acc + interleaved_attention(q + acc * 0.01, kn, vn, kv, flat_rep, layer)
            kv = jax.lax.dynamic_update_slice_in_dim(
                kv, rows, jnp.minimum(i, CAP - 2) * K, axis=3
            )
            return (i + 1, kv, acc)
        _, kv, acc = jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (jnp.zeros((), jnp.int32), kv, jnp.zeros_like(q)),
        )
        return acc.sum() + kv.sum()
    return lambda: run(kvb, qb, knb, vnb, flat_rep, rows)


def w_loop(n):
    @jax.jit
    def run(kv, rows):
        def body(c):
            i, kv = c
            kv = jax.lax.dynamic_update_slice_in_dim(
                kv, rows, jnp.minimum(i, CAP - 2) * K, axis=3
            )
            return (i + 1, kv)
        _, kv = jax.lax.while_loop(
            lambda c: c[0] < n, body, (jnp.zeros((), jnp.int32), kv)
        )
        return kv.sum()
    return lambda: run(kvb, rows)


print(f"cache physical {B*L*H*TS*2*Dh*2/1e6:.0f} MB")
print(f"write only (S=5, lane=128): {timeit2(w_loop)*1e3:.3f} ms/step")
print(f"read(6x)+write            : {timeit2(rw_loop)*1e3:.3f} ms/step")
