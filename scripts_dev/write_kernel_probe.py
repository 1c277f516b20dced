"""Probe: per-step decode-cache write strategies at B=128 K=10 int8.

decode_step_bisect shows the step's cache write costs ~1.05 ms (kv 0.61
+ scales 0.39) of a 4.69 ms step, yet the 3-array DUS alone in a
while_loop measures 0.017 ms/step — the cost is an INTERACTION between
the kernel reads and the write in one loop body (copy-insertion /
scheduling), not the write mechanics. Variants (all with the real
ancestry-kernel reads in the body):

  r0 reads-only      : 6 ancestry_i8 kernel reads, no write
  r1 reads+dus-all   : production structure (barrier + 3 DUS)
  r1a reads+dus-kv   : only the kv DUS
  r1b reads+dus-sc   : only the two scale DUS
  r2 reads+pallas-kv : kv written by an aliased Pallas kernel through a
                       6D (B,L,H,T,K,128) view (block (L,H,1,K,128) at
                       scalar-prefetch T index), scales by DUS
"""
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm_s2ut.ops import decode_attention as da

B = int(os.environ.get("PROBE_B", "128"))
K = int(os.environ.get("PROBE_K", "10"))
CAP, L, H, Dh = 201, 6, 8, 64
TS = CAP * K
N1, N2 = 20, 120

# All arrays are created ON DEVICE (the 1.58 GB cache through the relay
# tunnel takes longer than the probe's budget as a host transfer).
@jax.jit
def _mk():
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    kv0 = jax.random.randint(k0, (B, L, H, TS, 2 * Dh), -127, 127, jnp.int8)
    sk0 = jax.random.uniform(k1, (B, L, H, TS)) * 0.01
    sv0 = jax.random.uniform(k1, (B, L, H, TS)) * 0.01
    q = jax.random.normal(k2, (B, H, K, Dh), jnp.bfloat16)
    rows = jax.random.randint(k3, (B, L, H, K, 2 * Dh), -127, 127, jnp.int8)
    skr = jax.random.uniform(k3, (B, L, H, K)) * 0.01
    svr = jax.random.uniform(k3, (B, L, H, K)) * 0.01
    anc = jnp.zeros((B, K, CAP), jnp.int32)
    t_idx = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
    flat = jnp.where(t_idx < CAP - 1, t_idx * K + anc, -1)
    flat_rep = jnp.repeat(flat, K, axis=2)
    return kv0, sk0, sv0, q, rows, skr, svr, flat_rep


kv0, sk0, sv0, q, rows, skr, svr, flat_rep = _mk()
jax.block_until_ready(kv0)
print("arrays ready", flush=True)


def timeit2(make):
    f1, f2 = make(N1), make(N2)
    jax.block_until_ready(f1()); jax.block_until_ready(f2())
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f1()); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(f2()); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def _wk_kv(step_ref, rows_ref, kvi_ref, kv_ref):
    kv_ref[...] = rows_ref[...]


def pallas_kv_write(kv, rows, step):
    T = TS // K
    kv6 = kv.reshape(B, L, H, T, K, 2 * Dh)
    rows6 = rows.reshape(B, L, H, 1, K, 2 * Dh)
    blk = lambda b, s: (b, 0, 0, s[0], 0, 0)
    spec = pl.BlockSpec((None, L, H, 1, K, 2 * Dh), blk)
    out = pl.pallas_call(
        _wk_kv,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct(kv6.shape, kv6.dtype),
        input_output_aliases={2: 0},
    )(step[None].astype(jnp.int32), rows6, kv6)
    return out.reshape(kv.shape)


def w_all(kv, sk, sv, pos, step):
    return (
        jax.lax.dynamic_update_slice_in_dim(kv, rows, pos, axis=3),
        jax.lax.dynamic_update_slice_in_dim(sk, skr, pos, axis=3),
        jax.lax.dynamic_update_slice_in_dim(sv, svr, pos, axis=3),
    )


def w_kv(kv, sk, sv, pos, step):
    return (jax.lax.dynamic_update_slice_in_dim(kv, rows, pos, axis=3), sk, sv)


def w_sc(kv, sk, sv, pos, step):
    return (
        kv,
        jax.lax.dynamic_update_slice_in_dim(sk, skr, pos, axis=3),
        jax.lax.dynamic_update_slice_in_dim(sv, svr, pos, axis=3),
    )


def w_pallas(kv, sk, sv, pos, step):
    return (
        pallas_kv_write(kv, rows, step),
        jax.lax.dynamic_update_slice_in_dim(sk, skr, pos, axis=3),
        jax.lax.dynamic_update_slice_in_dim(sv, svr, pos, axis=3),
    )


def loop(write_fn, n):
    @jax.jit
    def run(kv, sk, sv, q, flat_rep):
        def body(c):
            i, kv, sk, sv, acc = c
            for layer in range(L):
                acc = acc + da.ancestry_decode_attention_i8(
                    q + acc * 0.01, q, q, kv, sk, sv, flat_rep, layer)
            if write_fn is not None:
                step = jnp.minimum(i, CAP - 2)
                acc, kv, sk, sv = jax.lax.optimization_barrier((acc, kv, sk, sv))
                kv, sk, sv = write_fn(kv, sk, sv, step * K, step)
            return (i + 1, kv, sk, sv, acc)

        out = jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (0, kv, sk, sv, jnp.zeros_like(q)))
        return out[4].sum(), out[1].sum()
    return lambda: run(kv0, sk0, sv0, q, flat_rep)


@jax.jit
def _check():
    got = pallas_kv_write(kv0, rows, jnp.int32(3))
    want = jax.lax.dynamic_update_slice_in_dim(kv0, rows, 3 * K, axis=3)
    return jnp.all(got == want)


variants = [("r0 reads-only     ", None),
            ("r1 reads+dus-all  ", w_all),
            ("r1a reads+dus-kv  ", w_kv),
            ("r1b reads+dus-sc  ", w_sc)]
if os.environ.get("PROBE_PALLAS_WRITE", "0") == "1":
    print("checking pallas kv write...", flush=True)
    assert bool(_check()), "pallas kv write mismatch"
    print("pallas kv write correct", flush=True)
    variants.append(("r2 reads+pallas-kv", w_pallas))

for name, fn in variants:
    try:
        dt = timeit2(functools.partial(loop, fn))
        print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:300]}", flush=True)
