"""Probe: does tile alignment of the DUS offset decide the full-cache copy?

Same 6D cache, same while_loop DUS write, S (beam-slot stride) in
{5 (unaligned), 8 (tile-aligned)} — if 8 is fast and 5 slow, the fix is
padding beam slots to the sublane tile.
Also tests S=8 with the Dh axis widened to 128 lanes (2*Dh interleave).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

B, CAP, L, H, Dh = 32, 201, 6, 8, 64
N1, N2 = 20, 120


def timeit2(make, *args):
    f1, f2 = make(N1), make(N2)
    float(f1(*args)); float(f2(*args))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def dus_loop(S, lane):
    TS = CAP * S
    kv0 = jnp.zeros((B, 2, L, H, TS, lane), jnp.bfloat16)
    rows = jnp.ones((B, 2, L, H, S, lane), jnp.bfloat16)

    def make(n):
        @jax.jit
        def run(kv, rows):
            def body(c):
                i, kv = c
                kv = jax.lax.dynamic_update_slice_in_dim(
                    kv, rows, jnp.minimum(i, CAP - 2) * S, axis=4
                )
                return (i + 1, kv)
            _, kv = jax.lax.while_loop(
                lambda c: c[0] < n, body, (jnp.zeros((), jnp.int32), kv)
            )
            return kv.sum()
        return lambda kv=kv0, r=rows: run(kv, r)
    return make


for S, lane in [(5, Dh), (8, Dh), (8, 2 * Dh), (16, 2 * Dh)]:
    mb = B * 2 * L * H * CAP * S * lane * 2 / 1e6
    dt = timeit2(dus_loop(S, lane))
    print(f"S={S:2d} lane={lane:3d} cache={mb:5.0f} MB logical: {dt*1e3:.3f} ms/step")
