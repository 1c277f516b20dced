"""Probe: is the self-attn decode kernel DMA-bound enough that int4
(half the slab bytes) is worth building?

Times ancestry_decode_attention_i8 at the bench shape (B=128 K=10
T·S=2010) vs a half-length slab (simulating int4's byte count), chained
in one scan with a data-dependent carry.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.ops import decode_attention as da

B, L, H, K, Dh = 128, 1, 8, 10, 64


def run(TS, steps=100):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
    kn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
    vn = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16) * 0.3
    kv = jnp.asarray(
        rng.randint(-127, 127, (B, L, H, TS, 2 * Dh)), jnp.int8
    )
    sk = jnp.asarray(rng.rand(B, L, H, TS), jnp.float32) * 0.01
    sv = jnp.asarray(rng.rand(B, L, H, TS), jnp.float32) * 0.01
    flat = jnp.asarray(rng.randint(0, TS, (B, K, TS)), jnp.int32)

    # Arrays must be jit ARGUMENTS: closed-over arrays are baked into the
    # HLO as constants, and the remote-compile relay rejects the >200 MB
    # request body (HTTP 413).
    @partial(jax.jit, static_argnames=("n",))
    def chain(q, kn, vn, kv, sk, sv, flat, n):
        def body(qc, _):
            out = da.ancestry_decode_attention_i8(qc, kn, vn, kv, sk, sv, flat, 0)
            return out.astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out.sum()

    args = (q, kn, vn, kv, sk, sv, flat)
    float(chain(*args, n=2))
    float(chain(*args, n=steps))

    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args, n=n))
            best = min(best, time.perf_counter() - t0)
        return best

    t2, tN = timed(2), timed(steps)
    return (tN - t2) / (steps - 2) * 1e3


for TS in (2010, 1005):
    ms = run(TS)
    bw = B * L * H * TS * 2 * Dh / ms * 1e3 / 1e9
    print(f"TS={TS}: {ms:.3f} ms/call  ({bw:.0f} GB/s effective on the slab)")
