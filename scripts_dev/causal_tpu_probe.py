"""On-chip check of the causal/window flash-attention kernel (the CPU
tests run it in interpret mode; this validates the compiled Mosaic path)
plus a timing comparison vs the XLA folded-bias route at encoder shape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/causal_tpu_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut.ops.attention import flash_attention, reference_attention

B, T, H, D = 16, 512, 8, 64
q = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D), jnp.bfloat16)
mask = jnp.zeros((B, T), bool).at[1, T - 77 :].set(True)
bias = jnp.where(mask, -1e9, 0.0)[:, None, None, :]

for window in (0, 128):
    got = np.asarray(
        flash_attention(q, k, v, key_padding_mask=mask, causal=True, window=window)
    ).astype(np.float32)
    want = np.asarray(
        reference_attention(q * D**-0.5, k, v, bias, causal=True, window=window)
    ).astype(np.float32)
    err = np.abs(got - want).max()
    print(f"window={window}: max |flash - ref| = {err:.3e}")
    assert err < 3e-2, err  # bf16 inputs

fl = jax.jit(lambda q, k, v: flash_attention(
    q, k, v, key_padding_mask=mask, causal=True))
xl = jax.jit(lambda q, k, v: reference_attention(
    q * D**-0.5, k, v, bias, causal=True))
for name, fn in (("flash", fl), ("xla", xl)):
    fn(q, k, v).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        out = fn(q, k, v)
    out.block_until_ready()
    print(f"{name}: {(time.perf_counter() - t0) / 50 * 1e3:.3f} ms/call")
print("CAUSAL PROBE OK")
