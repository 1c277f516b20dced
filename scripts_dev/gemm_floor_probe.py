"""What does the raw MXU give us at the encoder's training shape?

Times (a) the encoder's bare matmul skeleton (12 layers x [4 DxD GEMMs +
2 D<->4D FFN GEMMs] on (B*T4, D) bf16 rows), (b) the same with LN +
residual + GELU-ish elementwise, and (c) the full encoder fwd — to
attribute the gap between analytic FLOPs and measured time.

  python scripts_dev/gemm_floor_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

PEAK = 197e12
ROWS, D, F, L = 2000, 512, 2048, 12


def marginal(make, n_small=20, n_big=220, reps=3):
    from bench import two_point_marginal

    fns = {n_small: make(n_small), n_big: make(n_big)}
    fns[n_small]()
    fns[n_big]()

    def timed(n):
        t0 = time.perf_counter()
        fns[n]()
        return time.perf_counter() - t0

    return two_point_marginal(timed, n_small, n_big, reps)[0]


def main():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(ROWS, D), jnp.bfloat16)
    Ws = [jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16) for _ in range(4)]
    Wf1 = jnp.asarray(rng.randn(D, F) * 0.02, jnp.bfloat16)
    Wf2 = jnp.asarray(rng.randn(F, D) * 0.02, jnp.bfloat16)

    def layer_gemms(x):
        for W in Ws:
            x = jax.lax.dot(x, W, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h = jax.lax.dot(x, Wf1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jax.lax.dot(h, Wf2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def layer_full(x):
        r = x
        x = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(x.astype(jnp.float32).var(-1, keepdims=True) + 1e-5).astype(jnp.bfloat16)
        for W in Ws:
            x = jax.lax.dot(x, W, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = r + x
        r = x
        h = jax.lax.dot(x, Wf1, preferred_element_type=jnp.float32)
        h = jax.nn.relu(h).astype(jnp.bfloat16)
        return r + jax.lax.dot(h, Wf2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    flops = 2 * ROWS * D * D * 4 + 2 * 2 * ROWS * D * F
    flops *= L

    def make_prog(layer):
        def mk(n):
            @jax.jit
            def prog(x):
                def body(c, _):
                    y = c
                    for _ in range(L):
                        y = layer(y)
                    return y, ()
                out, _ = jax.lax.scan(body, x, None, length=n)
                return out.astype(jnp.float32).sum()
            return lambda: jax.block_until_ready(prog(x0))
        return mk

    for tag, layer in (("gemms_only", layer_gemms), ("gemms+ln+res", layer_full)):
        sec = marginal(make_prog(layer))
        print(f"{tag:14s} {sec * 1e3:7.2f} ms  MFU {100 * flops / sec / PEAK:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
