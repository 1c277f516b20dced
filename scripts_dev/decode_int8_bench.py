"""Decode-step cost: bf16 vs int8 KV cache at the bench operating point.

Times `steps` chained decode steps inside one jitted scan (data-dependent
carry → no pipelining artifacts), beam 5 and 10 at B=32.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.models.decoder import UnitDecoder

B, T_SRC, MAX_LEN = 32, 250, 200
V = 1004


def run(beam, kv_dtype, steps=50):
    dec = UnitDecoder(vocab_size=V, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    enc_out = jnp.asarray(rng.randn(B, T_SRC, 512), jnp.bfloat16)
    enc_mask = jnp.zeros((B, T_SRC), bool)
    tokens0 = jnp.zeros((B, 3), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), tokens0, enc_out, enc_mask)

    from mm_s2ut.infer.beam_search import tile_state_for_beams

    state = dec.apply(params, enc_out, enc_mask, MAX_LEN + 1,
                      method=UnitDecoder.init_state, kv_dtype=kv_dtype)
    state = tile_state_for_beams(state, beam)

    @partial(jax.jit, static_argnames=("n",))
    def chain(params, state, n):
        def body(carry, _):
            st, tok = carry
            logits, st = dec.apply(params, tok, st, method=UnitDecoder.step)
            tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            return (st, tok), logits.sum()

        (_, _), acc = jax.lax.scan(body, (state, jnp.full((B * beam, 1), 4, jnp.int32)), length=n)
        return acc.sum()

    float(chain(params, state, n=2))
    float(chain(params, state, n=steps))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(params, state, n=n))
            best = min(best, time.perf_counter() - t0)
        return best
    t_small, t_big = timed(2), timed(steps)
    ms = (t_big - t_small) / (steps - 2) * 1e3
    print(f"beam={beam:3d} kv={kv_dtype or 'bf16':5s}: {ms:.3f} ms/step", flush=True)


for beam in (5, 10):
    for kv in (None, "int8"):
        run(beam, kv)
