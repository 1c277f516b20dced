"""Cost of the beam-search XLA shell at B=32 beam 10: full beam_search
per-step time vs the bare decoder step, plus standalone top_k costs."""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.models.decoder import UnitDecoder

B, T_SRC, V, BEAM = 32, 250, 1004, int(os.environ.get("PROBE_BEAM", "10"))
KV = os.environ.get("PROBE_KV") or None


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


dec = UnitDecoder(vocab_size=V, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
enc_out = jnp.asarray(rng.randn(B, T_SRC, 512), jnp.bfloat16)
enc_mask = jnp.zeros((B, T_SRC), bool)
params = dec.init(jax.random.PRNGKey(0), jnp.zeros((B, 3), jnp.int32), enc_out, enc_mask)


@partial(jax.jit, static_argnames=("max_len",))
def full_beam(params, enc_out, enc_mask, max_len):
    state = dec.apply(params, enc_out, enc_mask, max_len + 1,
                      method=UnitDecoder.init_state, kv_dtype=KV)
    state = tile_state_for_beams(state, BEAM)

    def step_fn(tokens, st):
        return dec.apply(params, tokens, st, method=UnitDecoder.step)

    return beam_search(
        step_fn, state, B, beam_size=BEAM, max_len=max_len,
        eos_id=2, bos_id=2, pad_id=1, vocab_size=V,
    )


for ml in (60, 200):
    s, sc = full_beam(params, enc_out, enc_mask, max_len=ml)
    float(sc.sum())
    t = t_best(lambda: float(full_beam(params, enc_out, enc_mask, max_len=ml)[1].sum()))
    print(f"beam_search max_len={ml}: {t:.3f} s total, {t/ml*1e3:.3f} ms/step", flush=True)

# standalone top_k cost at the beam-search shape
x = jnp.asarray(rng.randn(B, 2 * BEAM * V), jnp.float32)


@partial(jax.jit, static_argnames=("n", "k"))
def topk_loop(x, n, k):
    def body(c, _):
        v, i = jax.lax.top_k(c, 2 * BEAM)
        # data dependence: defeats loop-invariant hoisting of the top_k
        return c * (1.0 + 1e-12 * v.sum()), v.sum()

    _, outs = jax.lax.scan(body, x, length=n)
    return outs.sum()


float(topk_loop(x, n=50, k=2 * BEAM))
t50 = t_best(lambda: float(topk_loop(x, n=50, k=2 * BEAM)))
t2 = t_best(lambda: float(topk_loop(x, n=2, k=2 * BEAM)))
print(f"top_k({B}x{2*BEAM*V} -> {2*BEAM}): {(t50-t2)/48*1e3:.3f} ms/call", flush=True)
