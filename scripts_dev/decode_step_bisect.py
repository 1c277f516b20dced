"""Bisect the decode-step cost: which part owns the ~1 ms.

Times the chained UnitDecoder.step at B=32 beam 5 with components
selectively stubbed via monkeypatching:
  full        — production step
  no-kernel   — self-attention returns out_proj(v_new) (kernel skipped)
  no-cross    — cross-attention returns its input
  no-ffn      — ffn returns 0
  no-logits   — output projection replaced by slice
  no-write    — cache write skipped
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mm_s2ut.models.decoder as D
from mm_s2ut.infer.beam_search import tile_state_for_beams
from mm_s2ut.models.decoder import UnitDecoder

import os
B, T_SRC, MAX_LEN, V = int(os.environ.get("BISECT_B", "32")), 250, 200, 1004
BEAM = int(os.environ.get("BISECT_BEAM", "5"))
KV = os.environ.get("BISECT_KV") or None


def build():
    dec = UnitDecoder(vocab_size=V, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    enc_out = jnp.asarray(rng.randn(B, T_SRC, 512), jnp.bfloat16)
    enc_mask = jnp.zeros((B, T_SRC), bool)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((B, 3), jnp.int32), enc_out, enc_mask)
    state = dec.apply(params, enc_out, enc_mask, MAX_LEN + 1,
                      method=UnitDecoder.init_state, kv_dtype=KV)
    state = tile_state_for_beams(state, BEAM)
    return dec, params, state


def timed_chain(dec, params, state, steps=60):
    @partial(jax.jit, static_argnames=("n",))
    def chain(params, state, n):
        def body(carry, _):
            st, tok = carry
            logits, st = dec.apply(params, tok, st, method=UnitDecoder.step)
            tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            return (st, tok), logits.sum()

        (_, _), acc = jax.lax.scan(
            body, (state, jnp.full((B * BEAM, 1), 4, jnp.int32)), length=n
        )
        return acc.sum()

    float(chain(params, state, n=2))
    float(chain(params, state, n=steps))

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(params, state, n=n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(steps) - t(2)) / (steps - 2) * 1e3


dec, params, state = build()
print(f"full      : {timed_chain(dec, params, state):.3f} ms/step", flush=True)

orig_self = D.UnitDecoder._self_attn_step
orig_core = D.UnitDecoder._step_core


def no_kernel(self, layer, x, kv, layer_idx, step_idx, flat_rep=None, kv_scales=None):
    attn = layer.self_attn
    ap = attn.variables["params"]
    w = jnp.concatenate(
        [ap["q_proj"]["kernel"], ap["k_proj"]["kernel"], ap["v_proj"]["kernel"]],
        axis=1,
    ).astype(self.dtype)
    b = jnp.concatenate(
        [ap["q_proj"]["bias"], ap["k_proj"]["bias"], ap["v_proj"]["bias"]]
    ).astype(self.dtype)
    qkv = x @ w + b
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    N = x.shape[0]
    out = attn.out_proj(v_new)
    return out, attn._split(k_new), attn._split(v_new)


D.UnitDecoder._self_attn_step = no_kernel
print(f"no-kernel : {timed_chain(dec, params, state):.3f} ms/step", flush=True)
D.UnitDecoder._self_attn_step = orig_self


def core_no_write(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx):
    logits, updates = orig_core(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx)
    return logits, {"self_kv": state["self_kv"]}


D.UnitDecoder._step_core = core_no_write
print(f"no-write  : {timed_chain(dec, params, state):.3f} ms/step", flush=True)
D.UnitDecoder._step_core = orig_core

# stub cross attention
import mm_s2ut.models.layers as L
orig_cross = None
for name in ("MultiHeadAttention",):
    cls = getattr(L, name, None)
    if cls is not None:
        orig_cross = cls.__call__

def fake_cross(self, x, key=None, bias=None, cache=None, static_kv=False,
               deterministic=True, **kw):
    return x, None, None

L.MultiHeadAttention.__call__ = fake_cross
try:
    print(f"no-cross  : {timed_chain(dec, params, state):.3f} ms/step", flush=True)
finally:
    L.MultiHeadAttention.__call__ = orig_cross


def core_no_scale_write(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx):
    logits, updates = orig_core(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx)
    kept = {k: v for k, v in updates.items() if k == "self_kv"}
    return logits, kept


def core_no_kv_write(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx):
    logits, updates = orig_core(self, prev_token, state, pos_offset, flat_rep, write_pos, plain_step_idx)
    kept = {k: v for k, v in updates.items() if k != "self_kv"}
    return logits, kept


if KV:
    D.UnitDecoder._step_core = core_no_scale_write
    print(f"no-scale-w: {timed_chain(dec, params, state):.3f} ms/step", flush=True)
    D.UnitDecoder._step_core = core_no_kv_write
    print(f"no-kv-w   : {timed_chain(dec, params, state):.3f} ms/step", flush=True)
    D.UnitDecoder._step_core = orig_core
