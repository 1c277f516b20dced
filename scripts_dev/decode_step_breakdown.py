"""Probe: decode-step time breakdown at configurable B/K (real TPU).

Times, as separate jitted scan-loops with realistic shapes:
  * the full beam_search (search logic + step),
  * scan(decode_step) alone (fixed cap, no search logic),
  * standalone replicas of each step component (ancestry kernel,
    fused-QKV + out-proj GEMMs, cross-attention, FFN, logits)
so the gap between the sum-of-parts and the measured step shows
scheduling/fusion losses. Two-point timing (N1 vs N2 scan lengths).
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer import beam_search as bs
from mm_s2ut.models.mm_s2ut import MMS2UTModel

B = int(os.environ.get("PROBE_B", "32"))
BEAM = int(os.environ.get("PROBE_K", "5"))
CAP = int(os.environ.get("PROBE_CAP", "201"))
N1, N2 = 20, 120
D, H, L, FFN, V, TENC = 512, 8, 6, 2048, 1004, 250
Dh = D // H
N = B * BEAM

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, 998, 80).astype(np.float32))
lens = jnp.full((B,), 998, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
masks = (jnp.zeros((B, 577), bool),)
params = model.init(
    jax.random.PRNGKey(0), feats, lens, np.zeros((B, 8), np.int32), imgs, masks
)
enc = model.apply(
    params, feats, lens, imgs, masks, None, deterministic=True,
    method=model.encode,
)


def timeit2(f, *a):
    """Two-point marginal time per scan step."""
    f1, f2 = f(N1), f(N2)
    float(f1(*a)); float(f2(*a))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*a)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*a)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


# --- full beam search --------------------------------------------------------
def full_search(n):
    @jax.jit
    def run(params, enc):
        st = model.apply(
            params, enc, n + 1, method=model.decode_init, kv_dtype=KV_DTYPE
        )
        st = bs.tile_state_for_beams(st, BEAM)
        seqs, scores = bs.beam_search(
            lambda t, s: model.apply(params, t, s, method=model.decode_step),
            st, B, beam_size=BEAM, max_len=n,
            eos_id=0, bos_id=2, pad_id=1, vocab_size=cfg.vocab_size,
        )
        return scores.sum()
    return run


# --- scan(decode_step) only --------------------------------------------------
KV_DTYPE = os.environ.get("PROBE_KV")  # None | "int8"


def step_only(n):
    @jax.jit
    def run(params, enc):
        st = model.apply(
            params, enc, CAP, method=model.decode_init, kv_dtype=KV_DTYPE
        )
        st = bs.tile_state_for_beams(st, BEAM)
        tok = jnp.full((N, 1), 5, jnp.int32)

        def body(carry, _):
            st = carry
            logits, st = model.apply(params, tok, st, method=model.decode_step)
            # freeze step so the cache write stays in-bounds over n>CAP iters
            st = {**st, "step": jnp.minimum(st["step"], CAP - 2)}
            return st, logits.sum()

        st, outs = jax.lax.scan(body, st, None, length=n)
        return outs.sum()
    return run


# --- standalone components ---------------------------------------------------
kv = jnp.zeros((B, L, H, CAP * BEAM, 2 * Dh), jnp.bfloat16)
anc = jnp.zeros((B, BEAM, CAP), jnp.int32)
t_idx = jnp.arange(CAP, dtype=jnp.int32)[None, None, :]
flat = jnp.where(t_idx < CAP - 1, t_idx * BEAM + anc, -1)
flat_rep = jnp.repeat(flat, BEAM, axis=2)
q = jnp.asarray(rng.randn(B, H, BEAM, Dh), jnp.bfloat16)
x_row = jnp.asarray(rng.randn(N, 1, D), jnp.bfloat16)
w_qkv = jnp.asarray(rng.randn(D, 3 * D), jnp.bfloat16) * 0.02
w_ffn1 = jnp.asarray(rng.randn(D, FFN), jnp.bfloat16) * 0.02
w_ffn2 = jnp.asarray(rng.randn(FFN, D), jnp.bfloat16) * 0.02
w_out = jnp.asarray(rng.randn(D, D), jnp.bfloat16) * 0.02
emb = jnp.asarray(rng.randn(V, D), jnp.bfloat16) * 0.02
enc_kv = jnp.asarray(rng.randn(B, 2, TENC, H, Dh), jnp.bfloat16)


def comp_kernel(n):
    from mm_s2ut.ops import decode_attention as da
    fn = da.ancestry_decode_attention if da.supported(kv) else da.reference

    @jax.jit
    def run(kv, q, flat_rep):
        def body(c, _):
            acc = c
            for layer in range(L):
                # feed acc back so the calls are NOT loop-invariant
                # (XLA hoists invariant calls out of the scan entirely)
                acc = acc + fn(q + acc * 0.01, q, q, kv, flat_rep, layer)
            return acc, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
        return out.sum()
    return lambda kv=kv, q=q, f=flat_rep: run(kv, q, f)


def comp_gemms(n):
    @jax.jit
    def run(x):
        def body(c, _):
            h = c
            for _ in range(L):
                qkv = h.reshape(N, D) @ w_qkv
                h = (qkv[:, :D] @ w_out).reshape(N, 1, D)
                h = h + ((h.reshape(N, D) @ w_ffn1) @ w_ffn2).reshape(N, 1, D)
            return h, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out.sum()
    return lambda x=x_row: run(x)


def comp_cross(n):
    @jax.jit
    def run(q, enc_kv):
        def body(c, _):
            acc = c
            for _ in range(L):
                s = jnp.einsum("bhkd,bthd->bhkt", acc, enc_kv[:, 0],
                               preferred_element_type=jnp.float32)
                w = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                acc = jnp.einsum("bhkt,bthd->bhkd", w, enc_kv[:, 1])
            return acc, ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out.sum()
    return lambda q=q, e=enc_kv: run(q, e)


def comp_logits(n):
    @jax.jit
    def run(x):
        def body(c, _):
            lg = c.reshape(N, D) @ emb.T
            return (lg[:, :D]).reshape(N, 1, D), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out.sum()
    return lambda x=x_row: run(x)


ROWS = {
    "step": ("scan(decode_step)", step_only, (params, enc)),
    "search": ("full beam_search ", full_search, (params, enc)),
    "kernel": ("kernel x6        ", comp_kernel, ()),
    "gemms": ("gemms x6         ", comp_gemms, ()),
    "cross": ("cross x6         ", comp_cross, ()),
    "logits": ("logits           ", comp_logits, ()),
}
only = os.environ.get("PROBE_ONLY")
keys = only.split(",") if only else list(ROWS)
print(f"B={B} K={BEAM} CAP={CAP} KV={KV_DTYPE}")
for key in keys:
    name, f, args = ROWS[key]
    dt = timeit2(f, *args)
    print(f"{name}: {dt*1e3:.3f} ms/step")
