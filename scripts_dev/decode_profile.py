"""Probe: where does decode-step time go at B=8 beam=5?

Compares full beam search vs a no-reorder variant (correctness off) and a
decoder-step-only loop, on the real TPU, two-point timing.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer import beam_search as bs
from mm_s2ut.models.mm_s2ut import MMS2UTModel

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
B, BEAM, MAX_LEN, S = 8, 5, 200, 250
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, 998, 80).astype(np.float32))
lens = jnp.full((B,), 998, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
masks = (jnp.zeros((B, 577), bool),)
params = model.init(jax.random.PRNGKey(0), feats, lens, np.zeros((B, 8), np.int32), imgs, masks)
enc = model.apply(params, feats, lens, imgs, masks, None, deterministic=True, method=model.encode)


def make_runner(reorder: bool, n_steps: int):
    orig = bs._reorder_cache

    @jax.jit
    def run(params, enc):
        st = model.apply(params, enc, n_steps + 1, method=model.decode_init)
        st = bs.tile_state_for_beams(st, BEAM)
        if not reorder:
            bs._reorder_cache = lambda s, i, b, k: s  # probe only
        try:
            seqs, scores = bs.beam_search(
                lambda t, s: model.apply(params, t, s, method=model.decode_step),
                st, B, beam_size=BEAM, max_len=n_steps,
                eos_id=2, bos_id=2, pad_id=1, vocab_size=cfg.vocab_size,
            )
        finally:
            bs._reorder_cache = orig
        return scores.sum() + seqs.sum()

    return run


def timeit(f, *a):
    float(f(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


for label, reorder in [("full", True), ("no-reorder", False)]:
    t50 = timeit(make_runner(reorder, 50), params, enc)
    t200 = timeit(make_runner(reorder, 200), params, enc)
    per_step = (t200 - t50) / 150
    print(f"{label}: per-step {per_step * 1e3:.2f} ms (t50={t50:.3f} t200={t200:.3f})")
