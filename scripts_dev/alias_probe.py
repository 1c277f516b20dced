"""Is the reorder slowdown from new-buffer carries (aliasing) or the op?"""
import time
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer import beam_search as bs
from mm_s2ut.models.mm_s2ut import MMS2UTModel

cfg = _flagship_cfg(); model = MMS2UTModel(cfg)
B, BEAM = 8, 5
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, 998, 80).astype(np.float32))
lens = jnp.full((B,), 998, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
masks = (jnp.zeros((B, 577), bool),)
params = model.init(jax.random.PRNGKey(0), feats, lens, np.zeros((B,8), np.int32), imgs, masks)
enc = model.apply(params, feats, lens, imgs, masks, None, deterministic=True, method=model.encode)

def fake_reorder(state, indices, batch, k):
    # produces NEW buffers (breaks aliasing) without any gather
    new_layers = []
    for l in state["layers"]:
        s = l["self"]
        new_layers.append({"self": {"k": s["k"] + 0.0, "v": s["v"] + 0.0, "index": s["index"]}, "cross": l["cross"]})
    return {**state, "layers": new_layers}

def run_variant(reorder_fn, n_steps):
    orig = bs._reorder_cache
    bs._reorder_cache = reorder_fn
    try:
        @jax.jit
        def run(params, enc):
            st = model.apply(params, enc, n_steps+1, method=model.decode_init)
            st = bs.tile_state_for_beams(st, BEAM)
            seqs, scores = bs.beam_search(
                lambda t,s: model.apply(params, t, s, method=model.decode_step),
                st, B, beam_size=BEAM, max_len=n_steps, eos_id=2, bos_id=2,
                pad_id=1, vocab_size=cfg.vocab_size)
            return scores.sum()+seqs.sum()
        float(run(params, enc))
        best = 1e9
        for _ in range(3):
            t0=time.perf_counter(); float(run(params, enc)); best=min(best,time.perf_counter()-t0)
        return best
    finally:
        bs._reorder_cache = orig

for name, fn in [("copy-no-gather", fake_reorder)]:
    t50 = run_variant(fn, 50); t200 = run_variant(fn, 200)
    print(f"{name}: per-step {(t200-t50)/150*1e3:.2f} ms")
