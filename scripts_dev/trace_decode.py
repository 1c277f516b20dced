import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer import beam_search as bs
from mm_s2ut.models.mm_s2ut import MMS2UTModel

cfg = _flagship_cfg(); model = MMS2UTModel(cfg)
B, BEAM, N = 8, 5, 50
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, 998, 80).astype(np.float32))
lens = jnp.full((B,), 998, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
masks = (jnp.zeros((B, 577), bool),)
params = model.init(jax.random.PRNGKey(0), feats, lens, np.zeros((B,8), np.int32), imgs, masks)
enc = model.apply(params, feats, lens, imgs, masks, None, deterministic=True, method=model.encode)

@jax.jit
def run(params, enc):
    st = model.apply(params, enc, N+1, method=model.decode_init)
    st = bs.tile_state_for_beams(st, BEAM)
    seqs, scores = bs.beam_search(
        lambda t,s: model.apply(params, t, s, method=model.decode_step),
        st, B, beam_size=BEAM, max_len=N, eos_id=2, bos_id=2, pad_id=1,
        vocab_size=cfg.vocab_size)
    return scores.sum()+seqs.sum()

float(run(params, enc))
try:
    with jax.profiler.trace("/tmp/decode_trace"):
        float(run(params, enc))
    print("trace ok -> /tmp/decode_trace")
except Exception as e:
    print("trace failed:", str(e)[:300])
