import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
fbank_cfg = FbankConfig()
BEAM, MAX_LEN, SEC, SR = 5, 200, 10, 16000
rng = np.random.RandomState(0)
B = 64
wavs = jnp.asarray((rng.randn(B, SEC * SR) * 0.1).astype(np.float32))
lens = jnp.full((B,), SEC * SR, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
masks = (jnp.zeros((B, 577), bool),)
feats, fl = batched_log_mel_fbank(wavs * 32768.0, lens, fbank_cfg)
params = model.init(jax.random.PRNGKey(0), feats, fl, np.zeros((B, 8), np.int32), imgs, masks)


@jax.jit
def run(params, wavs):
    feats, fl = batched_log_mel_fbank(wavs * 32768.0, lens, fbank_cfg)
    enc = model.apply(params, feats, fl, imgs, masks, None, deterministic=True, method=model.encode)
    st = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init)
    st = tile_state_for_beams(st, BEAM)
    seqs, scores = beam_search(
        lambda t, s: model.apply(params, t, s, method=model.decode_step),
        st, B, beam_size=BEAM, max_len=MAX_LEN, eos_id=2, bos_id=2, pad_id=1,
        vocab_size=cfg.vocab_size,
    )
    return scores.sum() + seqs.sum()


print("compiling...", flush=True)
print("first:", float(run(params, wavs)), flush=True)
best = 1e9
for i in range(3):
    t0 = time.perf_counter()
    float(run(params, wavs))
    best = min(best, time.perf_counter() - t0)
print(f"B={B}: {best:.3f}s (incl relay rtt) -> {B / best:.1f} utt/s")
