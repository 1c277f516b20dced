import gzip, json, collections, glob
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.models.hifigan import CodeHiFiGAN, HiFiGANConfig
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank

B, SECONDS, SR, BEAM, MAX_LEN = 8, 10, 16000, 5, 200
cfg = _flagship_cfg(); model = MMS2UTModel(cfg)
voc_cfg = HiFiGANConfig(); vocoder = CodeHiFiGAN(voc_cfg, max_frames=4*MAX_LEN, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
imgs = (jnp.asarray(rng.randn(B,577,768).astype(np.float32)),)
masks = (jnp.zeros((B,577), bool),)
lens = jnp.full((B,), SECONDS*SR, jnp.int32)
wavs = jnp.asarray((rng.randn(B, SECONDS*SR)*0.1).astype(np.float32))
fb = FbankConfig()
feats0, fl0 = batched_log_mel_fbank(wavs*32768., lens, fb)
params = model.init(jax.random.PRNGKey(0), feats0, fl0, np.zeros((B,8), np.int32), imgs, masks)
voc_params = vocoder.init(jax.random.PRNGKey(1), jnp.zeros((B, MAX_LEN), jnp.int32), jnp.full((B,), MAX_LEN, jnp.int32))

@jax.jit
def full(params, voc_params, wavs):
    feats, fl = batched_log_mel_fbank(wavs*32768., lens, fb)
    enc = model.apply(params, feats, fl, imgs, masks, None, deterministic=True, method=model.encode)
    st = model.apply(params, enc, MAX_LEN+1, method=model.decode_init)
    st = tile_state_for_beams(st, BEAM)
    seqs, scores = beam_search(lambda t,s: model.apply(params, t, s, method=model.decode_step),
        st, B, beam_size=BEAM, max_len=MAX_LEN, eos_id=2, bos_id=2, pad_id=1, vocab_size=cfg.vocab_size)
    best = seqs[:, 0, :]
    units = jnp.clip(best - 4, 0, voc_cfg.num_embeddings - 1)
    n_units = (best >= 4).astype(jnp.int32).sum(-1)
    wav_out, n_samples = vocoder.apply(voc_params, units, n_units)
    return scores.sum() + wav_out.astype(jnp.float32).sum()

float(full(params, voc_params, wavs))
with jax.profiler.trace("/tmp/full_trace"):
    float(full(params, voc_params, wavs))

f = sorted(glob.glob("/tmp/full_trace/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    data = json.load(fh)
events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and "dur" in e]
agg = collections.Counter(); cnt = collections.Counter()
for e in events:
    agg[e["name"]] += e["dur"]; cnt[e["name"]] += 1
print("top ops:")
for name, dur in agg.most_common(24):
    if name.startswith("$") or "Pjit" in name or "asarray" in name or "_value" in name or "trace" in name or "__exit__" in name:
        continue
    print(f"{dur/1e3:9.2f} ms x{cnt[name]:<4} {name[:80]}")
