"""Probe: per-stage time of the e2e bench pipeline at configurable B.

Stages timed separately (two-point scan timing, real TPU):
  fbank → encoder(+fusion) → decode_init+tile → beam search → vocoder.
"""
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.models.hifigan import CodeHiFiGAN, HiFiGANConfig
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank

B = int(os.environ.get("PROBE_B", "8"))
BEAM = int(os.environ.get("PROBE_BEAM", "5"))
KV = os.environ.get("PROBE_KV") or None
MAX_LEN, SR, SECONDS = 200, 16000, 10
N1, N2 = 2, 8

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
voc_cfg = HiFiGANConfig()
vocoder = CodeHiFiGAN(voc_cfg, max_frames=4 * MAX_LEN, dtype=jnp.bfloat16)
fbank_cfg = FbankConfig()
rng = np.random.RandomState(0)
wavs = jnp.asarray((rng.randn(B, SECONDS * SR) * 0.1).astype(np.float32))
wav_lengths = jnp.full((B,), SECONDS * SR, jnp.int32)
imgs = (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),)
img_masks = (jnp.zeros((B, 577), bool),)

feats0, fl0 = batched_log_mel_fbank(wavs * 32768.0, wav_lengths, fbank_cfg)
params = model.init(
    jax.random.PRNGKey(0), feats0, fl0, np.zeros((B, 8), np.int32), imgs, img_masks
)
voc_params = vocoder.init(
    jax.random.PRNGKey(1), jnp.zeros((B, MAX_LEN), jnp.int32),
    jnp.full((B,), MAX_LEN, jnp.int32),
)
enc0 = model.apply(params, feats0, fl0, imgs, img_masks, None,
                   deterministic=True, method=model.encode)
units0 = jnp.asarray(rng.randint(0, 999, (B, MAX_LEN)), jnp.int32)
n_units0 = jnp.full((B,), MAX_LEN, jnp.int32)


def timeit2(make):
    f1, f2 = make(N1), make(N2)
    float(f1()); float(f2())
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f1()); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2()); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def stage_fbank(n):
    @jax.jit
    def run(wavs, wl):
        def body(c, _):
            f, l = batched_log_mel_fbank(wavs * 32768.0 + c, wl, fbank_cfg)
            return f.mean(), f.sum()
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return out
    return lambda: run(wavs, wav_lengths)


def stage_encode(n):
    @jax.jit
    def run(params, feats, fl):
        def body(c, _):
            enc = model.apply(
                params, feats + c, fl, imgs, img_masks, None,
                deterministic=True, method=model.encode,
            )
            return enc["encoder_out"].mean().astype(feats.dtype), ()
        out, _ = jax.lax.scan(body, jnp.zeros((), feats.dtype), None, length=n)
        return out
    return lambda: run(params, feats0, fl0)


def stage_beam(n):
    @jax.jit
    def run(params, enc_out, enc_mask):
        def body(c, _):
            enc = {"encoder_out": enc_out + c, "encoder_padding_mask": enc_mask,
                   "encoder_states": []}
            st = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init, kv_dtype=KV)
            st = tile_state_for_beams(st, BEAM)
            seqs, scores = beam_search(
                lambda t, s: model.apply(params, t, s, method=model.decode_step),
                st, B, beam_size=BEAM, max_len=MAX_LEN,
                eos_id=2, bos_id=2, pad_id=1, vocab_size=cfg.vocab_size,
            )
            return scores.mean().astype(enc_out.dtype), ()
        out, _ = jax.lax.scan(body, jnp.zeros((), enc_out.dtype), None, length=n)
        return out
    return lambda: run(params, enc0["encoder_out"], enc0["encoder_padding_mask"])


def stage_vocode(n):
    @jax.jit
    def run(voc_params, units, n_units):
        def body(c, _):
            from mm_s2ut.models.hifigan import vocode_bucketed
            wav, ns = vocode_bucketed(
                voc_cfg, voc_params, units + c, n_units,
                buckets=(MAX_LEN + 8, 2 * MAX_LEN, 4 * MAX_LEN),
                dtype=jnp.bfloat16)
            return c + (ns.sum() > 0).astype(jnp.int32) * 0, wav.sum()
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
        return out
    return lambda: run(voc_params, units0, n_units0)


print(f"B={B}")
for name, f in [
    ("fbank  ", stage_fbank),
    ("encode ", stage_encode),
    ("beam   ", stage_beam),
    ("vocode ", stage_vocode),
]:
    print(f"{name}: {timeit2(f)*1e3:8.2f} ms/batch")
