"""Benchmark suite — one JSON line per BASELINE.json config.

  1. fbank → k-means unit quantization, single 10 s wav (CPU-eligible path)
  2. speech-only S2UT transformer-small, greedy decode, batch 8
  3. ViT-B/16 batched image feature extraction
  4/5. covered by the repo-root bench.py headline (full multimodal beam-5
       + HiFi-GAN, reported there)

Run: python benchmarks/bench_suite.py [--configs 1 2 3]
Timing: two-point (small vs large iteration counts inside one program)
to cancel the dev-tunnel dispatch latency.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

# Runnable as `python benchmarks/bench_suite.py` (the repo root is not an
# installed package): make repo-root imports (mm_s2ut, bench,
# __graft_entry__) resolve.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _two_point(run_n, n1, n2):
    float(run_n(n1)); float(run_n(n2))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(run_n(n1)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run_n(n2)); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return max(best, 1e-9)


def bench_fbank_kmeans():
    import jax
    import jax.numpy as jnp

    from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank
    from mm_s2ut.ops.kmeans import kmeans_assign

    SR, SEC = 16000, 10
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(1, SEC * SR) * 0.1).astype(np.float32))
    lens = jnp.asarray([SEC * SR], jnp.int32)
    centroids = jnp.asarray(rng.randn(1000, 80).astype(np.float32))
    cfg = FbankConfig()

    @partial(jax.jit, static_argnames=("n",))
    def run_n(n):
        def step(c, _):
            # carry-dependent input so XLA can't hoist the body (LICM)
            feats, fl = batched_log_mel_fbank(
                wav * 32768.0 + c.astype(wav.dtype) * 1e-9, lens, cfg
            )
            units = kmeans_assign(feats[0], centroids)
            return c + units.sum() + fl.sum(), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.int64), None, length=n)
        return out

    per = _two_point(run_n, 2, 20)
    print(json.dumps({
        "metric": "fbank_kmeans_10s_wav_latency_ms",
        "value": round(per * 1e3, 3), "unit": "ms",
        "vs_baseline": None,
        "extra": {"rtf_x_realtime": round(SEC / per, 1)},
    }))


def bench_speech_only_greedy():
    import jax
    import jax.numpy as jnp

    from mm_s2ut.config import ModelConfig, MultimodalConfig
    from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
    from mm_s2ut.models.mm_s2ut import MMS2UTModel
    from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank

    cfg = ModelConfig(
        arch="mm_s2ut_transformer_small",
        encoder_embed_dim=256, encoder_ffn_embed_dim=1024, encoder_layers=6,
        encoder_attention_heads=4, decoder_embed_dim=256,
        decoder_ffn_embed_dim=1024, decoder_layers=3, decoder_attention_heads=4,
        vocab_size=1004, dtype="bfloat16",
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    B, SR, SEC, MAX_LEN = 8, 16000, 10, 200
    rng = np.random.RandomState(0)
    wavs = jnp.asarray((rng.randn(B, SEC * SR) * 0.1).astype(np.float32))
    lens = jnp.full((B,), SEC * SR, jnp.int32)
    fb = FbankConfig()
    feats, fl = batched_log_mel_fbank(wavs * 32768.0, lens, fb)
    params = model.init(jax.random.PRNGKey(0), feats, fl, np.zeros((B, 8), np.int32))

    @partial(jax.jit, static_argnames=("n",))
    def run_n_p(params, n):
        def step(c, _):
            feats, fl = batched_log_mel_fbank(
                wavs * 32768.0 + (c * 1e-12).astype(wavs.dtype), lens, fb
            )
            enc = model.apply(params, feats, fl, (), (), None,
                              deterministic=True, method=model.encode)
            st = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init)
            st = tile_state_for_beams(st, 1)  # greedy = beam 1
            seqs, scores = beam_search(
                lambda t, s: model.apply(params, t, s, method=model.decode_step),
                st, B, beam_size=1, max_len=MAX_LEN, eos_id=2, bos_id=2,
                pad_id=1, vocab_size=cfg.vocab_size,
            )
            return c + scores.sum() + seqs.sum(), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=n)
        return out

    run_n = lambda n: run_n_p(params, n)
    per = _two_point(run_n, 1, 5)
    print(json.dumps({
        "metric": "s2ut_small_greedy_utterances_per_sec",
        "value": round(B / per, 3), "unit": "utt/s/chip",
        "vs_baseline": None,
        "extra": {"batch": B, "decode_steps": MAX_LEN},
    }))


def bench_vit_features():
    import jax
    import jax.numpy as jnp

    from mm_s2ut.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig()  # B/16 @ 384 → (577, 768)
    model = VisionTransformer(cfg, dtype=jnp.bfloat16)
    B = 16
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, 384, 384, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pixels[:1])

    @partial(jax.jit, static_argnames=("n",))
    def run_n_p(params, n):
        def step(c, _):
            # carry-dependent input so XLA can't hoist the body (LICM)
            feats, _ = model.apply(params, pixels + (c * 1e-12).astype(pixels.dtype))
            return c + feats.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=n)
        return out

    run_n = lambda n: run_n_p(params, n)
    per = _two_point(run_n, 5, 45)
    print(json.dumps({
        "metric": "vit_b16_384_images_per_sec",
        "value": round(B / per, 1), "unit": "img/s/chip",
        "vs_baseline": None,
        "extra": {"batch": B, "tokens": cfg.seq_len},
    }))




def bench_train_step():
    """Flagship train step at the reference operating point (~max-tokens
    8000: batch 8 x ~10 s sources), bf16 forward, fp32 Adam."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from mm_s2ut import registry
    from mm_s2ut.config import TrainConfig
    from mm_s2ut.train.optimizer import build_optimizer
    from mm_s2ut.train.trainer import TrainState, make_train_step

    cfg = _flagship_cfg()
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    model = MMS2UTModel(cfg)
    B, T, Tt = 8, 998, 256
    rng = np.random.RandomState(0)
    batch = {
        "src_features": jnp.asarray(rng.randn(B, T, 80).astype(np.float32)),
        "src_lengths": jnp.full((B,), T, jnp.int32),
        "prev_output_tokens": jnp.asarray(rng.randint(4, 1000, (B, Tt)), jnp.int32),
        "target": jnp.asarray(rng.randint(4, 1000, (B, Tt)), jnp.int32),
        "imgs_list": (jnp.asarray(rng.randn(B, 577, 768).astype(np.float32)),),
        "img_masks_list": (jnp.zeros((B, 577), bool),),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["src_features"], batch["src_lengths"],
        batch["prev_output_tokens"], batch["imgs_list"], batch["img_masks_list"],
    )
    tx = build_optimizer(TrainConfig(update_freq=1))
    state = TrainState.create(params, tx)
    criterion = registry.get_criterion("speech_to_unit")
    step = make_train_step(model, criterion, tx, {"label_smoothing": 0.2})

    @partial(jax.jit, static_argnames=("n",))
    def run_n(state, n):
        def body(c, _):
            st, i = c
            st, m = step(st, batch, jax.random.PRNGKey(0))
            return (st, i + m["loss"]), None
        (st, acc), _ = jax.lax.scan(body, (state, jnp.zeros(())), None, length=n)
        return acc

    run = lambda n: run_n(state, n)
    per = _two_point(run, 1, 5)
    frames = B * T
    # One FLOP model for the whole repo: bench.train_flops (the previous
    # ad-hoc sum here double-counted the cross K/V projections and priced
    # causal self-attention at full cost, overstating MFU).
    import bench as root_bench

    train_flops = root_bench.train_flops(B, T, Tt, cfg)
    print(json.dumps({
        "metric": "train_step_seconds",
        "value": round(per, 4), "unit": "s/step",
        "vs_baseline": None,
        "extra": {"batch": B, "src_frames": T, "tgt_tokens": B * Tt,
                  "source_frames_per_sec": round(frames / per, 0),
                  "model_tflops_per_step": round(train_flops / 1e12, 3),
                  "mfu_pct": round(100 * train_flops / per / root_bench.PEAK_BF16_FLOPS, 2)},
    }))


BENCHES = {"1": bench_fbank_kmeans, "2": bench_speech_only_greedy, "3": bench_vit_features, "train": bench_train_step}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["1", "2", "3"])
    args = ap.parse_args()
    for c in args.configs:
        BENCHES[c]()
