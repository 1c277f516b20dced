"""Streaming S2ST latency benchmark.

Streams synthetic 16 kHz audio through StreamingS2ST (causal flagship
dims, random weights — latency depends on shapes, not weights) and
reports per-chunk wall latency after warmup, i.e. the added processing
delay a live client sees on top of the chunk cadence.

Operating points:

* HEADLINE — prefix-reuse incremental decode (the cli/stream default):
  each re-translation continues from the committed prefix's prefilled
  cache for ≤ max_new_tokens steps, so per-chunk cost stays FLAT as
  context accumulates (the round-4 full-redecode tail hit p95 1.1 s
  against a 320 ms cadence, BENCH_r04).
* full-redecode at the same beam — the round-4 baseline, kept for the
  comparison (its p95 is the cost curve prefix reuse removes);
* full-redecode at beam 1 — the canonical low-latency re-translation
  baseline.

Prints ONE JSON line:
  {"metric": "stream_chunk_p50_ms", "value": ..., "extras": {...}}

Env knobs: STREAM_CHUNK_MS (320), STREAM_SECONDS (10), STREAM_BEAM (10),
STREAM_LAYERS (12), STREAM_UTTS (3), STREAM_MAX_NEW (48),
STREAM_DECODE_EVERY (1), STREAM_SKIP_BASELINES.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    import jax as _jax

    try:  # persistent compile cache (standalone runs; bench.py sets it too)
        _jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    chunk_ms = int(os.environ.get("STREAM_CHUNK_MS", "320"))
    seconds = float(os.environ.get("STREAM_SECONDS", "10"))
    beam = int(os.environ.get("STREAM_BEAM", "10"))
    layers = int(os.environ.get("STREAM_LAYERS", "12"))
    utts = int(os.environ.get("STREAM_UTTS", "3"))
    max_new = int(os.environ.get("STREAM_MAX_NEW", "48"))
    decode_every = int(os.environ.get("STREAM_DECODE_EVERY", "1"))

    from mm_s2ut.config import ModelConfig, MultimodalConfig
    from mm_s2ut.infer.streaming import StreamingS2ST
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    cfg = ModelConfig(
        encoder_layers=layers, vocab_size=1004, dtype="bfloat16",
        encoder_causal_attention=True,
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)

    sr, shift, flen = 16000, 160, 400
    total_samples = int(seconds * sr)
    total_frames = (total_samples - flen) // shift + 1
    chunk_frames = chunk_ms * sr // 1000 // shift

    rng = np.random.RandomState(0)
    feats0 = rng.randn(1, total_frames, 80).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats0[:, :64]),
        jnp.asarray([64], np.int32), jnp.zeros((1, 3), jnp.int32),
    )

    # Random weights rarely emit EOS, so every re-translation runs to
    # max_len; cap it at a realistic unit budget (~25-50 units/s speech)
    # instead of the generation-config worst case.
    max_len = int(min(
        int(os.environ.get("STREAM_MAX_LEN", "500")),
        cfg.max_target_positions - 1,
    ))

    def make_srv(b=None, prefix_reuse=False, every=1):
        return StreamingS2ST(
            model, params, chunk_frames=chunk_frames,
            max_frames=total_frames + 4, beam=b or beam, max_len=max_len,
            prefix_reuse=prefix_reuse, max_new_tokens=max_new,
            decode_every=every,
        )

    def run_utt(srv, seed: int):
        # One session serves every utterance (srv.reset() keeps the
        # compiled programs — a production streaming server's shape);
        # fresh sessions re-paid seconds of per-shape compiles per
        # utterance and polluted p95 with compile time, not decode time.
        srv.reset()
        feats = np.random.RandomState(seed).randn(
            1, total_frames, 80
        ).astype(np.float32)
        lat = []
        for s in range(0, total_frames, chunk_frames):
            c = feats[:, s : min(s + chunk_frames, total_frames)]
            t0 = time.perf_counter()
            srv.feed(c)
            lat.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        final = srv.finalize()
        fin_ms = (time.perf_counter() - t0) * 1e3
        return lat, fin_ms, len(final), len(srv.committed)

    def measure(b=None, prefix_reuse=False, every=1):
        srv = make_srv(b=b, prefix_reuse=prefix_reuse, every=every)
        run_utt(srv, 1)  # warmup: compiles every feed/search shape
        lats, fins, ratios = [], [], []
        for u in range(utts):
            lat, fin, n_final, n_comm = run_utt(srv, 2 + u)
            lats += lat
            fins.append(fin)
            ratios.append(n_comm / max(1, n_final))
        lats = np.asarray(lats)
        return {
            "p50_ms": round(float(np.percentile(lats, 50)), 3),
            "p95_ms": round(float(np.percentile(lats, 95)), 3),
            "p99_ms": round(float(np.percentile(lats, 99)), 3),
            "max_ms": round(float(lats.max()), 3),
            "finalize_ms": round(float(np.mean(fins)), 3),
            "commit_ratio": round(float(np.mean(ratios)), 3),
            "realtime_ok": bool(np.percentile(lats, 95) < chunk_ms),
        }

    # HEADLINE: prefix-reuse at the offline beam (cli/stream default).
    pr = measure(prefix_reuse=True, every=decode_every)
    out = {
        "metric": "stream_chunk_p50_ms",
        "value": pr["p50_ms"],
        "unit": "ms",
        "extras": {
            "chunk_ms": chunk_ms,
            "beam": beam,
            "encoder_layers": layers,
            "audio_seconds": seconds,
            "mode": "prefix_reuse",
            "max_new_tokens": max_new,
            "decode_every": decode_every,
            **{k: pr[k] for k in (
                "p95_ms", "p99_ms", "max_ms", "finalize_ms",
                "commit_ratio", "realtime_ok",
            )},
        },
    }
    if not os.environ.get("STREAM_SKIP_BASELINES"):
        # Round-4 baselines: full re-decode at the offline beam and at
        # beam 1 (cost grows with the accumulated prefix by design).
        full = measure(prefix_reuse=False)
        for k in ("p50_ms", "p95_ms", "realtime_ok", "commit_ratio"):
            out["extras"][f"full_{k}"] = full[k]
        if beam != 1:
            g = measure(b=1, prefix_reuse=False)
            out["extras"]["beam1_p50_ms"] = g["p50_ms"]
            out["extras"]["beam1_p95_ms"] = g["p95_ms"]
            out["extras"]["beam1_realtime_ok"] = g["realtime_ok"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
