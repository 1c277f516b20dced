"""Per-chunk latency + recompile probe for the prefix-reuse streaming path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/stream_pr_probe.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_log_compiles", True)

from mm_s2ut.config import ModelConfig, MultimodalConfig
from mm_s2ut.infer.streaming import StreamingS2ST
from mm_s2ut.models.mm_s2ut import MMS2UTModel

cfg = ModelConfig(encoder_layers=12, vocab_size=1004, dtype="bfloat16",
                  encoder_causal_attention=True,
                  multimodal=MultimodalConfig(multimodal_attention_type=None))
model = MMS2UTModel(cfg)
sr, shift, flen = 16000, 160, 400
total_frames = (int(10.0 * sr) - flen) // shift + 1
chunk_frames = 320 * sr // 1000 // shift
rng = np.random.RandomState(0)
feats0 = rng.randn(1, total_frames, 80).astype(np.float32)
params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats0[:, :64]),
                    jnp.asarray([64], np.int32), jnp.zeros((1, 3), jnp.int32))
max_len = 500

def run(seed, tag):
    feats = np.random.RandomState(seed).randn(1, total_frames, 80).astype(np.float32)
    srv = StreamingS2ST(model, params, chunk_frames=chunk_frames,
                        max_frames=total_frames + 4, beam=10, max_len=max_len,
                        prefix_reuse=True, max_new_tokens=48)
    for i, s in enumerate(range(0, total_frames, chunk_frames)):
        c = feats[:, s : min(s + chunk_frames, total_frames)]
        t0 = time.perf_counter()
        srv.feed(c)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"[{tag}] chunk {i}: {dt:8.1f} ms  committed={len(srv.committed)}", flush=True)
    t0 = time.perf_counter()
    fin = srv.finalize()
    print(f"[{tag}] finalize: {(time.perf_counter()-t0)*1e3:8.1f} ms  len={len(fin)}", flush=True)

run(1, "warm")
run(2, "meas")
