"""Phase-level timing of the ContinuousServer host loop on TPU.

Wraps the jitted pieces with wall timers to attribute serving time:
admit (host prep + encode + admit dispatch), decode dispatch, drain sync
(np.asarray(done) + finisher fetches). Also reports chunk count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/serving_phase_probe.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from mm_s2ut.infer.serving import ContinuousServer, Request
from mm_s2ut.models.mm_s2ut import MMS2UTModel

SLOTS = int(os.environ.get("SRV_SLOTS", "64"))
BEAM = int(os.environ.get("SRV_BEAM", "10"))
N = int(os.environ.get("SRV_N", "128"))
CHUNK = int(os.environ.get("SRV_CHUNK", "16"))

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
rng = np.random.RandomState(0)
feats0 = rng.randn(2, 64, 80).astype(np.float32)
params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats0),
                    jnp.asarray([64, 64], np.int32), jnp.zeros((2, 8), jnp.int32))

def reqs(n, seed):
    r = np.random.RandomState(seed)
    out = []
    for i in range(n):
        T = int(r.randint(200, 1001))
        out.append(Request(uid=i, features=r.randn(T, 80).astype(np.float32),
                           length=T))
    return out

srv = ContinuousServer(
    model, params, slots=SLOTS, beam_size=BEAM, ring=256, chunk=CHUNK,
    enc_frames=1024, vocab_size=cfg.vocab_size, max_len_a=0.2, max_len_b=0,
    kv_cache_dtype="int8", admit_width=8,
)

stats = {"admit": 0.0, "dispatch": 0.0, "drain": 0.0, "chunks": 0, "admits": 0}
orig_decode, orig_admit, orig_encode = srv._decode_chunk, srv._admit, srv._encode

def timed_decode(params, state):
    t0 = time.perf_counter(); out = orig_decode(params, state)
    stats["dispatch"] += time.perf_counter() - t0; stats["chunks"] += 1
    return out

def timed_admit(*a, **k):
    t0 = time.perf_counter(); out = orig_admit(*a, **k)
    stats["admit"] += time.perf_counter() - t0; stats["admits"] += 1
    return out

srv._decode_chunk, srv._admit = timed_decode, timed_admit

import mm_s2ut.infer.serving as sv
orig_asarray = np.asarray

srv.run(reqs(min(N, 2 * SLOTS), 1))  # warm compile
for k in stats: stats[k] = 0 if isinstance(stats[k], int) else 0.0

t0 = time.perf_counter()
res = srv.run(reqs(N, 2))
total = time.perf_counter() - t0
assert len(res) == N
print(f"utt/s={N/total:.1f} total={total:.2f}s chunks={stats['chunks']} admits={stats['admits']}")
print(f"decode-dispatch wall: {stats['dispatch']:.2f}s  admit wall: {stats['admit']:.2f}s")
print(f"other (drain syncs + host): {total - stats['dispatch'] - stats['admit']:.2f}s")
print(f"per-chunk: {1e3*total/max(stats['chunks'],1):.1f} ms")
