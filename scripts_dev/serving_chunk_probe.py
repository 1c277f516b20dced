"""Steady-state device time of the serving decode chunk, isolated from
admits/drains: fill all slots once, then time N back-to-back chunk
dispatches. Compares against the offline per-step cost at the same
batch to locate the ring-read overhead (VERDICT r4 weak #2 cause 1).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts_dev/serving_chunk_probe.py
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
CHUNK = int(os.environ.get("SRV_CHUNK", "16"))
RING = int(os.environ.get("SRV_RING", "256"))

cfg = _flagship_cfg()
model = MMS2UTModel(cfg)
rng = np.random.RandomState(0)
feats0 = rng.randn(2, 64, 80).astype(np.float32)
params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats0),
                    jnp.asarray([64, 64], np.int32), jnp.zeros((2, 8), jnp.int32))
srv = ContinuousServer(
    model, params, slots=SLOTS, beam_size=BEAM, ring=RING, chunk=CHUNK,
    enc_frames=1024, vocab_size=cfg.vocab_size, max_len_a=0.0,
    max_len_b=min(200, RING - 2),
    kv_cache_dtype="int8", admit_width=SLOTS,
)
state = srv.init_state(params)
# Admit a full pool (long budgets so nothing finishes during timing).
feats = jnp.asarray(rng.randn(SLOTS, 1024, 80), jnp.float32)
lens = jnp.full((SLOTS,), 1024, jnp.int32)
enc_out, enc_mask = srv._encode(params, feats, lens, (), ())
state = srv._admit(params, state, jnp.arange(SLOTS, dtype=jnp.int32),
                   jnp.ones((SLOTS,), bool), enc_out, enc_mask, lens)
state, done = srv._decode_chunk(params, state)  # compile
np.asarray(done)

# Two-point marginal with VALUE fetches (the relay acks dispatches
# eagerly; block_until_ready alone under-measures — memory: relay
# timing pitfall).
def run_n(n, st):
    t0 = time.perf_counter()
    for _ in range(n):
        st, done = srv._decode_chunk(params, st)
    np.asarray(done)
    return time.perf_counter() - t0, st

t4, state = run_n(4, state)
t64, state = run_n(64, state)
dt = (t64 - t4) / 60
print(f"slots={SLOTS} beam={BEAM} ring={RING} chunk={CHUNK}: "
      f"marginal {dt*1e3:.2f} ms/chunk = {dt*1e3/CHUNK:.3f} ms/step "
      f"(t4={t4*1e3:.1f} ms t64={t64*1e3:.1f} ms)", flush=True)
