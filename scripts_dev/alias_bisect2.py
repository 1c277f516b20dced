"""Stage 2 of the carry-aliasing bisect: the REAL beam_search + UnitDecoder
at small shapes, counting cache-shaped copies in the optimized HLO.

Toggles: kv dtype (bf16 vs int8), single-segment vs segmented caps, with
and without the surrounding encode/vocode stages.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/alias_bisect2.py
"""
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.models.decoder import UnitDecoder

B, T_SRC, V, BEAM = 4, 16, 64, 5
DEC = dict(vocab_size=V, embed_dim=128, ffn_dim=256, num_layers=2,
           num_heads=2, dtype=jnp.bfloat16)


def count_cache_copies(txt):
    # any copy instruction whose result is a 5-D s8/bf16 array with 128 lanes
    n = 0
    for line in txt.splitlines():
        if "copy(" not in line:
            continue
        m = re.search(r"= (s8|bf16)\[(\d+),(\d+),(\d+),(\d+),128\]", line)
        if m:
            n += 1
    return n


def run(max_len, kv_dtype):
    dec = UnitDecoder(**DEC)
    rng = np.random.RandomState(0)
    enc_out = jnp.asarray(rng.randn(B, T_SRC, 128), jnp.bfloat16)
    enc_mask = jnp.zeros((B, T_SRC), bool)
    params = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 3), jnp.int32), enc_out, enc_mask
    )

    @jax.jit
    def search(params, enc_out, enc_mask):
        st = dec.apply(params, enc_out, enc_mask, max_len + 1,
                       method=UnitDecoder.init_state, kv_dtype=kv_dtype)
        st = tile_state_for_beams(st, BEAM)
        seqs, scores = beam_search(
            lambda t, s: dec.apply(params, t, s, method=UnitDecoder.step),
            st, B, beam_size=BEAM, max_len=max_len,
            eos_id=2, bos_id=2, pad_id=1, vocab_size=V,
        )
        return scores.sum()

    compiled = search.lower(params, enc_out, enc_mask).compile()
    return count_cache_copies(compiled.as_text())


for max_len, label in ((48, "1 segment  "), (100, "2 segments "),
                       (200, "3 segments ")):
    for kv in (None, "int8"):
        n = run(max_len, kv)
        print(f"max_len={max_len:4d} ({label}) kv={kv or 'bf16':5s}: "
              f"cache-shaped copies = {n}", flush=True)
