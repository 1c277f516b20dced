"""Probe: how much train-step time does the dense-attention path cost?

Measures bench.train_step_ms at the reference training shape (B=8,
T_src=1000 fbank frames -> 250... wait, bench uses T=1000 post-fbank with
conv/4 -> 250 encoder rows; the reference max-source-positions 4000 ->
1000 rows) under three configs:
  a) stock (attention_dropout=0.1 -> XLA dense path with (T,T) bias)
  b) attention_dropout=0.0 (flash kernel active in encoder)
  c) stock with use_flash_attention=False (pure dense, sanity)

Run on the real TPU:  python scripts_dev/train_attn_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import train_step_ms, train_flops, PEAK_BF16_FLOPS
from __graft_entry__ import _flagship_cfg
from mm_s2ut.models.mm_s2ut import MMS2UTModel


def run(tag, cfg, B=None, T=None, Tt=None):
    B = B or int(os.environ.get("PROBE_B", "8"))
    T = T or int(os.environ.get("PROBE_T", "1000"))
    Tt = Tt or int(os.environ.get("PROBE_TT", "100"))
    model = MMS2UTModel(cfg)
    ms, _ = train_step_ms(model, cfg, B=B, T_src=T, Tt=Tt)
    mfu = 100 * train_flops(B, T, Tt, cfg) / (ms / 1e3) / PEAK_BF16_FLOPS
    print(f"{tag:40s} B={B} T={T} {ms:8.2f} ms/step   MFU {mfu:5.2f}%",
          flush=True)
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    base = _flagship_cfg()
    configs = {
        "stock": ("stock (attn_dropout=0.1 -> flash+hash-dropout)", base),
        "nodrop": ("attn_dropout=0 (flash, no dropout)",
                   dataclasses.replace(base, attention_dropout=0.0)),
        "noflash": ("stock, use_flash off (dense)",
                    dataclasses.replace(base, use_flash_attention=False)),
        "nodrop_all": ("all dropout=0 (upper bound)",
                       dataclasses.replace(
                           base, attention_dropout=0.0, dropout=0.0,
                           activation_dropout=0.0)),
        "resid0": ("residual dropout=0 only",
                   dataclasses.replace(base, dropout=0.0)),
        "act0": ("activation dropout=0 only",
                 dataclasses.replace(base, activation_dropout=0.0)),
    }
    for key, (tag, cfg) in configs.items():
        if which in (key, "all") or key in sys.argv[1:]:
            run(tag, cfg)


if __name__ == "__main__":
    main()
