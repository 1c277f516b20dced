"""Cold-start probe: wall time to first decoded batch for the beam-10
generation program, with and without a primed persistent compile cache.

Run twice in separate processes (the point is cross-process reuse):

  python scripts_dev/cold_start_probe.py prime   # cold compile, fills cache
                                                 # + serializes AOT execs
  python scripts_dev/cold_start_probe.py cold    # fresh process, primed cache
  python scripts_dev/cold_start_probe.py aot     # fresh process, loads the
                                                 # serialized executables —
                                                 # no tracing, no compile

Cache dir: MM_COLD_CACHE (default /tmp/mm_s2ut_cold_cache). Delete it to
re-measure the unprimed path. AOT dir: {cache}/aot.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("MM_COLD_CACHE", "/tmp/mm_s2ut_cold_cache")

import jax

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from __graft_entry__ import _flagship_cfg
from mm_s2ut.config import GenerationConfig
from mm_s2ut.infer.generator import UnitGenerator
from mm_s2ut.models.mm_s2ut import MMS2UTModel


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
    B = int(os.environ.get("COLD_B", "128"))
    beam = int(os.environ.get("COLD_BEAM", "10"))
    t0 = time.perf_counter()
    cfg = _flagship_cfg()
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    feats = rng.randn(B, 1000, 80).astype(np.float32)
    lens = np.full((B,), 1000, np.int32)
    imgs = (rng.randn(B, 577, 768).astype(np.float32),)
    masks = (np.zeros((B, 577), bool),)
    params = model.init(
        jax.random.PRNGKey(0), feats[:2, :64], lens[:2] * 0 + 64,
        np.zeros((2, 8), np.int32), tuple(x[:2] for x in imgs),
        tuple(x[:2] for x in masks),
    )
    t_init = time.perf_counter()
    gen = UnitGenerator(
        model, params,
        GenerationConfig(beam=beam, max_len_a=0.0, max_len_b=200,
                         kv_cache_dtype="int8"),
    )
    if mode == "aot":
        n = gen.aot_load(f"{CACHE}/aot")
        print(f"[aot] loaded {n} operating points "
              f"(+{time.perf_counter() - t_init:.1f}s)", flush=True)
        assert n >= 1, "run `prime` first"
    gen.generate(feats, lens, imgs, masks)
    t_done = time.perf_counter()
    if mode == "prime":
        gen.aot_save(f"{CACHE}/aot", B, 1000, img_shapes=((577, 768),))
        print(f"[prime] AOT serialized (+{time.perf_counter() - t_done:.1f}s)",
              flush=True)
    print(
        f"[{mode}] init {t_init - t0:.1f}s  first-batch "
        f"(trace+compile+run) {t_done - t_init:.1f}s  total {t_done - t0:.1f}s  "
        f"cache={CACHE} entries={len(os.listdir(CACHE)) if os.path.isdir(CACHE) else 0}",
        flush=True,
    )


if __name__ == "__main__":
    main()
