"""Benchmark: continuous-batching serving vs static batching on a
mixed-length workload (flagship model, one TPU chip).

The reference's only inference driver is fairseq-generate
(scripts/textless/2_inference.sh): static batches where every utterance
pays the decode budget of its batch's longest member. The serving loop
(infer/serving.py) refills finished slots from a request queue at jitted
chunk boundaries, so per-utterance cost tracks each utterance's OWN
``max_len_a·src + max_len_b`` budget.

Workload: N requests with source durations uniform in [2 s, 10 s]
(fbank frames 200..1000), budget = 0.2·src_frames (40..200 decode steps,
mean ≈ 120). Three measurements, same model/params/requests:

  * serving:        ContinuousServer, ``slots`` pool, int8 KV.
  * static-arrival: offline beam_search over arrival-order batches of
    ``slots``; every batch decodes to the 200-step worst case (what a
    static server must provision for).
  * static-sorted:  length-sorted batches, per-batch budget bucketed to
    {64, 128, 200} (the strongest static baseline: fairseq-generate's
    length-sorted batching + per-batch max-len early stop).

Prints one JSON line per measurement. Env overrides: SRV_SLOTS, SRV_BEAM,
SRV_N (requests per run), SRV_KV, SRV_CHUNK.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[serving-bench +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_cfg
    from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
    from mm_s2ut.infer.serving import ContinuousServer, Request
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    SLOTS = int(os.environ.get("SRV_SLOTS", "64"))
    BEAM = int(os.environ.get("SRV_BEAM", "10"))
    N_REQ = int(os.environ.get("SRV_N", str(4 * SLOTS)))
    KV = os.environ.get("SRV_KV", "int8")
    CHUNK = int(os.environ.get("SRV_CHUNK", "16"))
    ENC_FRAMES = 1024  # 10 s source, padded
    BUDGET_A = 0.2  # decode budget = 0.2·src_frames ∈ [40, 200]

    if os.environ.get("SRV_TINY"):  # CPU smoke mode: logic, not numbers
        jax.config.update("jax_platforms", "cpu")
        from mm_s2ut.config import ModelConfig, MultimodalConfig

        cfg = ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, vocab_size=40,
            dtype="float32",
            multimodal=MultimodalConfig(multimodal_attention_type=None),
        )
        SLOTS, BEAM, N_REQ, CHUNK, ENC_FRAMES = 2, 2, 6, 4, 64
    else:
        cfg = _flagship_cfg()
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)

    feats0 = jnp.asarray(rng.randn(SLOTS, ENC_FRAMES, 80), jnp.float32)
    lens0 = jnp.full((SLOTS,), ENC_FRAMES, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats0, lens0, np.zeros((SLOTS, 8), np.int32),
    )

    def make_requests(n, seed):
        r = np.random.RandomState(seed)
        reqs = []
        for i in range(n):
            src = int(r.randint(ENC_FRAMES // 5, ENC_FRAMES + 1))
            reqs.append(Request(
                uid=i, features=r.randn(src, 80).astype(np.float32), length=src,
            ))
        return reqs

    # ---- serving -----------------------------------------------------------
    ADMIT = int(os.environ.get("SRV_ADMIT", str(max(SLOTS // 8, 1))))
    SYNC = int(os.environ.get("SRV_SYNC", "4"))
    srv = ContinuousServer(
        model, params, slots=SLOTS, beam_size=BEAM, ring=256, chunk=CHUNK,
        enc_frames=ENC_FRAMES, eos_id=2, bos_id=2, pad_id=1,
        vocab_size=cfg.vocab_size, max_len_a=BUDGET_A, max_len_b=0,
        kv_cache_dtype=KV, admit_width=ADMIT, sync_every=SYNC,
    )

    # Two-point marginal with the SMALL workload an exact prefix of the
    # big one (same seed): different draws would leave a constant
    # length-distribution bias in the subtraction.
    big_reqs = make_requests(3 * N_REQ, 2)

    def run_serving(reqs):
        t0 = time.perf_counter()
        results = srv.run(list(reqs))
        dt = time.perf_counter() - t0
        assert len(results) == len(reqs)
        return dt

    log(f"serving warm (slots={SLOTS} beam={BEAM} kv={KV})")
    run_serving(big_reqs[:SLOTS])  # compile encode/admit/chunk
    log("serving timed runs")
    t_small = min(run_serving(big_reqs[:N_REQ]) for _ in range(2))
    t_big = min(run_serving(big_reqs) for _ in range(2))
    serving_utt = (3 * N_REQ - N_REQ) / max(t_big - t_small, 1e-9)
    # Host-phase attribution of the last big run (ContinuousServer.stats).
    phase = {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in getattr(srv, "stats", {}).items()}

    if os.environ.get("SRV_SKIP_STATIC"):  # serving-only iteration runs
        print(json.dumps({
            "metric": "serving_utt_per_sec",
            "value": round(serving_utt, 3), "unit": "utt/s/chip",
            "extra": {"slots": SLOTS, "beam": BEAM, "kv": KV, "chunk": CHUNK,
                      "admit_width": ADMIT, "sync_every": SYNC,
                      "n_marginal": 2 * N_REQ,
                      "phase": phase, "t_small_s": round(t_small, 3),
                      "t_big_s": round(t_big, 3)},
        }), flush=True)
        return

    # ---- static offline ----------------------------------------------------
    # One compiled program per budget bucket; batch rows pad to SLOTS.
    import functools

    @functools.partial(jax.jit, static_argnames=("budget",))
    def offline_batch(params, feats, lengths, budget):
        enc = model.apply(
            params, feats, lengths, (), (), None,
            deterministic=True, method=model.encode,
        )
        state = model.apply(
            params, enc, budget + 1, method=model.decode_init, kv_dtype=KV,
        )
        state = tile_state_for_beams(state, BEAM)
        seqs, scores = beam_search(
            lambda t, s: model.apply(params, t, s, method=model.decode_step),
            state, SLOTS, beam_size=BEAM, max_len=budget,
            eos_id=2, bos_id=2, pad_id=1, vocab_size=cfg.vocab_size,
        )
        return scores

    # Static-sorted budget buckets: smallest bucket ≥ the batch's max need.
    top = int(np.ceil(BUDGET_A * ENC_FRAMES))
    BUCKETS = (top,) if top < 64 else (64, 128, top)

    def run_static(reqs, sort):
        reqs = list(reqs)
        if sort:
            reqs.sort(key=lambda r: r.length)
        t0 = time.perf_counter()
        out = None
        for i in range(0, len(reqs), SLOTS):
            chunk_reqs = reqs[i : i + SLOTS]
            feats = np.zeros((SLOTS, ENC_FRAMES, 80), np.float32)
            # Pad rows take the batch-min length so they never set the budget.
            lens = np.full((SLOTS,), min(r.length for r in chunk_reqs), np.int32)
            for b, req in enumerate(chunk_reqs):
                feats[b, : req.length] = req.features
                lens[b] = req.length
            need = int(np.ceil(BUDGET_A * lens.max()))
            budget = next(x for x in BUCKETS if x >= min(need, BUCKETS[-1]))
            out = offline_batch(
                params, jnp.asarray(feats), jnp.asarray(lens), budget
            )
        float(out.sum())
        return time.perf_counter() - t0

    for sort, name in ((False, "static_arrival"), (True, "static_sorted")):
        log(f"{name} warm")
        run_static(big_reqs[:SLOTS], sort)  # compile buckets seen
        # pre-compile all buckets so timing isn't polluted
        for budget in BUCKETS:
            offline_batch(params, feats0, lens0, budget).block_until_ready()
        log(f"{name} timed runs")
        ts = min(run_static(big_reqs[:N_REQ], sort) for _ in range(2))
        tb = min(run_static(big_reqs, sort) for _ in range(2))
        utt = (3 * N_REQ - N_REQ) / max(tb - ts, 1e-9)
        print(json.dumps({
            "metric": f"{name}_utt_per_sec",
            "value": round(utt, 3), "unit": "utt/s/chip",
            "extra": {"slots": SLOTS, "beam": BEAM, "kv": KV,
                      "n_marginal": 2 * N_REQ},
        }), flush=True)

    print(json.dumps({
        "metric": "serving_utt_per_sec",
        "value": round(serving_utt, 3), "unit": "utt/s/chip",
        "extra": {"slots": SLOTS, "beam": BEAM, "kv": KV, "chunk": CHUNK,
                  "admit_width": ADMIT, "n_marginal": 2 * N_REQ,
                  "phase": phase, "t_small_s": round(t_small, 3),
                  "t_big_s": round(t_big, 3)},
    }), flush=True)


if __name__ == "__main__":
    main()
