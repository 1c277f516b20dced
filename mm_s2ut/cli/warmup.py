"""``python -m mm_s2ut.cli.warmup`` — pre-compile the decode programs.

Cold-start mitigation: the beam-10 S2ST pipeline costs minutes of XLA
compile time on first contact (273.7 s measured for the bench program on
v5e, BENCH_r03). This tool traces + compiles the generation (and
optionally serving) programs for a model dir at the operating points you
plan to serve, landing the executables in the persistent compilation
cache (``JAX_COMPILATION_CACHE_DIR``, defaulted to ``~/.cache/mm_s2ut_jax``
by ``mm_s2ut.cli``). Ship or bake that cache directory alongside the
model dir and any later process — serving start, ``cli.generate``,
``cli.inference_all`` — loads the compiled program in seconds instead of
recompiling. The fairseq reference has no analog (eager torch pays no
compile, and 10-100× the per-step cost instead).

  python -m mm_s2ut.cli.warmup --model_path ckpt --batch-sizes 8,128
  python -m mm_s2ut.cli.warmup --model_path ckpt --serving --slots 64
"""
from __future__ import annotations

import argparse
import logging
import time
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.warmup")


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.warmup")
    ap.add_argument("--model_path", required=True, help="Trainer checkpoint dir")
    ap.add_argument("--batch-sizes", default="8",
                    help="comma-separated generation batch sizes to compile")
    ap.add_argument("--max-frames", type=int, default=1024,
                    help="padded source frames per compiled program")
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--kv-cache-dtype", default=None,
                    choices=["bfloat16", "int8", "int4"])
    ap.add_argument("--serving", action="store_true",
                    help="also compile the continuous-batching serving "
                         "programs (encode/admit/decode-chunk)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--ring", type=int, default=0,
                    help="serving ring size; 0 derives it from the "
                         "generation budget (a*max_frames + b)")
    ap.add_argument("--aot", default=None, metavar="DIR",
                    help="also serialize the compiled generate executables "
                         "per batch size (UnitGenerator.aot_save) so a "
                         "restarted process can aot_load them with zero "
                         "tracing/compilation")
    args = ap.parse_args(argv)

    import jax.numpy as jnp  # noqa: F401  (forces jax init after cli cache env)

    from mm_s2ut.config import GenerationConfig  # noqa: F401
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.inference import load_checkpoint

    t0 = time.perf_counter()
    cfg, model, params = load_checkpoint(args.model_path)
    if args.beam:
        cfg.generation.beam = args.beam
    if args.kv_cache_dtype:
        cfg.generation.kv_cache_dtype = args.kv_cache_dtype
    gen = UnitGenerator(
        model, params, cfg.generation,
        max_target_positions=cfg.model.max_target_positions,
    )
    rng = np.random.RandomState(0)
    mm = cfg.model.multimodal
    n_imgs = len(mm.image_feat_path) or len(mm.image_feat_dim)
    for bs in [int(b) for b in args.batch_sizes.split(",") if b]:
        t = time.perf_counter()
        feats = rng.randn(bs, args.max_frames, 80).astype(np.float32)
        lens = np.full((bs,), args.max_frames, np.int32)
        imgs = tuple(
            rng.randn(bs, 8, d).astype(np.float32)
            for d in mm.image_feat_dim[:n_imgs]
        )
        masks = tuple(np.zeros((bs, 8), bool) for _ in imgs)
        gen.generate(feats, lens, imgs, masks)
        logger.info(
            "compiled generate B=%d frames=%d beam=%d in %.1fs",
            bs, args.max_frames, cfg.generation.beam,
            time.perf_counter() - t,
        )
        if args.aot:
            t = time.perf_counter()
            out = gen.aot_save(
                args.aot, bs, args.max_frames,
                img_shapes=tuple((8, d) for d in mm.image_feat_dim[:n_imgs]),
            )
            logger.info("AOT serialized %s (+%.1fs)", out,
                        time.perf_counter() - t)
    if args.serving:
        from mm_s2ut.infer.serving import ContinuousServer, Request

        g = cfg.generation
        t = time.perf_counter()
        # Use the REAL generation budget and size the ring to it — a
        # clamped budget compiles a program the production server would
        # never request, making the priming useless. The budget includes
        # the max_len_a·src_frames term (serving.py slot_max computes
        # a·len + b in the raw-frame domain), so a server configured with
        # max_len_a > 0 reuses the primed executable.
        budget = int(np.ceil(g.max_len_a * args.max_frames)) + g.max_len_b
        ring = args.ring or int(2 ** np.ceil(np.log2(max(budget + 2, 8))))
        srv = ContinuousServer(
            model, params, slots=args.slots, beam_size=g.beam,
            ring=ring, chunk=args.chunk, enc_frames=args.max_frames,
            vocab_size=cfg.model.vocab_size, len_penalty=g.len_penalty,
            max_len_a=g.max_len_a, max_len_b=g.max_len_b,
            kv_cache_dtype=g.kv_cache_dtype,
        )
        srv.run([
            Request(uid=i, features=rng.randn(64, 80).astype(np.float32),
                    length=64)
            for i in range(min(2, args.slots))
        ])
        logger.info(
            "compiled serving slots=%d chunk=%d in %.1fs",
            args.slots, args.chunk, time.perf_counter() - t,
        )
    logger.info("warmup done in %.1fs — cache primed", time.perf_counter() - t0)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
