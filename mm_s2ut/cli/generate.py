"""``python -m mm_s2ut.cli.generate`` — batch beam-search generation.

Replaces ``fairseq-generate`` over a data split (SURVEY.md §3.2; reference
scripts/textless/2_inference.sh:34-43): loads a Trainer checkpoint,
iterates the split with bucketed batches, runs the jitted beam search,
and writes ``generate-{subset}.txt`` with T-/H-/D- lines — byte-compatible
with the reference's downstream unit extraction
(grep "^D-" | sort -nk1 | cut -f3, scripts/3_generate_waveform.sh:24-26).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.generate")


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.generate")
    ap.add_argument("--model_path", required=True,
                    help="Trainer checkpoint dir; N colon-separated dirs "
                         "run a logit ensemble (fairseq --path a.pt:b.pt)")
    ap.add_argument("--gen-subset", default="test")
    ap.add_argument("--results-path", required=True)
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--max-len-a", type=float, default=None)
    ap.add_argument("--max-len-b", type=int, default=None)
    ap.add_argument("--kv-cache-dtype", default=None,
                    choices=["bfloat16", "int8", "int4"],
                    help="decode KV-cache storage (overrides the config)")
    args = ap.parse_args(argv)

    from mm_s2ut import registry
    from mm_s2ut.infer.generator import UnitGenerator, format_generation_output
    from mm_s2ut.inference import load_checkpoint

    paths = args.model_path.split(":")
    cfg, model, params = load_checkpoint(paths[0])
    if len(paths) > 1:
        # Logit-ensemble decoding (fairseq load_model_ensemble semantics,
        # reference mm_s2s_transformer.py:229): all checkpoints must share
        # the architecture of the first; UnitGenerator averages per-step
        # probabilities across them.
        import dataclasses

        def _arch_view(c):
            """ModelConfig as a comparable dict, dropping fields that do
            not change the decode function: data-file locations and
            pure-execution knobs. Everything else must match EXACTLY —
            members with coinciding param shapes but different semantics
            (heads, activation, normalize_before, …) would decode a
            meaningless probability average."""
            d = dataclasses.asdict(c.model)
            for k in (
                "checkpoint_activations", "sequence_parallel",
                "pipeline_stages", "pipeline_microbatches",
                "use_flash_attention",
            ):
                d.pop(k, None)

            def strip_paths(node):
                if isinstance(node, dict):
                    return {
                        k: strip_paths(v) for k, v in node.items()
                        if not k.endswith(("_path", "_root", "_dir", "_file"))
                    }
                if isinstance(node, list):
                    return [strip_paths(v) for v in node]
                return node

            return {"task": c.task, "model": strip_paths(d)}

        params = [params]
        ref_view = _arch_view(cfg)
        for p in paths[1:]:
            cfg_i, _, params_i = load_checkpoint(p)
            view_i = _arch_view(cfg_i)
            if view_i != ref_view:
                diffs = [
                    k for k in ref_view["model"]
                    if view_i["model"].get(k) != ref_view["model"][k]
                ]
                if cfg_i.task != cfg.task:
                    diffs.insert(0, "task")
                raise ValueError(
                    f"ensemble member {p} is incompatible with {paths[0]}: "
                    f"differing fields {diffs}"
                )
            params.append(params_i)
    if args.beam:
        cfg.generation.beam = args.beam
    if args.max_len_a is not None:
        cfg.generation.max_len_a = args.max_len_a
    if args.max_len_b is not None:
        cfg.generation.max_len_b = args.max_len_b
    if args.kv_cache_dtype is not None:
        cfg.generation.kv_cache_dtype = args.kv_cache_dtype

    task = registry.get_task(cfg.task)(cfg)
    # eos_token override (reference config/xm_transformer.yaml:7 via
    # fairseq SpeechToTextTask.build_generator): generation starts from
    # and stops on this symbol (the target lang tag on the xm path), and
    # lang tags are stripped from the emitted text.
    eos_id = bos_id = task.tgt_dict.eos()
    strip_ids = []
    if cfg.data.eos_token:
        idx = task.tgt_dict.index(cfg.data.eos_token)
        if idx == task.tgt_dict.unk():
            raise ValueError(
                f"data.eos_token {cfg.data.eos_token!r} not in the vocabulary"
            )
        eos_id = bos_id = idx
    strip_ids = [
        i for i, sym in enumerate(task.tgt_dict.symbols)
        if sym.startswith("<lang:")
    ]
    gen = UnitGenerator(
        model, params, cfg.generation,
        eos_id=eos_id, bos_id=bos_id,
        max_target_positions=cfg.model.max_target_positions,
    )

    out_dir = Path(args.results_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines: List[str] = []
    n = 0
    for batch in task.batch_iterator(args.gen_subset, shuffle=False):
        hypos = gen.generate(
            np.asarray(batch["src_features"]), np.asarray(batch["src_lengths"]),
            tuple(np.asarray(x) for x in batch.get("imgs_list", ())),
            tuple(np.asarray(x) for x in batch.get("img_masks_list", ())),
        )
        targets = [t[t != 1].tolist() for t in np.asarray(batch["target"])]
        lines.extend(
            format_generation_output(
                batch["id"].tolist(), hypos, task.tgt_dict, targets,
                nbest=cfg.generation.nbest, strip_ids=strip_ids,
            )
        )
        n += len(hypos)
    out_file = out_dir / f"generate-{args.gen_subset}.txt"
    out_file.write_text("\n".join(lines) + "\n")
    logger.info("generated %d samples -> %s", n, out_file)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
