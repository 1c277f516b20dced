"""``python -m mm_s2ut.cli.inference_all`` — full eval loop per subset.

Replaces the reference's shell orchestration (SURVEY.md C19; reference
scripts/textless/2_inference_all.sh:52-131): for each eval subset —
generate (beam search) → extract units from D- lines → vocode → ASR
transcribe → ASR-BLEU — with the same intermediate artifacts
(generate-*.txt, .unit, tts/*.wav, transcript.txt, bleu.txt) so results
remain inspectable and comparable file-for-file.
"""
from __future__ import annotations

import argparse
import logging
import re
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger("mm_s2ut.inference_all")


def _canary_mode() -> str:
    """Deliberate-fault canary for the acceptance chains (VERDICT r4 #8).

    ``MM_PARITY_CANARY=offset1:modN`` corrupts every extracted unit token
    (+1 mod N) at the decode→vocoder seam; ``MM_PARITY_CANARY=droptok``
    drops each text hypothesis's first word at the detokenize seam. The
    parity scripts assert the downstream BLEU collapses under either
    fault — proving the chain measures its own hypotheses rather than
    being accidentally insensitive.
    """
    import os

    return os.environ.get("MM_PARITY_CANARY", "")


def extract_units_from_generate(gen_file: Path, unit_file: Path) -> int:
    """grep "^D-" | sort -nk1 | cut -f3 (reference
    3_generate_waveform.sh:24-26), as code."""
    gen_file, unit_file = Path(gen_file), Path(unit_file)
    rows = []
    for line in gen_file.read_text().splitlines():
        m = re.match(r"^D-(\d+)\t[^\t]*\t(.*)$", line)
        if m:
            rows.append((int(m.group(1)), m.group(2)))
    rows.sort()
    canary = _canary_mode()
    if canary.startswith("offset1:mod"):
        n = int(canary[len("offset1:mod"):])
        logger.warning("MM_PARITY_CANARY active: units -> (u+1) mod %d", n)
        rows = [(i, " ".join(str((int(u) + 1) % n) for u in units.split()))
                for i, units in rows]
    unit_file.write_text("\n".join(u for _, u in rows) + "\n")
    return len(rows)


def extract_text_from_generate(
    gen_file: Path, hyp_file: Path, bpe_cfg: Optional[dict] = None
) -> int:
    """Enhanced-path hypothesis extraction: D- lines → detokenized text
    (SentencePiece pieces joined and ▁-despaced when the model's data
    config carries a bpe_tokenizer; reference enhanced/2_inference.sh +
    sacrebleu loop)."""
    gen_file, hyp_file = Path(gen_file), Path(hyp_file)
    sp = None
    if bpe_cfg:
        from mm_s2ut.data.sentencepiece import build_bpe_tokenizer

        sp = build_bpe_tokenizer(bpe_cfg)
    rows = []
    for line in gen_file.read_text().splitlines():
        m = re.match(r"^D-(\d+)\t[^\t]*\t(.*)$", line)
        if m:
            text = m.group(2)
            if sp is not None:
                text = sp.decode(text.split())
            rows.append((int(m.group(1)), text))
    rows.sort()
    if _canary_mode() == "droptok":
        logger.warning("MM_PARITY_CANARY active: dropping first hyp word")
        rows = [(i, " ".join(t.split()[1:])) for i, t in rows]
    hyp_file.write_text("\n".join(t for _, t in rows) + "\n")
    return len(rows)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.inference_all")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--subsets", nargs="+",
                    default=["valid", "test.2016", "test.2017", "test.coco"])
    ap.add_argument("--results-root", required=True)
    ap.add_argument("--mode", choices=["units", "text"], default="units",
                    help="units: textless chain (vocode→ASR→ASR-BLEU); "
                         "text: enhanced chain (detokenize→text BLEU, "
                         "reference scripts/enhanced/inference_all.sh)")
    ap.add_argument("--vocoder", default=None)
    ap.add_argument("--vocoder-cfg", default=None)
    ap.add_argument("--asr-model", default=None, help="HF wav2vec2-CTC dir")
    ap.add_argument("--reference-root", required=True,
                    help="dir with {subset}.txt reference transcripts")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--kv-cache-dtype", default=None,
                    choices=["bfloat16", "int8", "int4"],
                    help="decode KV-cache storage (overrides the config)")
    args = ap.parse_args(argv)

    if args.mode == "units" and not (args.vocoder and args.asr_model):
        ap.error("--mode units requires --vocoder and --asr-model")

    if args.mode == "text":
        return _text_mode(args)

    from mm_s2ut.cli import generate as gen_cli
    from mm_s2ut.cli import vocode as vocode_cli
    from mm_s2ut.eval.asr import generate_transcription
    from mm_s2ut.eval.bleu import score_from_files

    results = {}
    for subset in args.subsets:
        out = Path(args.results_root) / subset
        out.mkdir(parents=True, exist_ok=True)
        logger.info("=== %s ===", subset)
        gen_cli.main([
            "--model_path", args.model_path,
            "--gen-subset", subset,
            "--results-path", str(out),
            "--beam", str(args.beam),
            *(["--kv-cache-dtype", args.kv_cache_dtype]
              if args.kv_cache_dtype else []),
        ])
        gen_file = out / f"generate-{subset}.txt"
        unit_file = out / f"{subset}.unit"
        n = extract_units_from_generate(gen_file, unit_file)
        logger.info("extracted %d unit sequences", n)
        tts_dir = out / "tts"
        vocode_cli.main([
            "--in-code-file", str(unit_file),
            "--vocoder", args.vocoder,
            *(["--vocoder-cfg", args.vocoder_cfg] if args.vocoder_cfg else []),
            "--results-path", str(tts_dir),
            "--dur-prediction",
        ])
        transcript = out / "transcript.txt"
        generate_transcription(tts_dir, transcript, args.asr_model)
        ref_file = Path(args.reference_root) / f"{subset}.txt"
        bleu = score_from_files(transcript, ref_file)
        (out / "bleu.txt").write_text(str(bleu) + "\n")
        logger.info("%s ASR-BLEU %.2f", subset, bleu.score)
        results[subset] = bleu.score
    print({k: round(v, 2) for k, v in results.items()})
    return 0


def _text_mode(args) -> int:
    """Enhanced-path eval: generate → detokenize → corpus text BLEU per
    subset (reference scripts/enhanced/inference_all.sh + 2_inference.sh:
    fairseq-generate at beam 10 then BLEU on detokenized text)."""
    from mm_s2ut.cli import generate as gen_cli
    from mm_s2ut.config import load_config
    from mm_s2ut.eval.bleu import corpus_asr_bleu

    cfg = load_config(Path(args.model_path) / "config.yaml")
    bpe_cfg = dict(cfg.data.bpe_tokenizer) or None
    results = {}
    for subset in args.subsets:
        out = Path(args.results_root) / subset
        out.mkdir(parents=True, exist_ok=True)
        logger.info("=== %s (text) ===", subset)
        gen_cli.main([
            "--model_path", args.model_path,
            "--gen-subset", subset,
            "--results-path", str(out),
            "--beam", str(args.beam),
            *(["--kv-cache-dtype", args.kv_cache_dtype]
              if args.kv_cache_dtype else []),
        ])
        hyp_file = out / "hyp.txt"
        n = extract_text_from_generate(
            out / f"generate-{subset}.txt", hyp_file, bpe_cfg
        )
        logger.info("extracted %d hypotheses", n)
        refs = (Path(args.reference_root) / f"{subset}.txt").read_text().splitlines()
        hyps = hyp_file.read_text().splitlines()
        if len(refs) != len(hyps):
            # Truncating would silently score misaligned pairs — same
            # guard as the units path (score_from_files).
            raise ValueError(
                f"{subset}: {len(hyps)} hypotheses vs {len(refs)} "
                f"references — reference file and generation are misaligned"
            )
        # Plain sacrebleu semantics (no ASR cleaning) for text targets.
        bleu = corpus_asr_bleu(hyps, refs, clean=False)
        (out / "bleu.txt").write_text(str(bleu) + "\n")
        logger.info("%s text BLEU %.2f", subset, bleu.score)
        results[subset] = bleu.score
    print({k: round(v, 2) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
