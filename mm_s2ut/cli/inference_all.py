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
    unit_file.write_text("\n".join(u for _, u in rows) + "\n")
    return len(rows)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.inference_all")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--subsets", nargs="+",
                    default=["valid", "test.2016", "test.2017", "test.coco"])
    ap.add_argument("--results-root", required=True)
    ap.add_argument("--vocoder", required=True)
    ap.add_argument("--vocoder-cfg", default=None)
    ap.add_argument("--asr-model", required=True, help="HF wav2vec2-CTC dir")
    ap.add_argument("--reference-root", required=True,
                    help="dir with {subset}.txt reference transcripts")
    ap.add_argument("--beam", type=int, default=10)
    args = ap.parse_args(argv)

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


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
