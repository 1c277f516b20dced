"""``python -m mm_s2ut.cli.vocode`` — unit file → waveforms.

Replaces fairseq's generate_waveform_from_code.py (SURVEY.md §3.3;
reference scripts/3_generate_waveform.sh:28-32): reads a ``.unit`` file
(one space-separated unit sequence per line — the artifact produced by
cli.generate + grep, or by mm_s2ut.inference), vocodes each line with
CodeHiFiGAN (``--dur-prediction`` supported), writes ``{i}_pred.wav``.
Batched on device: lines are grouped into padded batches so the vocoder
runs as a few large programs rather than per-utterance calls.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.vocode")


def read_unit_file(path: str | Path) -> List[List[int]]:
    lines = Path(path).read_text().splitlines()
    return [[int(u) for u in l.split()] for l in lines]


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.vocode")
    ap.add_argument("--in-code-file", required=True)
    ap.add_argument("--vocoder", required=True, help="CodeHiFiGAN .pt checkpoint")
    ap.add_argument("--vocoder-cfg", default=None, help="config.json")
    ap.add_argument("--results-path", required=True)
    ap.add_argument("--dur-prediction", action="store_true")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--sample-rate", type=int, default=16000)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.models.hifigan import (
        CodeHiFiGAN, HiFiGANConfig, load_fairseq_checkpoint,
    )

    out_dir = Path(args.results_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = HiFiGANConfig.from_json(args.vocoder_cfg) if args.vocoder_cfg else HiFiGANConfig()
    variables = load_fairseq_checkpoint(args.vocoder, cfg)

    sequences = read_unit_file(args.in_code_file)
    max_units = max((len(s) for s in sequences if s), default=1)
    # Frame budget: dur-predicted units expand a few-fold; without
    # prediction it's one frame per unit.
    max_frames = (8 * max_units + 16) if args.dur_prediction else (max_units + 1)
    model = CodeHiFiGAN(cfg, max_frames=max_frames)

    B = args.batch_size
    written = 0
    for start in range(0, len(sequences), B):
        chunk = sequences[start : start + B]
        L = max((len(s) for s in chunk if s), default=1)
        units = np.zeros((len(chunk), L), np.int32)
        lens = np.zeros((len(chunk),), np.int32)
        for i, s in enumerate(chunk):
            units[i, : len(s)] = s
            lens[i] = len(s)
        wavs, n_samples = model.apply(
            variables, jnp.asarray(units), jnp.asarray(lens),
            dur_prediction=args.dur_prediction,
        )
        wavs, n_samples = np.asarray(wavs), np.asarray(n_samples)
        for i in range(len(chunk)):
            n = int(n_samples[i])
            wav = wavs[i, :n] if n > 0 else np.zeros(args.sample_rate // 10, np.float32)
            write_wav(out_dir / f"{start + i}_pred.wav", wav, args.sample_rate)
            written += 1
    logger.info("wrote %d wavs to %s", written, out_dir)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
