"""wav2vec2-CTC ASR transcription for evaluation.

Equivalent of the reference transcript generators (SURVEY.md C15;
reference scripts/transcript.py:9-41 / 4_transcript.py): transcribe all
generated wavs in a directory — sorted numerically by the leading index
of the filename (``int(name.split('_')[0])``) — with greedy CTC decoding,
one transcript per line. Runs the JAX wav2vec2 encoder (models/wav2vec2)
with a converted HF checkpoint, batched on device.
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from mm_s2ut.data.audio_io import get_waveform
from mm_s2ut.ops.ctc import ctc_greedy_decode


def wav_sort_key(path: Path) -> int:
    """Reference sort: int(name.split('_')[0]) (transcript.py:20-24)."""
    m = re.match(r"(\d+)", path.stem)
    return int(m.group(1)) if m else 0


def load_ctc_vocab(model_dir: str) -> Dict[int, str]:
    vocab_file = Path(model_dir) / "vocab.json"
    vocab = json.loads(vocab_file.read_text())
    return {int(i): tok for tok, i in vocab.items()}


class CTCTranscriber:
    """Greedy wav2vec2-CTC ASR over batches of waveforms."""

    def __init__(self, model_dir: str, dtype: str = "float32"):
        import jax
        import jax.numpy as jnp

        from mm_s2ut.models.wav2vec2 import Wav2Vec2ForCTC, load_hf_checkpoint

        self.cfg, self.variables = load_hf_checkpoint(model_dir)
        self.model = Wav2Vec2ForCTC(self.cfg)
        self.id2tok = load_ctc_vocab(model_dir)
        self.pad_tok = "<pad>"
        self.delim = "|"
        # Zero-mean/unit-variance input normalization: the reference's
        # transcript path goes through Wav2Vec2Processor
        # (scripts/transcript.py:16-37), whose feature extractor has
        # do_normalize=True for wav2vec2-CTC checkpoints. Honour the
        # checkpoint's preprocessor_config.json; default True.
        self.do_normalize = True
        pp = Path(model_dir) / "preprocessor_config.json"
        if pp.exists():
            self.do_normalize = bool(
                json.loads(pp.read_text()).get("do_normalize", True)
            )

        def forward(v, wav, lens):
            if self.do_normalize:
                T = wav.shape[1]
                valid = (jnp.arange(T)[None, :] < lens[:, None]).astype(wav.dtype)
                n = jnp.maximum(lens.astype(wav.dtype), 1.0)[:, None]
                mean = (wav * valid).sum(1, keepdims=True) / n
                var = (((wav - mean) * valid) ** 2).sum(1, keepdims=True) / n
                wav = (wav - mean) * jax.lax.rsqrt(var + 1e-7) * valid
            return self.model.apply(v, wav, lens)["logits"]

        self._forward = jax.jit(forward)

    def transcribe_batch(
        self, waveforms: np.ndarray, lengths: np.ndarray
    ) -> List[str]:
        import jax.numpy as jnp

        logits = self._forward(
            self.variables, jnp.asarray(waveforms), jnp.asarray(lengths)
        )
        feat_lens = self.cfg.feature_lengths(jnp.asarray(lengths))
        ids = np.asarray(ctc_greedy_decode(logits, feat_lens, blank_id=0))
        out = []
        for row in ids:
            toks = [self.id2tok.get(int(t), "") for t in row if t >= 0]
            text = "".join(toks).replace(self.delim, " ")
            out.append(" ".join(text.split()))
        return out

    def transcribe_files(
        self, wav_paths: Sequence[str | Path], batch_size: int = 8
    ) -> List[str]:
        texts: List[str] = []
        paths = list(wav_paths)
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            wavs = [get_waveform(str(p), use_sample_rate=16000)[0] for p in chunk]
            S = max(len(w) for w in wavs)
            batch = np.zeros((len(wavs), S), np.float32)
            lens = np.zeros((len(wavs),), np.int32)
            for j, w in enumerate(wavs):
                batch[j, : len(w)] = w
                lens[j] = len(w)
            texts.extend(self.transcribe_batch(batch, lens))
        return texts


def generate_transcription(
    wav_dir: str | Path,
    output_file: str | Path,
    model_dir: str,
    pattern: str = "*.wav",
    batch_size: int = 8,
) -> List[str]:
    """Directory-level surface of the reference generate_transcription
    (transcript.py:9-41): sort wavs numerically, transcribe, write one
    line per wav."""
    paths = sorted(Path(wav_dir).glob(pattern), key=wav_sort_key)
    if not paths:
        raise FileNotFoundError(f"no {pattern} under {wav_dir}")
    transcriber = CTCTranscriber(model_dir)
    texts = transcriber.transcribe_files(paths, batch_size)
    with open(output_file, "w") as f:
        for t in texts:
            f.write(t + "\n")
    return texts


def main():
    import argparse

    ap = argparse.ArgumentParser(description="wav2vec2-CTC ASR transcription")
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--asr_model", required=True, help="HF wav2vec2-CTC dir")
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()
    texts = generate_transcription(args.wav_dir, args.output, args.asr_model,
                                   batch_size=args.batch_size)
    print(f"transcribed {len(texts)} wavs -> {args.output}")


if __name__ == "__main__":
    main()
