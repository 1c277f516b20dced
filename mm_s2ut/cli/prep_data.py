"""``python -m mm_s2ut.cli.prep_data`` — offline data preparation pipeline.

Collapses the reference's multi-tool prep chain (SURVEY.md C18; reference
scripts/preprocess/: wav2vec_manifest → quantize_with_kmeans →
run-length dedup → prep_s2ut_data --reduce-unit → src/tgt join) into one
CLI with subcommands:

  manifest   wav dir → tsv of (path, n_samples)      [2_manifest.sh]
  quantize   wavs → unit sequences via HuBERT+kmeans  [3_cluster.sh]
  prep-s2ut  src manifest + tgt units → {split}.tsv   [5_prep_s2ut_data.sh]

Quantization runs the JAX HuBERT/wav2vec2 encoder + matmul k-means on
device (SURVEY.md F12) instead of per-utterance torch loops.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.prep_data")


def cmd_manifest(args) -> int:
    """wav2vec_manifest equivalent: root-relative paths + sample counts."""
    from mm_s2ut.data.audio_io import get_waveform

    root = Path(args.root)
    paths = sorted(root.rglob(f"*.{args.ext}"))
    lines = [str(root)]
    for p in paths:
        wav, _ = get_waveform(str(p))
        lines.append(f"{p.relative_to(root)}\t{len(wav)}")
    Path(args.dest).parent.mkdir(parents=True, exist_ok=True)
    Path(args.dest).write_text("\n".join(lines) + "\n")
    logger.info("manifest: %d files -> %s", len(paths), args.dest)
    return 0


def cmd_quantize(args) -> int:
    """HuBERT layer-K features → k-means units, one line per utterance
    (quantize_with_kmeans equivalent; reference 3_cluster.sh:20-27 uses
    mHuBERT layer 11, km1000)."""
    import jax
    import jax.numpy as jnp

    from mm_s2ut.data.audio_io import get_waveform
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Model, load_hf_checkpoint
    from mm_s2ut.ops.kmeans import KMeansQuantizer, dedup_units

    cfg, variables = load_hf_checkpoint(args.hubert_model)
    model = Wav2Vec2Model(cfg)
    quant = KMeansQuantizer.load(args.km_path)
    layer = args.layer

    forward = jax.jit(
        lambda v, wav, lens: model.apply(v, wav, lens)["hidden_states"][layer]
    )

    manifest = Path(args.manifest).read_text().splitlines()
    root = Path(manifest[0])
    entries = [l.split("\t") for l in manifest[1:] if l.strip()]
    out_lines: List[str] = []
    B = args.batch_size
    for start in range(0, len(entries), B):
        chunk = entries[start : start + B]
        wavs = [get_waveform(str(root / e[0]), use_sample_rate=16000)[0] for e in chunk]
        S = max(len(w) for w in wavs)
        batch = np.zeros((len(wavs), S), np.float32)
        lens = np.zeros((len(wavs),), np.int32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
            lens[i] = len(w)
        feats = forward(variables, jnp.asarray(batch), jnp.asarray(lens))
        feat_lens = np.asarray(cfg.feature_lengths(jnp.asarray(lens)))
        units = quant(np.asarray(feats).reshape(-1, feats.shape[-1])).reshape(feats.shape[:2])
        for i in range(len(chunk)):
            u = units[i, : feat_lens[i]].tolist()
            if args.dedup:
                u = dedup_units(u)
            out_lines.append(" ".join(map(str, u)))
    Path(args.dest).write_text("\n".join(out_lines) + "\n")
    logger.info("quantized %d utterances -> %s", len(out_lines), args.dest)
    return 0


def cmd_prep_s2ut(args) -> int:
    """Assemble {split}.tsv with the reference column schema
    (id, src_audio, src_n_frames, tgt_text, tgt_n_frames)."""
    from mm_s2ut.data.manifest import ManifestRow, write_manifest
    from mm_s2ut.ops.kmeans import dedup_units

    manifest = Path(args.src_manifest).read_text().splitlines()
    entries = [l.split("\t") for l in manifest[1:] if l.strip()]
    units = Path(args.tgt_units).read_text().splitlines()
    if len(entries) != len(units):
        raise ValueError(f"{len(entries)} audios vs {len(units)} unit lines")
    rows = []
    for i, ((rel, n_samples), unit_line) in enumerate(zip(entries, units)):
        u = [int(x) for x in unit_line.split()]
        if args.reduce_unit:
            u = dedup_units(u)
        rows.append(
            ManifestRow(
                id=str(i), src_audio=rel, src_n_frames=int(n_samples),
                tgt_text=" ".join(map(str, u)), tgt_n_frames=len(u),
                src_lang=args.src_lang or "", tgt_lang=args.tgt_lang or "",
            )
        )
    out = Path(args.output_root) / f"{args.split}.tsv"
    out.parent.mkdir(parents=True, exist_ok=True)
    write_manifest(out, rows)
    logger.info("wrote %s (%d rows)", out, len(rows))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.prep_data")
    sub = ap.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("manifest")
    m.add_argument("--root", required=True)
    m.add_argument("--dest", required=True)
    m.add_argument("--ext", default="wav")

    q = sub.add_parser("quantize")
    q.add_argument("--manifest", required=True)
    q.add_argument("--hubert-model", required=True, help="HF HuBERT/wav2vec2 dir")
    q.add_argument("--km-path", required=True, help="joblib or .npy centroids")
    q.add_argument("--layer", type=int, default=11)
    q.add_argument("--dest", required=True)
    q.add_argument("--batch-size", type=int, default=8)
    q.add_argument("--dedup", action="store_true")

    p = sub.add_parser("prep-s2ut")
    p.add_argument("--src-manifest", required=True)
    p.add_argument("--tgt-units", required=True)
    p.add_argument("--split", required=True)
    p.add_argument("--output-root", required=True)
    p.add_argument("--reduce-unit", action="store_true")
    p.add_argument("--src-lang", default="")
    p.add_argument("--tgt-lang", default="")

    args = ap.parse_args(argv)
    return {"manifest": cmd_manifest, "quantize": cmd_quantize, "prep-s2ut": cmd_prep_s2ut}[args.cmd](args)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
