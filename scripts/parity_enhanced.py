"""Closed-loop text-BLEU acceptance run for the ENHANCED workload family.

The reference's second workload is the enhanced (text-target) path:
``mm_xm_transformer`` (wav2vec2 speech encoder + adaptor + multimodal
fusion + mBART-style text decoder) trained on speech→text with a
SentencePiece vocabulary, evaluated by fairseq-generate at beam 10 and
corpus BLEU on detokenized text (reference
scripts/enhanced/inference_all.sh, scripts/enhanced/2_inference.sh:25-35,
results README.md:274-283).  This script executes that measurement chain
end-to-end with every stage real and no external assets:

  1. synthesize a speech↔text↔image corpus: per-utterance DTMF tone
     signatures (same separable-fingerprint trick as the textless world,
     scripts/parity_synthetic.py) paired with word-sequence transcripts;
  2. build a REAL SentencePiece unigram model over the corpus vocabulary
     (protobuf wire format via data/sentencepiece.build_model) in which a
     subset of words has NO whole-word piece, so Viterbi must split them
     and detokenization must re-join them — the tokenizer runs for real
     in both directions;
  3. train a tiny mm_xm_transformer (wav2vec2 encoder via
     model.w2v_args, lang-tag target framing, selective-attention image
     fusion) on it with cli.train;
  4. run cli.inference_all --mode text (generate at beam 10 → D-line
     extraction → SentencePiece detokenize → corpus BLEU) on valid/test.

As in the textless acceptance world, eval subsets reuse training pairs:
the training objective is memorization of random (tone → transcript)
mappings, so the acceptance target is the full measurement CHAIN — beam
decode from the lang-tag eos, piece extraction, detokenization, BLEU
alignment — producing the high score a memorized model should earn.
Breakage at any stage (lang-tag rotation, eos_token start symbol, piece
splitting, despacing, hyp/ref ordering) collapses the score.

  python scripts/parity_enhanced.py --root /tmp/parity_enh --steps 800
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WORDS = 48
# Two-letter words over a 7-letter alphabet (48 of the 49 combos).
WORDS = [chr(97 + u // 7) + chr(97 + u % 7) for u in range(N_WORDS)]
# These words get no whole-word SentencePiece entry: the unigram Viterbi
# must emit two pieces ("▁x" + "y") and decode() must re-join them.
SPLIT_WORDS = set(WORDS[-8:])


def build_sentencepiece(root: Path) -> Path:
    from mm_s2ut.data.sentencepiece import UNIGRAM, build_model

    pieces = []
    seen = set()

    def add(piece: str, score: float):
        if piece not in seen:
            seen.add(piece)
            pieces.append((piece, score))

    for w in WORDS:
        if w in SPLIT_WORDS:
            add("▁" + w[0], -2.0)
            add(w[1], -2.0)
        else:
            add("▁" + w, -1.0)
    blob = build_model(pieces, model_type=UNIGRAM)
    sp_path = root / "spm.model"
    sp_path.write_bytes(blob)
    # Task vocabulary: every piece + the target lang tag.
    dict_lines = [f"{p} 1" for p, _ in pieces] + ["<lang:en> 1"]
    (root / "dict.txt").write_text("\n".join(dict_lines) + "\n")
    return sp_path


def build_corpus(root: Path, rng, n_train=48, n_eval=8):
    from mm_s2ut.config import (
        Config, DataConfig, GenerationConfig, MeshConfig, ModelConfig,
        MultimodalConfig, TrainConfig,
    )
    from mm_s2ut.config import save_yaml
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest

    root.mkdir(parents=True, exist_ok=True)
    sp_path = build_sentencepiece(root)
    feat_dir = root / "img_feat"
    feat_dir.mkdir(exist_ok=True)
    sr = 16000
    texts = {}
    train_feats = rng.randn(n_train, 6, 16).astype(np.float32)
    np.save(feat_dir / "train.npy", train_feats)
    (root / "train").mkdir(exist_ok=True)
    train_rows = []
    for j in range(n_train):
        idx = j + 1
        length = sr // 3 + (idx % 5) * sr // 10
        # DTMF-style tone fingerprint (see parity_synthetic.py:64-75 for
        # the rationale: separable fbank/waveform patterns memorize fast).
        t = np.arange(length) / sr
        d0, d1 = idx % 8, (idx // 8) % 8
        wav = (
            0.30 * np.sin(2 * np.pi * (300 + 70 * d0) * t)
            + 0.30 * np.sin(2 * np.pi * (1100 + 90 * d1) * t)
            + 0.05 * rng.randn(length)
        ).astype(np.float32)
        write_wav(root / "train" / f"{idx}.wav", wav, sr)
        words = [WORDS[w] for w in rng.randint(0, N_WORDS, 4 + idx % 5)]
        # Guarantee every utterance exercises the split-piece path.
        words[rng.randint(len(words))] = WORDS[-1 - idx % len(SPLIT_WORDS)]
        text = " ".join(words)
        texts[("train", j)] = text
        train_rows.append(ManifestRow(
            str(j), f"train/{idx}.wav", length, text, len(words),
            src_lang="fr", tgt_lang="en",
        ))
    write_manifest(root / "train.tsv", train_rows)

    for split, n in (("valid", n_eval), ("test", n_eval)):
        (root / split).mkdir(exist_ok=True)
        np.save(feat_dir / f"{split}.npy", train_feats[:n])
        rows = []
        for j in range(n):
            src = root / "train" / f"{j + 1}.wav"
            dst = root / split / f"{j + 1}.wav"
            dst.write_bytes(src.read_bytes())
            texts[(split, j)] = texts[("train", j)]
            tr = train_rows[j]
            rows.append(ManifestRow(
                str(j), f"{split}/{j + 1}.wav", tr.src_n_frames,
                tr.tgt_text, tr.tgt_n_frames, src_lang="fr", tgt_lang="en",
            ))
        write_manifest(root / f"{split}.tsv", rows)

    refs = root / "refs"
    refs.mkdir(exist_ok=True)
    for split, n in (("train", 48), ("valid", n_eval), ("test", n_eval)):
        lines = [texts[(split, j)] for j in range(n)]
        (refs / f"{split}.txt").write_text("\n".join(lines) + "\n")

    cfg = Config(
        task="multimodal_speech_to_text",
        model=ModelConfig(
            decoder_embed_dim=64, decoder_ffn_embed_dim=128,
            decoder_layers=2, decoder_attention_heads=2, dtype="float32",
            # Tiny wav2vec2 via the w2v_args yaml surface (reference reads
            # these dims from the w2v_path checkpoint args).
            w2v_args=dict(
                conv_dim=[32, 32, 32], conv_stride=[8, 5, 4],
                conv_kernel=[10, 8, 4], hidden_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=128, num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
                attention_dropout=0.0, mask_time_prob=0.0,
            ),
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            multimodal=MultimodalConfig(
                image_feat_path=[str(feat_dir)], image_feat_dim=[16],
                multimodal_attention_type="selective_attention",
            ),
        ),
        data=DataConfig(
            data_root=str(root), audio_root=str(root),
            vocab_filename="dict.txt", use_audio_input=True,
            # xm target framing: <bos> pieces <eos> <lang:en>; generation
            # starts from/stops on the lang tag (eos_token override,
            # reference config/xm_transformer.yaml:4-7).
            prepend_bos_and_append_tgt_lang_tag=True,
            eos_token="<lang:en>", tgt_lang="en",
            bpe_tokenizer={"bpe": "sentencepiece",
                           "sentencepiece_model": str(sp_path)},
            # max_tokens × 160 samples/batch ≈ 8-12 utterances.
            max_tokens=500, num_buckets=1,
        ),
        train=TrainConfig(
            update_freq=1, warmup_updates=50, lr=2e-3, seed=3,
            max_update=800, save_dir=str(root / "ckpt"),
            log_interval=50, save_interval_updates=800,
        ),
        generation=GenerationConfig(beam=10, max_len_b=24, max_tokens=500),
        mesh=MeshConfig(data=1),
    )
    save_yaml(cfg, root / "run.yaml")



def _bleu_score(line: str) -> float:
    """First number after 'BLEU' in a sacre-style line ('BLEU = 96.85 ...')."""
    import re as _re

    m = _re.search(r"BLEU[^0-9]*([0-9.]+)", line)
    if not m:
        raise ValueError(f"no BLEU score in {line!r}")
    return float(m.group(1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_enh")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing checkpoint in --root")
    ap.add_argument("--canary", action="store_true",
                    help="after the clean run, re-run the chain with the "
                    "first hypothesis word dropped at the extraction seam "
                    "and FAIL unless text BLEU collapses")
    ap.add_argument("--cpu", action="store_true",
                    help="force jax onto CPU (the models here are tiny)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    root = Path(args.root)
    rng = np.random.RandomState(0)

    print("== corpus + sentencepiece ==", flush=True)
    build_corpus(root, rng)

    if not args.skip_train:
        print("== train mm_xm ==", flush=True)
        from mm_s2ut.cli.train import main as train_main

        train_main(["--config", str(root / "run.yaml"),
                    f"train.max_update={args.steps}"])

    print("== inference_all --mode text ==", flush=True)
    from mm_s2ut.cli.inference_all import main as infall_main

    results_root = root / "results"
    rc = infall_main([
        "--model_path", str(root / "ckpt"),
        "--mode", "text",
        "--subsets", "valid", "test",
        "--results-root", str(results_root),
        "--reference-root", str(root / "refs"),
        "--beam", "10",
    ])
    if rc != 0:
        return rc

    print("== summary ==")
    clean = {}
    for subset in ("valid", "test"):
        bleu_line = (results_root / subset / "bleu.txt").read_text().strip()
        clean[subset] = _bleu_score(bleu_line)
        print(f"{subset}: text {bleu_line}")

    if args.canary:
        # Sensitivity canary (VERDICT r4 weak #8): drop each hypothesis's
        # first word at the extraction seam; text BLEU must collapse or
        # the acceptance chain is not measuring its own hypotheses.
        print("== canary (drop first hyp word) ==", flush=True)
        os.environ["MM_PARITY_CANARY"] = "droptok"
        try:
            canary_root = root / "results_canary"
            rc = infall_main([
                "--model_path", str(root / "ckpt"),
                "--mode", "text",
                "--subsets", "test",
                "--results-root", str(canary_root),
                "--reference-root", str(root / "refs"),
                "--beam", "10",
            ])
        finally:
            del os.environ["MM_PARITY_CANARY"]
        if rc != 0:
            return rc
        fault = _bleu_score((canary_root / "test" / "bleu.txt").read_text())
        # One dropped word per ~8-word sentence costs ~18 BLEU here —
        # far outside the acceptance drift band (the clean chain scores
        # an exact 100.00); ≥10 points is an unambiguous sensitivity
        # signal for this fault size (the unit-world canary corrupts
        # EVERY token and demands a ≥30-point collapse).
        moved = fault < clean["test"] - 10.0
        print(f"canary: clean {clean['test']:.2f} -> faulted {fault:.2f} "
              f"({'COLLAPSED OK' if moved else 'DID NOT MOVE - CHAIN INSENSITIVE'})")
        if not moved:
            return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
