"""End-to-end CLI drive on a synthetic corpus (the /verify recipe).

Builds a tiny corpus in a temp dir, then shells through the full CLI
surface: train (+resume), single/batch inference (+vocoder), the
generate→vocode chain, and the text eval CLIs. Exits non-zero on the
first failed expectation.

Usage: python scripts_dev/verify_drive.py [--workdir DIR] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
ENV = dict(os.environ)
ENV["PYTHONPATH"] = f"{REPO}:/root/.axon_site"


def sh(args, cwd, expect_rc=0, tag=""):
    print(f"--- [{tag}] {' '.join(str(a) for a in args)}", flush=True)
    p = subprocess.run(
        [sys.executable, "-m", *args] if isinstance(args[0], str) and args[0].startswith("mm_s2ut")
        else args,
        cwd=cwd, env=ENV, capture_output=True, text=True, timeout=1200,
    )
    if p.returncode != expect_rc:
        print(p.stdout[-4000:])
        print(p.stderr[-4000:])
        raise SystemExit(f"[{tag}] rc={p.returncode}, expected {expect_rc}")
    return p


def build_corpus(root: Path, cpu: bool):
    sys.path.insert(0, str(REPO))
    from mm_s2ut.config import (
        Config, DataConfig, GenerationConfig, MeshConfig, ModelConfig,
        MultimodalConfig, TrainConfig, save_yaml,
    )
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest

    sr = 16000
    rng = np.random.RandomState(0)
    n = 8
    rows = []
    feat_dir = root / "img_feat"
    feat_dir.mkdir()
    for split in ("train", "valid", "test"):
        np.save(feat_dir / f"{split}.npy", rng.randn(n, 6, 16).astype(np.float32))
    for i in range(n):
        length = sr // 4 + (i % 3) * sr // 8
        wav = (0.3 * rng.randn(length)).astype(np.float32)
        write_wav(root / f"{i + 1}.wav", wav, sr)
        units = " ".join(str(u) for u in rng.randint(0, 18, 8 + i % 4))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 8 + i % 4))
    write_manifest(root / "train.tsv", rows)
    write_manifest(root / "valid.tsv", rows[:4])
    write_manifest(root / "test.tsv", rows[:4])
    np.save(root / "img1.npy", rng.randn(6, 16).astype(np.float32))

    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=64, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=64,
            decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(
                image_feat_path=[str(feat_dir)],
                image_feat_dim=[16],
                multimodal_attention_type="selective_attention",
            ),
        ),
        data=DataConfig(
            data_root=str(root), audio_root=str(root),
            target_code_size=18, max_tokens=400, num_buckets=1,
        ),
        train=TrainConfig(
            update_freq=1, warmup_updates=5, lr=1e-3, seed=3, max_update=6,
            save_dir=str(root / "ckpt"), log_interval=2,
        ),
        generation=GenerationConfig(beam=2, max_len_a=0, max_len_b=8),
        mesh=MeshConfig(data=1),
    )
    save_yaml(cfg, root / "run.yaml")

    # Tiny fairseq-format vocoder checkpoint (18 units + dur prediction off).
    import torch

    sys.path.insert(0, str(REPO / "tests"))
    from test_hifigan import SMALL, _torch_generator

    torch.manual_seed(0)
    tgen = _torch_generator(SMALL)
    sd = dict(tgen.state_dict())
    sd["dict.weight"] = torch.randn(SMALL.num_embeddings, SMALL.embedding_dim)
    torch.save(sd, root / "vocoder.pt")
    vcfg = {
        "num_embeddings": SMALL.num_embeddings,
        "embedding_dim": SMALL.embedding_dim,
        "model_in_dim": SMALL.model_in_dim,
        "upsample_initial_channel": SMALL.upsample_initial_channel,
        "upsample_rates": list(SMALL.upsample_rates),
        "upsample_kernel_sizes": list(SMALL.upsample_kernel_sizes),
        "resblock_kernel_sizes": list(SMALL.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in SMALL.resblock_dilation_sizes],
        "dur_prediction": False,
    }
    (root / "vocoder.json").write_text(json.dumps(vcfg))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend in subprocesses")
    args = ap.parse_args()
    if args.cpu:
        ENV["MM_S2UT_FORCE_CPU"] = "1"

    root = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp(prefix="verify_"))
    root.mkdir(parents=True, exist_ok=True)
    print(f"corpus dir: {root}")
    build_corpus(root, args.cpu)
    py = sys.executable

    # 2. Train + resume.
    sh([py, "-m", "mm_s2ut.cli.train", "--config", "run.yaml"], root, tag="train")
    assert (root / "ckpt/config.yaml").exists(), "ckpt/config.yaml missing"
    metrics = (root / "ckpt/logs/metrics.csv").read_text().strip().splitlines()
    assert len(metrics) >= 2, "no loss rows in metrics.csv"
    p = sh([py, "-m", "mm_s2ut.cli.train", "--config", "run.yaml", "--resume"], root, tag="resume")
    assert "resumed from step" in (p.stdout + p.stderr), "resume log line missing"

    # 3. Single-sample inference + vocoder.
    sh([py, "-m", "mm_s2ut.inference", "--model_path", "ckpt", "--audio_path", "1.wav",
        "--image_path", "img1.npy", "--output_dir", "out",
        "--vocoder_path", "vocoder.pt", "--vocoder_cfg", "vocoder.json"], root, tag="infer1")
    for f in ("out/1.unit", "out/generate-test.txt", "out/1_pred.wav"):
        assert (root / f).exists(), f"{f} missing"
    gen_txt = (root / "out/generate-test.txt").read_text()
    assert "H-" in gen_txt and "D-" in gen_txt, "H-/D- lines missing"

    # 4. Batch inference.
    sh([py, "-m", "mm_s2ut.inference", "--model_path", "ckpt",
        "--manifest_file", "test.tsv", "--output_dir", "out_batch"], root, tag="batch")
    units = list((root / "out_batch").glob("*.unit"))
    assert len(units) == 4, f"expected 4 .unit files, got {len(units)}"
    assert "T-" in (root / "out_batch/generate-test.txt").read_text()

    # 5. Generate → vocode chain.
    sh([py, "-m", "mm_s2ut.cli.generate", "--model_path", "ckpt", "--gen-subset", "test",
        "--results-path", "out_gen", "--beam", "2", "--max-len-b", "8"], root, tag="generate")
    sh([py, "-c",
        "from mm_s2ut.cli.inference_all import extract_units_from_generate;"
        "extract_units_from_generate('out_gen/generate-test.txt', 'out_gen/test.unit')"],
       root, tag="extract-units")
    sh([py, "-m", "mm_s2ut.cli.vocode", "--in-code-file", "out_gen/test.unit",
        "--vocoder", "vocoder.pt", "--vocoder-cfg", "vocoder.json",
        "--results-path", "tts"], root, tag="vocode")
    assert list((root / "tts").glob("*.wav")), "no vocoded wavs"

    # 6. Text eval CLIs.
    (root / "r.txt").write_text("the cat sat\nhello world\n")
    (root / "h.txt").write_text("the cat sat\nhello word\n")
    p = sh([py, "-m", "mm_s2ut.eval.wer", "--references", "r.txt",
            "--predictions", "h.txt"], root, tag="wer")
    assert "WER" in p.stdout.upper()
    p = sh([py, "-m", "mm_s2ut.eval.bleu", "--transcripts", "h.txt",
            "--references", "r.txt"], root, tag="bleu")
    assert "BLEU" in p.stdout.upper()

    # Probes: clear errors on bad input.
    sh([py, "-m", "mm_s2ut.inference", "--model_path", "does_not_exist",
        "--audio_path", "1.wav", "--output_dir", "out_e"], root, expect_rc=1, tag="bad-model")
    sh([py, "-m", "mm_s2ut.inference", "--model_path", "ckpt", "--audio_path", "1.wav",
        "--image_path", str(root / "img_feat/test.npy"), "--output_dir", "out_e"],
       root, expect_rc=1, tag="multi-image-blob")

    print("VERIFY DRIVE: ALL OK")


if __name__ == "__main__":
    main()
