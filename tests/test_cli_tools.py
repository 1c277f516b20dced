"""CLI + aux subsystem tests: train CLI, prep_data, vocode, inference_all
unit extraction, metrics sinks, resnet encoder, profiling timer."""
import json
from pathlib import Path

import numpy as np
import pytest

import mm_s2ut  # noqa: F401
from mm_s2ut.config import save_yaml
from mm_s2ut.data.audio_io import get_waveform, write_wav
from mm_s2ut.data.manifest import ManifestRow, read_manifest, write_manifest


def _corpus(tmp_path, n=4):
    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        length = sr // 8
        write_wav(tmp_path / f"{i + 1}.wav", (0.2 * rng.randn(length)).astype(np.float32), sr)
        units = " ".join(str(u) for u in rng.randint(0, 20, 5))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 5))
    write_manifest(tmp_path / "train.tsv", rows)
    write_manifest(tmp_path / "valid.tsv", rows[:2])
    return tmp_path


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    from mm_s2ut.cli.train import main
    from mm_s2ut.config import (
        Config, DataConfig, MeshConfig, ModelConfig, MultimodalConfig, TrainConfig,
    )

    root = _corpus(tmp_path)
    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1, decoder_attention_heads=2,
            conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(multimodal_attention_type=None),
        ),
        data=DataConfig(data_root=str(root), audio_root=str(root),
                        target_code_size=20, max_tokens=300, num_buckets=1),
        train=TrainConfig(update_freq=1, warmup_updates=2, lr=1e-3,
                          max_update=6, log_interval=2, save_interval_updates=4,
                          save_dir=str(root / "ckpt")),
        mesh=MeshConfig(data=1),
    )
    cfg_file = root / "run.yaml"
    save_yaml(cfg, cfg_file)
    rc = main(["--config", str(cfg_file), "train.max_update=5"])
    assert rc == 0
    assert (root / "ckpt" / "config.yaml").exists()
    assert (root / "ckpt" / "logs" / "metrics.csv").exists()
    # Generate CLI over the trained checkpoint.
    from mm_s2ut.cli.generate import main as gen_main

    out = root / "gen"
    rc = gen_main(["--model_path", str(root / "ckpt"), "--gen-subset", "valid",
                   "--results-path", str(out), "--beam", "2", "--max-len-b", "8"])
    assert rc == 0
    gen_txt = (out / "generate-valid.txt").read_text()
    assert "D-0" in gen_txt


def test_prep_data_pipeline(tmp_path):
    from mm_s2ut.cli.prep_data import main

    # wavs + manifest
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        write_wav(wav_dir / f"{i + 1}.wav", (0.1 * rng.randn(4000)).astype(np.float32), 16000)
    manifest = tmp_path / "train_manifest.tsv"
    assert main(["manifest", "--root", str(wav_dir), "--dest", str(manifest)]) == 0
    lines = manifest.read_text().splitlines()
    assert lines[0] == str(wav_dir)
    assert len(lines) == 4 and lines[1].endswith("4000")

    # unit lines + prep-s2ut with dedup
    units = tmp_path / "units.txt"
    units.write_text("1 1 2 2 3\n4 4 4\n5 6\n")
    assert main([
        "prep-s2ut", "--src-manifest", str(manifest), "--tgt-units", str(units),
        "--split", "train", "--output-root", str(tmp_path / "data"),
        "--reduce-unit", "--src-lang", "fr", "--tgt-lang", "en",
    ]) == 0
    rows = read_manifest(tmp_path / "data" / "train.tsv")
    assert rows[0].tgt_text == "1 2 3"
    assert rows[1].tgt_text == "4" and rows[1].tgt_n_frames == 1
    assert rows[0].src_lang == "fr"


def test_vocode_cli(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_inference_cli import _tiny_vocoder
    from mm_s2ut.cli.vocode import main

    ckpt, cfg_json = _tiny_vocoder(tmp_path)
    unit_file = tmp_path / "test.unit"
    unit_file.write_text("1 5 7 2\n3 3 9\n")
    out = tmp_path / "tts"
    rc = main(["--in-code-file", str(unit_file), "--vocoder", str(ckpt),
               "--vocoder-cfg", str(cfg_json), "--results-path", str(out)])
    assert rc == 0
    wav, sr = get_waveform(str(out / "0_pred.wav"))
    assert sr == 16000 and len(wav) == 4 * 8  # 4 units × hop 8


def test_extract_units_from_generate(tmp_path):
    from mm_s2ut.cli.inference_all import extract_units_from_generate

    gen = tmp_path / "generate-test.txt"
    gen.write_text(
        "T-1\tref one\nD-1\t-0.5\t7 8 9\nH-1\t-0.5\t7 8 9\n"
        "D-0\t-0.2\t1 2 3\nD-2\t-0.9\t4 5\n"
    )
    unit_file = tmp_path / "test.unit"
    n = extract_units_from_generate(gen, unit_file)
    assert n == 3
    assert unit_file.read_text().splitlines() == ["1 2 3", "7 8 9", "4 5"]

    # Sensitivity canary (MM_PARITY_CANARY): +1 mod N at the seam.
    import os

    os.environ["MM_PARITY_CANARY"] = "offset1:mod10"
    try:
        extract_units_from_generate(gen, unit_file)
    finally:
        del os.environ["MM_PARITY_CANARY"]
    assert unit_file.read_text().splitlines() == ["2 3 4", "8 9 0", "5 6"]


def test_extract_text_droptok_canary(tmp_path):
    """The enhanced-chain canary (MM_PARITY_CANARY=droptok) drops each
    hypothesis's FIRST word at the detokenize seam (parity_enhanced.py
    --canary asserts the resulting text-BLEU collapse)."""
    import os

    from mm_s2ut.cli.inference_all import extract_text_from_generate

    gen = tmp_path / "generate-test.txt"
    gen.write_text("D-0\t-0.2\talpha beta gamma\nD-1\t-0.5\tone two\n")
    hyp = tmp_path / "hyp.txt"
    n = extract_text_from_generate(gen, hyp)
    assert n == 2
    assert hyp.read_text().splitlines() == ["alpha beta gamma", "one two"]

    os.environ["MM_PARITY_CANARY"] = "droptok"
    try:
        extract_text_from_generate(gen, hyp)
    finally:
        del os.environ["MM_PARITY_CANARY"]
    assert hyp.read_text().splitlines() == ["beta gamma", "two"]


def test_metrics_sinks(tmp_path):
    from mm_s2ut.train.metrics import MetricsAggregator, MetricsWriter

    agg = MetricsAggregator()
    agg.update({"loss": 10.0, "ntokens": 5.0})
    agg.update({"loss": 20.0, "ntokens": 5.0})
    snap = agg.flush()
    assert snap["loss"] == pytest.approx(3.0)  # 30 / 10 tokens
    assert snap["ntokens"] == 10.0

    w = MetricsWriter(tmp_path / "logs", enable_tensorboard=False)
    w.write(10, {"loss": 1.5}, "train")
    w.write(20, {"loss": 1.2}, "train")
    csv_text = (tmp_path / "logs" / "metrics.csv").read_text()
    assert "train/loss" in csv_text and "1.2" in csv_text

    # A later metric family (valid/*) must extend the header, not be
    # silently dropped by fieldnames frozen at the first write.
    w.write(20, {"loss": 2.5, "mcd": 7.0}, "valid")
    import csv as _csv

    with open(tmp_path / "logs" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert rows[-1]["valid/loss"] == "2.5" and rows[-1]["valid/mcd"] == "7.0"
    assert rows[0]["train/loss"] == "1.5"  # earlier rows padded, not lost

    # Resumed run: a fresh writer appends aligned to the existing header.
    w2 = MetricsWriter(tmp_path / "logs", enable_tensorboard=False)
    w2.write(30, {"loss": 1.0}, "train")
    with open(tmp_path / "logs" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert rows[-1]["step"] == "30" and rows[-1]["train/loss"] == "1.0"


def test_resnet_encoder():
    import jax
    import jax.numpy as jnp

    from mm_s2ut.models.resnet_encoder import SubModel

    model = SubModel(out_dim=32)
    video = jnp.ones((1, 3, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(variables, video)
    assert out.shape == (1, 3, 32)


def test_step_timer():
    import jax.numpy as jnp
    from mm_s2ut.utils.profiling import StepTimer

    import jax

    f = jax.jit(lambda x: (x @ x).sum())
    stats = StepTimer().measure(f, jnp.ones((64, 64)), iters=3)
    assert stats["compile_s"] > 0 and stats["median_s"] > 0
    assert stats["median_s"] <= stats["compile_s"] * 10


def test_hifigan_config_from_json(tmp_path):
    import json as _json

    from mm_s2ut.models.hifigan import HiFiGANConfig

    p = tmp_path / "config.json"
    p.write_text(_json.dumps({
        "upsample_rates": [5, 4, 4, 2, 2],
        "upsample_kernel_sizes": [11, 8, 8, 4, 4],
        "upsample_initial_channel": 512,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "num_embeddings": 1000,
        "embedding_dim": 128,
        "model_in_dim": 128,
        "dur_prediction_weight": 1.0,
        "var_pred_hidden_dim": 128,
    }))
    cfg = HiFiGANConfig.from_json(p)
    assert cfg.hop_length == 320
    assert cfg.dur_prediction is True
    assert cfg.resblock_dilation_sizes[0] == (1, 3, 5)


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from mm_s2ut.utils.profiling import memory_stats, trace

    with trace(tmp_path / "tr"):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert any((tmp_path / "tr").rglob("*"))  # trace artifacts written
    memory_stats()  # no-throw
