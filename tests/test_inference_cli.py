"""End-to-end CLI test: train → checkpoint → python -m mm_s2ut.inference
(single + batch) → .unit files → vocoder wavs. The full product surface."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np
import pytest

import mm_s2ut  # noqa: F401
from mm_s2ut import registry
from mm_s2ut.config import (
    Config, DataConfig, MeshConfig, ModelConfig, MultimodalConfig, TrainConfig,
)
from mm_s2ut.data.audio_io import get_waveform, write_wav
from mm_s2ut.data.manifest import ManifestRow, write_manifest


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    sr = 16000
    rng = np.random.RandomState(0)
    n = 4
    rows = []
    feat_dir = root / "img_feat"
    feat_dir.mkdir()
    np.save(feat_dir / "train.npy", rng.randn(n, 5, 8).astype(np.float32))
    for i in range(n):
        length = sr // 4
        write_wav(root / f"{i + 1}.wav", (0.3 * rng.randn(length)).astype(np.float32), sr)
        units = " ".join(str(u) for u in rng.randint(0, 30, 6))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 6))
    write_manifest(root / "train.tsv", rows)
    write_manifest(root / "test.tsv", rows[:2])

    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(image_feat_dim=[8], multimodal_attention_type=None),
        ),
        data=DataConfig(
            data_root=str(root), audio_root=str(root), target_code_size=30,
            max_tokens=400, num_buckets=1,
        ),
        train=TrainConfig(
            update_freq=1, warmup_updates=2, lr=1e-3,
            save_dir=str(root / "ckpt"),
        ),
        generation=__import__("mm_s2ut.config", fromlist=["GenerationConfig"]).GenerationConfig(
            beam=2, max_len_a=0, max_len_b=10,
        ),
        mesh=MeshConfig(data=1),
    )
    task = registry.get_task("multimodal_speech_to_speech")(cfg)
    trainer = task.build_trainer()
    for batch in task.batch_iterator("train", epoch=0):
        trainer.train_batch(batch)
    trainer.save_checkpoint({"loss": 1.0})
    return root, cfg


def _tiny_vocoder(tmp_path):
    """Create a reference-format vocoder checkpoint (torch state dict)."""
    torch = pytest.importorskip("torch")
    import json

    from tests.test_hifigan import SMALL, _torch_generator

    torch.manual_seed(0)
    tgen = _torch_generator(SMALL)
    sd = dict(tgen.state_dict())
    sd["dict.weight"] = torch.randn(30, SMALL.embedding_dim)
    ckpt = tmp_path / "vocoder.pt"
    torch.save(sd, ckpt)
    cfg_json = tmp_path / "vocoder.json"
    cfg_json.write_text(json.dumps({
        "num_embeddings": 30,
        "embedding_dim": SMALL.embedding_dim,
        "model_in_dim": SMALL.model_in_dim,
        "upsample_initial_channel": SMALL.upsample_initial_channel,
        "upsample_rates": list(SMALL.upsample_rates),
        "upsample_kernel_sizes": list(SMALL.upsample_kernel_sizes),
        "resblock_kernel_sizes": list(SMALL.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in SMALL.resblock_dilation_sizes],
        "dur_prediction": False,
    }))
    return ckpt, cfg_json


def test_single_sample_inference(trained_ckpt, tmp_path):
    from mm_s2ut.inference import main

    root, cfg = trained_ckpt
    out = tmp_path / "single"
    rc = main([
        "--model_path", str(root / "ckpt"),
        "--audio_path", str(root / "1.wav"),
        "--output_dir", str(out),
    ])
    assert rc == 0
    units = (out / "1.unit").read_text().strip()
    assert all(0 <= int(u) < 30 for u in units.split() if u)
    gen = (out / "generate-test.txt").read_text()
    assert "D-0" in gen and "H-0" in gen


def test_batch_inference_with_vocoder(trained_ckpt, tmp_path):
    from mm_s2ut.inference import main

    root, cfg = trained_ckpt
    voc_ckpt, voc_cfg = _tiny_vocoder(tmp_path)
    out = tmp_path / "batch"
    rc = main([
        "--model_path", str(root / "ckpt"),
        "--manifest_file", str(root / "test.tsv"),
        "--output_dir", str(out),
        "--vocoder_path", str(voc_ckpt),
        "--vocoder_cfg", str(voc_cfg),
    ])
    assert rc == 0
    assert (out / "1.unit").exists() and (out / "2.unit").exists()
    # T- lines present in batch mode (targets from the manifest).
    gen = (out / "generate-test.txt").read_text()
    assert "T-0" in gen
    wav, sr = get_waveform(str(out / "1_pred.wav"))
    assert sr == 16000 and len(wav) > 0


def test_task_load_sample(trained_ckpt, tmp_path):
    root, cfg = trained_ckpt
    task = registry.get_task("multimodal_speech_to_speech")(cfg)
    feats = np.random.RandomState(0).randn(5, 8).astype(np.float32)
    np.save(tmp_path / "img.npy", feats)
    sample = task.load_sample(str(root / "1.wav"), str(tmp_path / "img.npy"))
    assert sample["src_features"].shape[-1] == 80
    assert sample["imgs_list"][0].shape == (1, 5, 8)


def test_batch_inference_continuous_batching_identical(trained_ckpt, tmp_path):
    """--continuous-batching must reproduce the static-batch outputs
    (serving changes scheduling, not math)."""
    from mm_s2ut.inference import main

    root, cfg = trained_ckpt
    out_a = tmp_path / "static"
    out_b = tmp_path / "serving"
    for out, extra in ((out_a, []), (out_b, ["--continuous-batching", "--slots", "2"])):
        rc = main([
            "--model_path", str(root / "ckpt"),
            "--manifest_file", str(root / "test.tsv"),
            "--output_dir", str(out),
            *extra,
        ])
        assert rc == 0

    def d_lines(p):
        return sorted(
            l for l in (p / "generate-test.txt").read_text().splitlines()
            if l.startswith("D-")
        )

    assert d_lines(out_a) == d_lines(out_b)
