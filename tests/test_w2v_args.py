"""Config surface for the wav2vec2/mHuBERT speech branches:
ModelConfig.w2v_args overrides + raw-waveform task plumbing."""
import numpy as np
import pytest

from mm_s2ut.models.wav2vec2 import Wav2Vec2Config


def test_w2v_config_from_args():
    cfg = Wav2Vec2Config.from_args({
        "conv_dim": [32, 32], "conv_stride": [8, 5], "conv_kernel": [10, 4],
        "hidden_size": 64, "num_hidden_layers": 2,
    })
    assert cfg.conv_dim == (32, 32) and cfg.conv_stride == (8, 5)
    assert cfg.hidden_size == 64 and cfg.num_hidden_layers == 2
    # Untouched fields keep their defaults.
    assert cfg.num_attention_heads == Wav2Vec2Config().num_attention_heads
    assert Wav2Vec2Config.from_args(None) == Wav2Vec2Config()


def test_source_downsample_ratio():
    from mm_s2ut.config import ModelConfig, MultimodalConfig
    from mm_s2ut.models import build_model_from_config
    from mm_s2ut.config import Config

    mm = MultimodalConfig(multimodal_attention_type=None)
    conv = Config(model=ModelConfig(multimodal=mm))
    assert build_model_from_config(conv).source_downsample_ratio == 1
    w2v = Config(model=ModelConfig(
        multimodal=mm, speech_encoder_type="wav2vec2",
        w2v_args={"conv_stride": [8, 5, 4], "conv_dim": [16, 16, 16],
                  "conv_kernel": [10, 8, 4]},
    ))
    assert build_model_from_config(w2v).source_downsample_ratio == 160
    xm = Config(task="multimodal_speech_to_text", model=ModelConfig(
        multimodal=mm,
        w2v_args={"conv_stride": [8, 5], "conv_dim": [16, 16],
                  "conv_kernel": [10, 4]},
    ))
    # 40 (conv stack) x 8 (2-stride adaptor ^ 3 layers).
    assert build_model_from_config(xm).source_downsample_ratio == 320


@pytest.mark.slow
def test_s2s_task_raw_waveform_batches(tmp_path):
    """speech_encoder_type != conv_transformer => batch_iterator yields
    raw waveforms (no fbank stage) and init_params uses a waveform dummy."""
    from mm_s2ut import registry
    from mm_s2ut.config import (
        Config, DataConfig, MeshConfig, ModelConfig, MultimodalConfig,
        TrainConfig,
    )
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest

    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        length = sr // 4
        write_wav(tmp_path / f"{i + 1}.wav",
                  (0.2 * rng.randn(length)).astype(np.float32), sr)
        rows.append(ManifestRow(
            str(i), f"{i + 1}.wav", length,
            " ".join(str(u) for u in rng.randint(0, 20, 6)), 6,
        ))
    write_manifest(tmp_path / "train.tsv", rows)
    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, dtype="float32",
            speech_encoder_type="wav2vec2",
            w2v_args={"conv_dim": [16, 16], "conv_stride": [16, 10],
                      "conv_kernel": [16, 10], "hidden_size": 32,
                      "num_hidden_layers": 1, "num_attention_heads": 2,
                      "intermediate_size": 64,
                      "num_conv_pos_embeddings": 16,
                      "num_conv_pos_embedding_groups": 4,
                      "mask_time_prob": 0.0},
            multimodal=MultimodalConfig(multimodal_attention_type=None),
        ),
        data=DataConfig(
            data_root=str(tmp_path), audio_root=str(tmp_path),
            target_code_size=20, max_tokens=200, num_buckets=1,
        ),
        train=TrainConfig(update_freq=1, warmup_updates=2, lr=1e-3),
        mesh=MeshConfig(data=1),
    )
    task = registry.get_task("multimodal_speech_to_speech")(cfg)
    b = next(iter(task.batch_iterator("train", 0)))
    assert b["src_features"].ndim == 2  # raw samples, not (B, T, 80)
    model = task.build_model()
    params = task.init_params(model)
    out = model.apply(
        params, b["src_features"], b["src_lengths"], b["prev_output_tokens"],
    )
    assert out["logits"].shape[-1] == cfg.model.vocab_size
