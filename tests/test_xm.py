"""Enhanced-path tests: adaptor, mm_xm_transformer, S2T task end-to-end,
temperature resampling."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mm_s2ut  # noqa: F401
from mm_s2ut import registry
from mm_s2ut.config import (
    Config, DataConfig, MeshConfig, ModelConfig, MultimodalConfig, TrainConfig,
)
from mm_s2ut.data.audio_io import write_wav
from mm_s2ut.data.manifest import ManifestRow, write_manifest
from mm_s2ut.data.s2t_dataset import ResampledConcat
from mm_s2ut.models.mm_xm import Conv1dAdaptor, MMXMTransformerModel
from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

TINY_W2V = Wav2Vec2Config(
    conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
    hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=48, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    hidden_dropout=0.0, attention_dropout=0.0,
)


def _cfg():
    return ModelConfig(
        decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, vocab_size=40, dtype="float32",
        multimodal=MultimodalConfig(
            image_feat_dim=[8], multimodal_attention_type="selective_attention",
        ),
    )


def test_adaptor_halves_lengths():
    ad = Conv1dAdaptor(out_dim=16, n_layers=2, layernorm=True)
    x = jnp.ones((2, 40, 24))
    lengths = jnp.asarray([40, 17])
    params = ad.init(jax.random.PRNGKey(0), x, lengths)
    y, out_lens = ad.apply(params, x, lengths)
    assert y.shape == (2, 10, 16)
    assert list(np.asarray(out_lens)) == [10, 5]


def test_xm_model_forward_and_decode():
    model = MMXMTransformerModel(_cfg(), w2v_cfg=TINY_W2V)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1600).astype(np.float32))
    lens = jnp.asarray([1600, 1200])
    prev = jnp.zeros((2, 5), jnp.int32)
    imgs = (jnp.asarray(np.random.RandomState(1).randn(2, 4, 8).astype(np.float32)),)
    masks = (jnp.zeros((2, 4), bool),)
    params = model.init(jax.random.PRNGKey(0), wav, lens, prev, imgs, masks)
    out = model.apply(params, wav, lens, prev, imgs, masks)
    assert out["logits"].shape == (2, 5, 40)

    # Beam decode through the shared generator contract.
    from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams

    enc = model.apply(params, wav, lens, imgs, masks, method=model.encode)
    state = model.apply(params, enc, 7, method=model.decode_init)
    state = tile_state_for_beams(state, 2)
    seqs, scores = beam_search(
        lambda t, s: model.apply(params, t, s, method=model.decode_step),
        state, 2, beam_size=2, max_len=6, eos_id=2, bos_id=2, pad_id=1,
        vocab_size=40,
    )
    assert seqs.shape == (2, 2, 6)


def test_xm_unit_generator_accepts_kv_dtype():
    """UnitGenerator.generate always forwards kv_dtype to decode_init
    (generator.py:83); the XM model's decode_init must accept it —
    regression for a TypeError that broke all enhanced-path generation."""
    from mm_s2ut.config import GenerationConfig
    from mm_s2ut.infer.generator import UnitGenerator

    model = MMXMTransformerModel(_cfg(), w2v_cfg=TINY_W2V)
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 1600).astype(np.float32)
    lens = np.asarray([1600, 1200], np.int32)
    imgs = (rng.randn(2, 4, 8).astype(np.float32),)
    masks = (np.zeros((2, 4), bool),)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(wav), jnp.asarray(lens),
        jnp.zeros((2, 5), jnp.int32),
        tuple(jnp.asarray(x) for x in imgs),
        tuple(jnp.asarray(x) for x in masks),
    )
    gen = UnitGenerator(
        model, params, GenerationConfig(beam=2, max_len_a=0.0, max_len_b=6)
    )
    hypos = gen.generate(wav, lens, imgs, masks)
    assert len(hypos) == 2 and len(hypos[0]) == 2


def test_s2t_task_end_to_end(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    vocab_lines = []
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    for w in words:
        vocab_lines.append(f"{w} 1")
    (tmp_path / "dict.txt").write_text("\n".join(vocab_lines) + "\n")
    for i in range(4):
        length = sr // 8
        write_wav(tmp_path / f"{i + 1}.wav", (0.2 * rng.randn(length)).astype(np.float32), sr)
        text = " ".join(rng.choice(words, 4))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, text, 4))
    write_manifest(tmp_path / "train.tsv", rows)

    cfg = Config(
        task="multimodal_speech_to_text",
        model=ModelConfig(
            decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=11, dtype="float32",
            multimodal=MultimodalConfig(multimodal_attention_type=None),
        ),
        data=DataConfig(
            data_root=str(tmp_path), audio_root=str(tmp_path),
            vocab_filename="dict.txt", max_tokens=100, num_buckets=1,
            use_audio_input=True,
        ),
        train=TrainConfig(update_freq=1, warmup_updates=2, lr=1e-3),
        mesh=MeshConfig(data=1),
    )
    task = registry.get_task("multimodal_speech_to_text")(cfg)
    assert len(task.tgt_dict) == 11  # 4 specials + 7 words
    model = task.build_model(TINY_W2V)
    batches = list(task.batch_iterator("train", 0))
    b = batches[0]
    assert b["src_features"].ndim == 2  # raw waveforms
    params = model.init(
        jax.random.PRNGKey(0), b["src_features"], b["src_lengths"],
        b["prev_output_tokens"],
    )
    out = model.apply(params, b["src_features"], b["src_lengths"], b["prev_output_tokens"])
    assert out["logits"].shape[-1] == 11


def test_resampled_concat():
    class Fake:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    big, small = Fake(100), Fake(10)
    rc = ResampledConcat([big, small], temperature=2.0, seed=0)
    idx = rc.epoch_indices(0)
    counts = {0: 0, 1: 0}
    for di, _ in idx:
        counts[di] += 1
    # T>1 upsamples the small split and downsamples the big one.
    assert counts[1] > 10 and counts[0] < 100
    assert counts[0] + counts[1] == len(rc)
    assert rc.epoch_indices(1) != rc.epoch_indices(2)
    # T=1 is the identity.
    rc1 = ResampledConcat([big, small], temperature=1.0, seed=0)
    assert len(rc1) == 110


def test_xm_multitask_heads():
    from mm_s2ut.config import MultitaskTaskConfig

    cfg = _cfg()
    cfg.multitask = [
        MultitaskTaskConfig(task_name="src_ctc", decoder_type="ctc",
                            loss_weight=1.0, vocab_size=12),
    ]
    model = MMXMTransformerModel(cfg, w2v_cfg=TINY_W2V)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1600).astype(np.float32))
    lens = jnp.asarray([1600, 1200])
    prev = jnp.zeros((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, lens, prev)
    out = model.apply(params, wav, lens, prev)
    assert out["multitask_logits"]["src_ctc"].shape[-1] == 12
