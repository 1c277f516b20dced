"""Model-layer tests: shapes, masking, fusion semantics, incremental parity."""
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_s2ut.config import ModelConfig, MultimodalConfig
from mm_s2ut.models.decoder import UnitDecoder
from mm_s2ut.models.fusion import (
    FusionBlock,
    MultimodalAttention,
    QFormer,
    SelectiveAttention,
    modality_dropout,
)
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder


def small_cfg(**kw) -> ModelConfig:
    cfg = ModelConfig(
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_embed_dim=64,
        decoder_ffn_embed_dim=128,
        decoder_layers=2,
        decoder_attention_heads=2,
        conv_channels=32,
        vocab_size=40,
        dtype="float32",
        multimodal=MultimodalConfig(
            image_feat_dim=[16],
            multimodal_attention_type="selective_attention",
            use_selective_gate=True,
        ),
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_selective_attention_masking():
    sa = SelectiveAttention(
        qdim=8, kdim=6, vdim=6, attn_dim=8, intermediate_dim=8, output_dim=8
    )
    q = jnp.ones((2, 3, 8))
    kv = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6))
    kpm = jnp.array([[False] * 5, [False, False, True, True, True]])
    params = sa.init(jax.random.PRNGKey(1), q, kv, kv, kpm)
    out, attn = sa.apply(params, q, kv, kv, kpm)
    assert out.shape == (2, 3, 8)
    assert attn.shape == (2, 1, 3, 5)
    # Masked keys get ~zero attention.
    np.testing.assert_allclose(np.asarray(attn[1, :, :, 2:]).sum(), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-5)


def test_multimodal_attention_merge():
    mm = MultimodalAttention(embed_dim=8, kdim=8, num_heads=1)
    text = jnp.ones((2, 3, 8))
    img = jnp.ones((2, 5, 8))
    tmask = jnp.zeros((2, 3), bool)
    params = mm.init(jax.random.PRNGKey(0), text, tmask, img, None, False)
    out, mask = mm.apply(params, text, tmask, img, None, False)
    assert out.shape == (2, 3, 8)
    out2, mask2 = mm.apply(params, text, tmask, img, None, True)
    assert out2.shape == (2, 8, 8)  # merged query stream
    assert mask2.shape == (2, 8)


def test_fusion_block_gate():
    fb = FusionBlock(
        embed_dim=8, image_dim=6, attention_type="selective_attention",
        use_selective_gate=True,
    )
    text = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    tmask = jnp.zeros((2, 4), bool)
    params = fb.init(jax.random.PRNGKey(2), text, tmask, img)
    out, mask = fb.apply(params, text, tmask, img)
    assert out.shape == text.shape
    # Gate output is a convex combination: bounded by text/attn range.
    assert np.isfinite(np.asarray(out)).all()


def test_modality_dropout_zeroes_one_stream():
    speech = jnp.ones((2, 4, 8))
    imgs = [jnp.ones((2, 5, 6))]
    n_audio = n_img = n_none = 0
    for i in range(50):
        s, im = modality_dropout(jax.random.PRNGKey(i), speech, imgs, 0.9, 0.5)
        sa, ia = float(jnp.abs(s).sum()), float(jnp.abs(im[0]).sum())
        if sa == 0:
            n_audio += 1
            assert ia > 0
        elif ia == 0:
            n_img += 1
            assert sa > 0
        else:
            n_none += 1
    assert n_audio > 5 and n_img > 5  # both branches exercised
    # Disabled via negative prob (reference sign<0 convention).
    s, im = modality_dropout(jax.random.PRNGKey(0), speech, imgs, -0.5, -0.5)
    assert float(jnp.abs(s).sum()) > 0 and float(jnp.abs(im[0]).sum()) > 0


def test_encoder_shapes_and_subsampling():
    enc = SpeechTransformerEncoder(
        embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2, conv_channels=16
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 80))
    lengths = jnp.array([37, 21])
    params = enc.init(jax.random.PRNGKey(1), feats, lengths)
    out = enc.apply(params, feats, lengths)
    # 37 -> 19 -> 10 under two stride-2 convs.
    assert out["encoder_out"].shape == (2, 10, 32)
    np.testing.assert_array_equal(np.asarray(out["lengths"]), [10, 6])
    assert bool(out["encoder_padding_mask"][1, 6]) is True
    assert bool(out["encoder_padding_mask"][1, 5]) is False


def test_decoder_incremental_matches_full():
    dec = UnitDecoder(vocab_size=20, embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2)
    B, S, T = 2, 7, 5
    enc_out = jax.random.normal(jax.random.PRNGKey(0), (B, S, 32))
    enc_mask = jnp.zeros((B, S), bool).at[1, 5:].set(True)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 20)
    params = dec.init(jax.random.PRNGKey(2), tokens, enc_out, enc_mask)
    full = dec.apply(params, tokens, enc_out, enc_mask)
    assert full.shape == (B, T, 20)

    state = dec.apply(params, enc_out, enc_mask, T, method=UnitDecoder.init_state)
    step_logits = []
    for t in range(T):
        logits, state = dec.apply(params, tokens[:, t : t + 1], state, method=UnitDecoder.step)
        step_logits.append(logits)
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4, rtol=1e-3)


def test_full_model_forward_and_fusion():
    cfg = small_cfg()
    model = MMS2UTModel(cfg)
    B, T = 2, 33
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lengths = jnp.array([33, 20])
    prev = jax.random.randint(jax.random.PRNGKey(1), (B, 6), 0, 40)
    imgs = (jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16)),)
    masks = (jnp.zeros((B, 9), bool),)
    params = model.init(jax.random.PRNGKey(3), feats, lengths, prev, imgs, masks)
    out = model.apply(params, feats, lengths, prev, imgs, masks)
    assert out["logits"].shape == (B, 6, 40)
    # Fusion params exist.
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat}
    assert any("fusion0" in n for n in names)
    # Train mode with modality dropout enabled runs under rngs.
    cfg2 = small_cfg()
    cfg2.multimodal.modality_dropout = 0.5
    cfg2.multimodal.audio_dropout = 0.5
    model2 = MMS2UTModel(cfg2)
    params2 = model2.init(jax.random.PRNGKey(4), feats, lengths, prev, imgs, masks)
    out2 = model2.apply(
        params2, feats, lengths, prev, imgs, masks, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(5), "modality": jax.random.PRNGKey(6)},
    )
    assert out2["logits"].shape == (B, 6, 40)


def test_qformer_shapes():
    qf = QFormer(embed_dim=16, num_heads=2, ffn_dim=32, num_queries=4,
                 num_query_layers=1, num_multimodal_layers=1)
    m1 = jnp.ones((2, 7, 16))
    m2 = jnp.ones((2, 5, 16))
    params = qf.init(jax.random.PRNGKey(0), m1, m2)
    out = qf.apply(params, m1, m2)
    assert out.shape == (2, 4, 16)
    out_img_only = qf.apply(params, None, m2)
    assert out_img_only.shape == (2, 4, 16)


def test_wav2vec2_speech_branch():
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

    w2v = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    cfg = small_cfg(speech_encoder_type="wav2vec2")
    model = MMS2UTModel(cfg, w2v_cfg=w2v)
    B = 2
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, 800))
    lens = jnp.array([800, 600])
    prev = jnp.zeros((B, 4), jnp.int32)
    imgs = (jax.random.normal(jax.random.PRNGKey(1), (B, 5, 16)),)
    masks = (jnp.zeros((B, 5), bool),)
    params = model.init(jax.random.PRNGKey(2), wav, lens, prev, imgs, masks)
    out = model.apply(params, wav, lens, prev, imgs, masks)
    assert out["logits"].shape == (B, 4, 40)


def test_wav2vec2_multimodal_inlayer_branch():
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

    w2v = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    cfg = small_cfg(speech_encoder_type="wav2vec2_multimodal")
    model = MMS2UTModel(cfg, w2v_cfg=w2v)
    B = 2
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, 800))
    lens = jnp.array([800, 600])
    prev = jnp.zeros((B, 4), jnp.int32)
    imgs = (jax.random.normal(jax.random.PRNGKey(1), (B, 5, 16)),)
    masks = (jnp.zeros((B, 5), bool),)
    params = model.init(jax.random.PRNGKey(2), wav, lens, prev, imgs, masks)
    out = model.apply(params, wav, lens, prev, imgs, masks)
    assert out["logits"].shape == (B, 4, 40)
    # The image stream must influence the output (fusion is in-layer).
    out2 = model.apply(params, wav, lens, prev, (imgs[0] * 0 + 1,), masks)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


def test_qformer_extractor_path():
    cfg = small_cfg()
    cfg.multimodal.multimodal_extractor_type = "q_former"
    cfg.multimodal.num_queries = 4
    cfg.multimodal.num_query_layers = 1
    cfg.multimodal.num_multimodal_layers = 1
    model = MMS2UTModel(cfg)
    B, T = 2, 33
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lengths = jnp.array([33, 20])
    prev = jnp.zeros((B, 4), jnp.int32)
    imgs = (jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16)),)
    masks = (jnp.zeros((B, 9), bool),)
    params = model.init(jax.random.PRNGKey(3), feats, lengths, prev, imgs, masks)
    out = model.apply(params, feats, lengths, prev, imgs, masks)
    assert out["logits"].shape == (B, 4, 40)
    names = {"/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("q_former" in n for n in names)


def test_external_multimodal_transformer_type():
    cfg = small_cfg()
    cfg.multimodal.multimodal_attention_type = None
    # bypass validate(): external type is a model-level extension
    object.__setattr__(cfg.multimodal, "multimodal_attention_type",
                       "external_multimodal_transformer")
    cfg.multimodal.external_multimodal_transformer_layers = 2
    model = MMS2UTModel(cfg)
    B, T = 2, 33
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lengths = jnp.array([33, 20])
    prev = jnp.zeros((B, 4), jnp.int32)
    imgs = (jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16)),)
    masks = (jnp.zeros((B, 9), bool),)
    params = model.init(jax.random.PRNGKey(3), feats, lengths, prev, imgs, masks)
    out = model.apply(params, feats, lengths, prev, imgs, masks)
    assert out["logits"].shape == (B, 4, 40)
    names = {"/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("external_tower0" in n for n in names)


def test_multitask_heads_and_losses():
    from mm_s2ut.config import MultitaskTaskConfig
    from mm_s2ut.train.criterion import speech_to_unit_criterion

    cfg = small_cfg()
    cfg.multitask = [
        MultitaskTaskConfig(task_name="src_ctc", decoder_type="ctc",
                            loss_weight=0.5, vocab_size=12),
        MultitaskTaskConfig(task_name="tgt_lm", decoder_type="transformer",
                            loss_weight=2.0, vocab_size=15,
                            decoder_layers=1, decoder_embed_dim=32,
                            decoder_attention_heads=2),
    ]
    model = MMS2UTModel(cfg)
    B, T = 2, 33
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lengths = jnp.array([33, 20])
    prev = jnp.zeros((B, 4), jnp.int32)
    mt_prev = {"tgt_lm": jnp.zeros((B, 5), jnp.int32)}
    params = model.init(jax.random.PRNGKey(1), feats, lengths, prev,
                        multitask_prev_tokens=mt_prev)
    out = model.apply(params, feats, lengths, prev,
                      multitask_prev_tokens=mt_prev)
    assert out["multitask_logits"]["src_ctc"].shape[-1] == 12
    assert out["multitask_logits"]["tgt_lm"].shape == (B, 5, 15)

    batch = {
        "target": jnp.full((B, 4), 5, jnp.int32),
        "multitask_targets": {
            "src_ctc": jnp.full((B, 3), 4, jnp.int32),
            "tgt_lm": jnp.full((B, 5), 6, jnp.int32),
        },
    }
    loss_with, metrics = speech_to_unit_criterion(
        out, batch, label_smoothing=0.1, multitask=tuple(cfg.multitask)
    )
    loss_without, _ = speech_to_unit_criterion(out, batch, label_smoothing=0.1)
    assert float(loss_with) > float(loss_without)
    assert "src_ctc_loss" in metrics and "tgt_lm_loss" in metrics


def test_in_graph_positions_match_table():
    """The in-graph sin/cos positions equal the fairseq-convention table
    (the table function is kept as the documented oracle)."""
    from mm_s2ut.models.layers import SinusoidalPositionalEmbedding, sinusoidal_positions

    dim, T = 16, 12
    mod = SinusoidalPositionalEmbedding(dim)
    x = jnp.zeros((1, T, dim))
    pe = np.asarray(mod.apply({}, x))[0]
    table = sinusoidal_positions(64, dim)[:T]
    np.testing.assert_allclose(pe, table, atol=1e-5)
    # Offset slicing matches too (decode path).
    pe_off = np.asarray(mod.apply({}, x[:, :4], offset=jnp.asarray(3)))[0]
    np.testing.assert_allclose(pe_off, table[3:7], atol=1e-5)


def test_bridge_tower_type():
    """bridge_tower fusion reachable from config (reference
    BridgeTowerTransformerEncoder, fuse.py:360-447): forward works, the
    tower's params exist, and the image stream changes the output."""
    cfg = small_cfg()
    cfg.multimodal.multimodal_attention_type = "bridge_tower"
    cfg.multimodal.external_multimodal_transformer_layers = 2
    model = MMS2UTModel(cfg)
    B, T = 2, 33
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    lengths = jnp.array([33, 20])
    prev = jnp.zeros((B, 4), jnp.int32)
    imgs = (jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16)),)
    masks = (jnp.zeros((B, 9), bool),)
    params = model.init(jax.random.PRNGKey(3), feats, lengths, prev, imgs, masks)
    out = model.apply(params, feats, lengths, prev, imgs, masks)
    assert out["logits"].shape == (B, 4, 40)
    names = {"/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("bridge_tower0" in n for n in names)
    # The co-attention tower consumes the image stream: different image →
    # different logits.
    imgs2 = (imgs[0] + 1.0,)
    out2 = model.apply(params, feats, lengths, prev, imgs2, masks)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))
    # Also loadable through the yaml surface (validate() accepts it).
    from mm_s2ut.config import MultimodalConfig

    MultimodalConfig(multimodal_attention_type="bridge_tower").validate()
