"""Fairseq-checkpoint converter parity tests.

Builds torch-side graphs with *fairseq state-dict naming* (the schema of
the reference's trained checkpoints, loaded at reference
models/mm_s2s_transformer.py:228-244,229), converts them with
mm_s2ut.utils.fairseq_convert, and asserts logits parity against this
framework's JAX models — the HiFiGAN-converter test pattern
(tests/test_hifigan.py) applied to the flagship model and mHuBERT.
"""
import pytest

pytestmark = pytest.mark.slow
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from mm_s2ut.config import ModelConfig, MultimodalConfig  # noqa: E402
from mm_s2ut.models.layers import sinusoidal_positions  # noqa: E402
from mm_s2ut.models.mm_s2ut import MMS2UTModel  # noqa: E402
from mm_s2ut.utils.fairseq_convert import (  # noqa: E402
    convert_fairseq_hubert,
    convert_mm_s2ut_checkpoint,
)

D, FFN, HEADS, NL = 32, 48, 2, 2
IMG_D, V, CONV_MID = 24, 40, 16


class _TAttn(tnn.Module):
    """Fairseq-style multi-head attention (separate q/k/v/out Linears)."""

    def __init__(self, dim, heads, kdim=None):
        super().__init__()
        kdim = kdim or dim
        self.heads, self.hd = heads, dim // heads
        self.q_proj = tnn.Linear(dim, dim)
        self.k_proj = tnn.Linear(kdim, dim)
        self.v_proj = tnn.Linear(kdim, dim)
        self.out_proj = tnn.Linear(dim, dim)

    def forward(self, q, kv=None, causal=False):
        kv = q if kv is None else kv
        B, T, _ = q.shape
        S = kv.shape[1]
        qh = (self.q_proj(q) * self.hd ** -0.5).view(B, T, self.heads, self.hd)
        kh = self.k_proj(kv).view(B, S, self.heads, self.hd)
        vh = self.v_proj(kv).view(B, S, self.heads, self.hd)
        logits = torch.einsum("bqhd,bkhd->bhqk", qh, kh)
        if causal:
            mask = torch.triu(torch.ones(T, S, dtype=torch.bool), 1)
            logits = logits.masked_fill(mask, float("-inf"))
        w = logits.softmax(-1)
        out = torch.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, T, -1)
        return self.out_proj(out)


class _TEncLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = _TAttn(D, HEADS)
        self.self_attn_layer_norm = tnn.LayerNorm(D)
        self.fc1 = tnn.Linear(D, FFN)
        self.fc2 = tnn.Linear(FFN, D)
        self.final_layer_norm = tnn.LayerNorm(D)

    def forward(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        x = x + self.fc2(F.relu(self.fc1(self.final_layer_norm(x))))
        return x


class _TDecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = _TAttn(D, HEADS)
        self.self_attn_layer_norm = tnn.LayerNorm(D)
        self.encoder_attn = _TAttn(D, HEADS)
        self.encoder_attn_layer_norm = tnn.LayerNorm(D)
        self.fc1 = tnn.Linear(D, FFN)
        self.fc2 = tnn.Linear(FFN, D)
        self.final_layer_norm = tnn.LayerNorm(D)

    def forward(self, x, enc):
        x = x + self.self_attn(self.self_attn_layer_norm(x), causal=True)
        x = x + self.encoder_attn(self.encoder_attn_layer_norm(x), enc)
        x = x + self.fc2(F.relu(self.fc1(self.final_layer_norm(x))))
        return x


class _TSelectiveAttention(tnn.Module):
    """Reference SelectiveAttention graph (fuse.py:36-117), 1 head."""

    def __init__(self):
        super().__init__()
        self.q_proj = tnn.Linear(D, D)
        self.k_proj = tnn.Linear(IMG_D, D)
        self.v_proj = tnn.Linear(IMG_D, D)
        self.proj = tnn.Linear(D, D)

    def forward(self, text, img):
        q = self.q_proj(text) * (D ** -0.5)
        k = self.k_proj(img)
        v = self.v_proj(img)
        attn = (q @ k.transpose(1, 2)).softmax(-1)
        return self.proj(attn @ v)


class _TEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        sub = tnn.Module()
        sub.conv_layers = tnn.ModuleList([
            tnn.Conv1d(80, CONV_MID, 5, stride=2, padding=2),
            tnn.Conv1d(CONV_MID // 2, 2 * D, 5, stride=2, padding=2),
        ])
        self.subsample = sub
        self.transformer_layers = tnn.ModuleList([_TEncLayer() for _ in range(NL)])
        self.layer_norm = tnn.LayerNorm(D)
        self.selective_attns = tnn.ModuleList([_TSelectiveAttention()])
        self.gate_denses = tnn.ModuleList([tnn.Linear(2 * D, D)])
        self.image_pre_norm_module = tnn.LayerNorm(IMG_D)

    def forward(self, feats, img):
        x = feats.transpose(1, 2)
        for conv in self.subsample.conv_layers:
            x = F.glu(conv(x), dim=1)
        x = x.transpose(1, 2) * math.sqrt(D)
        x = x + torch.tensor(sinusoidal_positions(x.shape[1], D))[None]
        for layer in self.transformer_layers:
            x = layer(x)
        x = self.layer_norm(x)
        # Top fusion: pre-norm image → selective attention → sigmoid gate
        # (reference fuse_img_feat, mm_s2s_transformer.py:594-622).
        imgn = self.image_pre_norm_module(img)
        attn_out = self.selective_attns[0](x, imgn)
        g = torch.sigmoid(self.gate_denses[0](torch.cat([attn_out, x], -1)))
        return (1.0 - g) * x + g * attn_out


class _TDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed_tokens = tnn.Embedding(V, D)
        self.layers = tnn.ModuleList([_TDecLayer() for _ in range(NL)])
        self.layer_norm = tnn.LayerNorm(D)
        self.output_projection = tnn.Linear(D, V, bias=False)
        self.output_projection.weight = self.embed_tokens.weight  # tied

    def forward(self, tokens, enc):
        y = self.embed_tokens(tokens) * math.sqrt(D)
        y = y + torch.tensor(sinusoidal_positions(tokens.shape[1], D))[None]
        for layer in self.layers:
            y = layer(y, enc)
        return self.output_projection(self.layer_norm(y))


class _TFlagship(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _TEncoder()
        self.decoder = _TDecoder()

    def forward(self, feats, img, tokens):
        return self.decoder(tokens, self.encoder(feats, img))


def _jax_cfg():
    return ModelConfig(
        encoder_embed_dim=D, encoder_ffn_embed_dim=FFN, encoder_layers=NL,
        encoder_attention_heads=HEADS, decoder_embed_dim=D,
        decoder_ffn_embed_dim=FFN, decoder_layers=NL,
        decoder_attention_heads=HEADS, conv_channels=CONV_MID,
        vocab_size=V, dtype="float32",
        multimodal=MultimodalConfig(
            image_feat_dim=[IMG_D],
            multimodal_attention_type="selective_attention",
            use_selective_gate=True,
            image_pre_norm=True,
            is_fusion_top=True,
        ),
    )


def test_flagship_converter_parity(tmp_path):
    torch.manual_seed(0)
    tmodel = _TFlagship().eval()
    ckpt = tmp_path / "checkpoint_best.pt"
    torch.save({"model": tmodel.state_dict()}, ckpt)

    variables = convert_mm_s2ut_checkpoint(ckpt)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    rng = np.random.RandomState(1)
    B, T, Tt = 2, 37, 6
    feats = rng.randn(B, T, 80).astype(np.float32) * 0.5
    img = rng.randn(B, 7, IMG_D).astype(np.float32)
    tokens = rng.randint(0, V, (B, Tt)).astype(np.int64)

    with torch.no_grad():
        want = tmodel(
            torch.tensor(feats), torch.tensor(img), torch.tensor(tokens)
        ).numpy()

    model = MMS2UTModel(_jax_cfg())
    out = model.apply(
        variables,
        jnp.asarray(feats), jnp.full((B,), T, jnp.int32),
        jnp.asarray(tokens.astype(np.int32)),
        imgs_list=(jnp.asarray(img),),
        img_masks_list=(jnp.zeros((B, 7), bool),),
        deterministic=True,
    )
    got = np.asarray(out["logits"] if isinstance(out, dict) else out)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_flagship_converter_strict_flags_unknown(tmp_path):
    torch.manual_seed(0)
    sd = _TFlagship().state_dict()
    sd["encoder.mystery_module.weight"] = torch.zeros(3, 3)
    ckpt = tmp_path / "c.pt"
    torch.save({"model": sd}, ckpt)
    with pytest.raises(ValueError, match="unmapped"):
        convert_mm_s2ut_checkpoint(ckpt)
    convert_mm_s2ut_checkpoint(ckpt, strict=False)  # downgraded to warning


def test_flagship_converter_rejects_untied_output(tmp_path):
    torch.manual_seed(0)
    tmodel = _TFlagship()
    sd = tmodel.state_dict()
    sd["decoder.output_projection.weight"] = torch.randn(V, D)
    ckpt = tmp_path / "c.pt"
    torch.save({"model": sd}, ckpt)
    with pytest.raises(ValueError, match="not tied"):
        convert_mm_s2ut_checkpoint(ckpt)


# --- fairseq-format mHuBERT ------------------------------------------------

_HF_TO_FAIRSEQ = [
    ("feature_extractor.conv_layers.0.layer_norm.", "feature_extractor.conv_layers.0.2."),
    ("feature_extractor.conv_layers.", None),  # handled specially (conv.)
    ("feature_projection.layer_norm.", "layer_norm."),
    ("feature_projection.projection.", "post_extract_proj."),
    ("masked_spec_embed", "mask_emb"),
    ("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0."),
    ("encoder.layers.", None),  # handled specially
]


def _hf_name_to_fairseq(k: str) -> str:
    import re

    k = re.sub(r"^feature_extractor\.conv_layers\.0\.layer_norm\.",
               "feature_extractor.conv_layers.0.2.", k)
    k = re.sub(r"^feature_extractor\.conv_layers\.(\d+)\.conv\.",
               r"feature_extractor.conv_layers.\1.0.", k)
    k = re.sub(r"^feature_projection\.layer_norm\.", "layer_norm.", k)
    k = re.sub(r"^feature_projection\.projection\.", "post_extract_proj.", k)
    k = re.sub(r"^masked_spec_embed$", "mask_emb", k)
    k = re.sub(r"^encoder\.pos_conv_embed\.conv\.", "encoder.pos_conv.0.", k)
    k = re.sub(r"^encoder\.layers\.(\d+)\.attention\.", r"encoder.layers.\1.self_attn.", k)
    k = re.sub(r"^encoder\.layers\.(\d+)\.layer_norm\.",
               r"encoder.layers.\1.self_attn_layer_norm.", k)
    k = re.sub(r"^encoder\.layers\.(\d+)\.feed_forward\.intermediate_dense\.",
               r"encoder.layers.\1.fc1.", k)
    k = re.sub(r"^encoder\.layers\.(\d+)\.feed_forward\.output_dense\.",
               r"encoder.layers.\1.fc2.", k)
    return k


def test_fairseq_hubert_converter_parity(tmp_path):
    """Tiny torch HubertModel → fairseq-named .pt → convert → JAX parity."""
    transformers = pytest.importorskip("transformers")
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Model

    hf_cfg = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", conv_bias=False,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    tmodel = transformers.HubertModel(hf_cfg).eval()
    fairseq_sd = {
        _hf_name_to_fairseq(k): v for k, v in tmodel.state_dict().items()
    }
    ckpt = tmp_path / "mhubert.pt"
    torch.save(
        {
            "model": fairseq_sd,
            "cfg": {"model": {
                "encoder_embed_dim": 32, "encoder_attention_heads": 2,
                "encoder_ffn_embed_dim": 48,
                "conv_feature_layers": "[(16, 10, 5), (16, 3, 2)]",
                "extractor_mode": "default", "layer_norm_first": False,
                "conv_pos": 16, "conv_pos_groups": 4,
            }},
        },
        ckpt,
    )

    cfg, variables = convert_fairseq_hubert(ckpt)
    assert cfg.hidden_size == 32 and cfg.num_hidden_layers == 2
    assert cfg.conv_stride == (5, 2)

    rng = np.random.RandomState(2)
    wav = rng.randn(2, 1600).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tmodel(torch.tensor(wav)).last_hidden_state.numpy()

    model = Wav2Vec2Model(cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    out = model.apply(
        variables, jnp.asarray(wav), jnp.full((2,), 1600, jnp.int32),
        deterministic=True,
    )
    got = np.asarray(out["last_hidden_state"])[:, : want.shape[1]]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
