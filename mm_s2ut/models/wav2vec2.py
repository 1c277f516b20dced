"""wav2vec 2.0 / HuBERT speech encoder family in flax.

TPU-native equivalent of the pretrained speech encoders the reference
loads from HF/fairseq (SURVEY.md F10; reference use sites:
models/mm_s2s_transformer.py:228-258 (mhubert / Wav2Vec2ForCTC),
:408-462 (extract_features forward), models/fuse.py:450-766
(Wav2Vec2WithMultiModal in-layer fusion), scripts/transcript.py:16-37
(CTC ASR, F15)). Graph follows HF ``Wav2Vec2Model`` so published
checkpoints convert weight-for-weight:

conv feature extractor (7 convs, 320× downsampling) → feature projection
→ (train) span masking with a learned mask embedding → grouped
positional conv → transformer encoder (post-norm, or pre-norm
"stable layer norm" for large models) → all hidden states.

``Wav2Vec2WithMultiModal`` injects cross-attention to image features into
the top N encoder layers with a sigmoid gate — the in-layer fusion
variant (reference models/fuse.py:450-766).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mm_s2ut.models.layers import MultiHeadAttention, make_padding_bias

Dtype = Any


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large/hubert-l)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    vocab_size: int = 32  # CTC head (ASR use)
    # LayerDrop (https://arxiv.org/abs/1909.11556): at train time each
    # encoder layer is skipped with this probability — one draw per layer
    # per forward, whole batch (reference fuse.py:599-601 / HF encoder).
    layerdrop: float = 0.0
    # Per-layer activation rematerialisation (reference uses
    # torch.utils.checkpoint inside the fused encoder, fuse.py:603-617).
    gradient_checkpointing: bool = False
    # TPU knobs (not part of the HF surface): fused Pallas attention, and
    # optional frame padding to a lane-friendly multiple (changes the
    # padded output length; masked positions carry no information).
    use_flash_attention: bool = True
    pad_to_multiple: int = 1

    @classmethod
    def from_args(cls, args=None) -> "Wav2Vec2Config":
        """Field overrides from a plain dict (ModelConfig.w2v_args — the
        yaml analog of the reference reading dims from the w2v_path
        checkpoint's saved args). Yaml lists become the tuple-typed conv
        specs."""
        args = dict(args or {})
        for k in ("conv_dim", "conv_stride", "conv_kernel"):
            if k in args:
                args[k] = tuple(args[k])
        return cls(**args)

    @classmethod
    def from_hf(cls, hf_cfg) -> "Wav2Vec2Config":
        return cls(
            conv_dim=tuple(hf_cfg.conv_dim),
            conv_stride=tuple(hf_cfg.conv_stride),
            conv_kernel=tuple(hf_cfg.conv_kernel),
            conv_bias=hf_cfg.conv_bias,
            feat_extract_norm=hf_cfg.feat_extract_norm,
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
            do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            mask_time_prob=getattr(hf_cfg, "mask_time_prob", 0.05),
            layerdrop=getattr(hf_cfg, "layerdrop", 0.0),
            mask_time_length=getattr(hf_cfg, "mask_time_length", 10),
            vocab_size=getattr(hf_cfg, "vocab_size", 32),
        )

    def feature_lengths(self, sample_lengths: jnp.ndarray) -> jnp.ndarray:
        out = sample_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            out = (out - k) // s + 1
        return out


def span_mask(
    key: jax.Array,
    shape: Tuple[int, int],
    mask_prob: float,
    mask_length: int,
    lengths: Optional[jnp.ndarray] = None,
    min_masks: int = 2,
) -> jnp.ndarray:
    """SpecAugment-style span masking (HF compute_mask_indices semantics,
    the --apply-mask path, reference enhanced/1_train.sh:46): pick span
    starts at random, expand to mask_length. Static-shape: the span count
    is the padded-length expectation; per-row valid-length masking keeps
    spans inside each utterance. Returns (B, T) bool, True = masked."""
    B, T = shape
    n_spans = max(min_masks, int(mask_prob * T / mask_length + 0.5))
    n_spans = min(n_spans, max(T // mask_length, 1))
    scores = jax.random.uniform(key, (B, T))
    if lengths is not None:
        valid = jnp.arange(T)[None, :] < (lengths[:, None] - mask_length + 1)
        scores = jnp.where(valid, scores, 2.0)  # never start in padding
    _, starts = jax.lax.top_k(-scores, n_spans)  # (B, n_spans) smallest scores
    t = jnp.arange(T)[None, None, :]
    span = (t >= starts[..., None]) & (t < starts[..., None] + mask_length)
    mask = span.any(axis=1)
    if lengths is not None:
        mask &= jnp.arange(T)[None, :] < lengths[:, None]
    return mask


class FeatureEncoder(nn.Module):
    """Raw waveform → conv features (B, T/320, conv_dim[-1])."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        x = waveform[..., None]  # (B, S, 1)
        c = self.cfg
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=c.conv_bias,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            if c.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=c.layer_norm_eps, dtype=self.dtype,
                    name="group_norm",
                )(x)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=c.layer_norm_eps, dtype=self.dtype, name=f"layer_norm{i}"
                )(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        k = c.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(
            c.hidden_size, (k,), padding=[(pad, pad)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]
        return jax.nn.gelu(h, approximate=False)


class Wav2Vec2EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic=True, key_padding_mask=None):
        c = self.cfg
        attn = MultiHeadAttention(
            c.hidden_size, c.num_attention_heads, c.attention_dropout,
            dtype=self.dtype, name="attention",
        )
        ln1 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")
        ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")
        drop = nn.Dropout(c.hidden_dropout)

        use_flash = c.use_flash_attention and key_padding_mask is not None
        akw = dict(
            bias=None if use_flash else bias,
            deterministic=deterministic,
            key_padding_mask=key_padding_mask if use_flash else None,
            use_flash=use_flash,
        )
        if c.do_stable_layer_norm:  # pre-norm (large)
            h, _, _ = attn(ln1(x), **akw)
            x = x + drop(h, deterministic=deterministic)
            h = self._ffn(ln2(x), deterministic)
            x = x + h
        else:  # post-norm (base)
            h, _, _ = attn(x, **akw)
            x = ln1(x + drop(h, deterministic=deterministic))
            x = ln2(x + self._ffn(x, deterministic))
        return x

    def _ffn(self, x, deterministic):
        c = self.cfg
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(h)
        return nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)


class Wav2Vec2Model(nn.Module):
    """HF-graph wav2vec2/HuBERT encoder. ``__call__`` returns
    {"last_hidden_state", "hidden_states", "padding_mask", "lengths"}."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.feature_extractor = FeatureEncoder(c, dtype=self.dtype)
        self.feature_projection_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype
        )
        self.feature_projection = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.masked_spec_embed = self.param(
            "masked_spec_embed", nn.initializers.uniform(1.0), (c.hidden_size,)
        )
        self.pos_conv = PositionalConvEmbedding(c, dtype=self.dtype)
        self.encoder_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        # static_argnums counts self: deterministic (pos 3) must stay a
        # Python bool under remat.
        layer_cls = (
            nn.remat(Wav2Vec2EncoderLayer, static_argnums=(3,))
            if c.gradient_checkpointing else Wav2Vec2EncoderLayer
        )
        self.layers = [
            layer_cls(c, dtype=self.dtype, name=f"layer{i}")
            for i in range(c.num_hidden_layers)
        ]
        self.drop = nn.Dropout(c.hidden_dropout)

    def __call__(
        self,
        waveform: jnp.ndarray,  # (B, S)
        lengths: Optional[jnp.ndarray] = None,  # (B,) sample counts
        apply_mask: bool = False,
        deterministic: bool = True,
        freeze_feature_extractor: bool = True,
    ) -> Dict[str, Any]:
        c = self.cfg
        feats = self.feature_extractor(waveform.astype(self.dtype))
        if freeze_feature_extractor:
            # The reference always freezes the conv frontend
            # (mm_s2s_transformer.py:231, 1_train.sh --freeze-finetune-updates).
            feats = jax.lax.stop_gradient(feats)
        T_true = feats.shape[1]
        if c.pad_to_multiple > 1:
            pad = (-feats.shape[1]) % c.pad_to_multiple
            if pad:
                feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        T = feats.shape[1]
        feat_lens = (
            c.feature_lengths(lengths) if lengths is not None
            else jnp.full((feats.shape[0],), T_true, jnp.int32)
        )
        padding_mask = jnp.arange(T)[None, :] >= feat_lens[:, None]

        norm_feats = self.feature_projection_norm(feats)
        hidden = self.feature_projection(norm_feats)

        if apply_mask and not deterministic and c.mask_time_prob > 0:
            mask = span_mask(
                self.make_rng("mask"), (hidden.shape[0], T),
                c.mask_time_prob, c.mask_time_length, feat_lens,
            )
            hidden = jnp.where(
                mask[..., None], self.masked_spec_embed.astype(self.dtype), hidden
            )

        hidden = hidden * (~padding_mask)[..., None].astype(hidden.dtype)
        hidden = hidden + self.pos_conv(hidden)
        if not c.do_stable_layer_norm:
            hidden = self.encoder_norm(hidden)
        hidden = self.drop(hidden, deterministic=deterministic)

        bias = make_padding_bias(padding_mask, self.dtype)
        states = [hidden]
        use_layerdrop = not deterministic and c.layerdrop > 0
        for layer in self.layers:
            # Positional call: remat static_argnums counts self —
            # (x=1, bias=2, deterministic=3, key_padding_mask=4).
            out = layer(hidden, bias, deterministic, padding_mask)
            if use_layerdrop:
                # One uniform draw per layer per forward, whole batch
                # (reference fuse.py:599-601). Static graph: compute the
                # layer and select, preserving the skip distribution.
                u = jax.random.uniform(self.make_rng("dropout"))
                out = jnp.where(u < c.layerdrop, hidden, out)
            hidden = out
            states.append(hidden)
        if c.do_stable_layer_norm:
            hidden = self.encoder_norm(hidden)
            states[-1] = hidden
        return {
            "last_hidden_state": hidden,
            "hidden_states": states,
            "padding_mask": padding_mask,
            "lengths": feat_lens,
        }


class Wav2Vec2ForCTC(nn.Module):
    """Encoder + CTC vocabulary head (eval ASR, SURVEY.md F15)."""

    cfg: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        self.wav2vec2 = Wav2Vec2Model(self.cfg, dtype=self.dtype)
        self.lm_head = nn.Dense(self.cfg.vocab_size, dtype=self.dtype)

    def __call__(self, waveform, lengths=None, deterministic=True):
        out = self.wav2vec2(waveform, lengths, deterministic=deterministic)
        out["logits"] = self.lm_head(out["last_hidden_state"]).astype(jnp.float32)
        return out


class Wav2Vec2WithMultiModal(nn.Module):
    """In-layer image fusion: the top ``num_cross_attention_layers``
    encoder layers get cross-attention to image features merged via a
    sigmoid gate (reference Wav2Vec2WithMultiModal, models/fuse.py:450-766;
    selected by multimodal_attention_type: wav2vec2_multimodal)."""

    cfg: Wav2Vec2Config
    m2_dim: int = 768
    num_cross_attention_layers: int = 1
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.wav2vec2 = Wav2Vec2Model(c, dtype=self.dtype)
        self.cross_attns = [
            MultiHeadAttention(
                c.hidden_size, c.num_attention_heads, self.dropout,
                dtype=self.dtype, name=f"cross_attn{i}",
            )
            for i in range(self.num_cross_attention_layers)
        ]
        self.cross_norms = [
            nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=f"cross_norm{i}")
            for i in range(self.num_cross_attention_layers)
        ]
        self.gates = [
            nn.Dense(c.hidden_size, dtype=self.dtype, name=f"gate{i}")
            for i in range(self.num_cross_attention_layers)
        ]

    def __call__(
        self,
        waveform: jnp.ndarray,
        lengths: Optional[jnp.ndarray],
        image: jnp.ndarray,  # (B, Ti, m2_dim)
        image_mask: Optional[jnp.ndarray] = None,
        apply_mask: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        c = self.cfg
        base = self.wav2vec2
        feats = jax.lax.stop_gradient(base.feature_extractor(waveform.astype(self.dtype)))
        T = feats.shape[1]
        feat_lens = (
            c.feature_lengths(lengths) if lengths is not None
            else jnp.full((feats.shape[0],), T, jnp.int32)
        )
        padding_mask = jnp.arange(T)[None, :] >= feat_lens[:, None]
        hidden = base.feature_projection(base.feature_projection_norm(feats))
        if apply_mask and not deterministic and c.mask_time_prob > 0:
            mask = span_mask(
                self.make_rng("mask"), (hidden.shape[0], T),
                c.mask_time_prob, c.mask_time_length, feat_lens,
            )
            hidden = jnp.where(
                mask[..., None], base.masked_spec_embed.astype(self.dtype), hidden
            )
        hidden = hidden * (~padding_mask)[..., None].astype(hidden.dtype)
        hidden = hidden + base.pos_conv(hidden)
        if not c.do_stable_layer_norm:
            hidden = base.encoder_norm(hidden)
        # Encoder-input hidden dropout, same as Wav2Vec2Model.__call__ (and
        # the HF graph the reference variant inherits) — omitting it
        # silently regularizes the multimodal branch differently.
        hidden = base.drop(hidden, deterministic=deterministic)

        bias = make_padding_bias(padding_mask, self.dtype)
        img_bias = make_padding_bias(image_mask, self.dtype) if image_mask is not None else None
        n_fused = self.num_cross_attention_layers
        states = [hidden]
        use_layerdrop = not deterministic and c.layerdrop > 0
        for i, layer in enumerate(base.layers):
            x_in = hidden
            # Positional call: remat static_argnums counts self —
            # (x=1, bias=2, deterministic=3, key_padding_mask=4).
            hidden = layer(hidden, bias, deterministic, padding_mask)
            j = i - (len(base.layers) - n_fused)
            if j >= 0:
                img = image.astype(hidden.dtype)
                attn_out, _, _ = self.cross_attns[j](
                    self.cross_norms[j](hidden), key=img, bias=img_bias,
                    deterministic=deterministic,
                )
                g = jax.nn.sigmoid(
                    self.gates[j](jnp.concatenate([attn_out, hidden], axis=-1))
                )
                hidden = (1.0 - g) * hidden + g * attn_out
            if use_layerdrop:
                # The reference's LayerDrop wraps its custom layer forward
                # INCLUDING the in-layer fusion (fuse.py:599-624), so the
                # skip covers the fused block too.
                u = jax.random.uniform(self.make_rng("dropout"))
                hidden = jnp.where(u < c.layerdrop, x_in, hidden)
            states.append(hidden)
        if c.do_stable_layer_norm:
            hidden = base.encoder_norm(hidden)
            states[-1] = hidden
        return {
            "last_hidden_state": hidden,
            "hidden_states": states,
            "padding_mask": padding_mask,
            "lengths": feat_lens,
        }


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: Wav2Vec2Config) -> Dict[str, Any]:
    """HF Wav2Vec2Model/HubertModel (torch) state dict → flax params for
    :class:`Wav2Vec2Model`. Accepts dicts with or without the
    'wav2vec2.'/'hubert.' prefix; a 'lm_head.*' pair (Wav2Vec2ForCTC) is
    returned under "lm_head"."""

    def strip(k: str) -> str:
        for p in ("wav2vec2.", "hubert."):
            if k.startswith(p):
                return k[len(p):]
        return k

    sd = {strip(k): v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        conv = {"kernel": np.transpose(sd[f"feature_extractor.conv_layers.{i}.conv.weight"], (2, 1, 0))}
        if cfg.conv_bias:
            conv["bias"] = sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
        fe[f"conv{i}"] = conv
        if cfg.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = {
                "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
                "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
            }
        elif cfg.feat_extract_norm == "layer":
            fe[f"layer_norm{i}"] = {
                "scale": sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"],
                "bias": sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
    p["feature_extractor"] = fe

    p["feature_projection_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["feature_projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }
    p["masked_spec_embed"] = sd.get(
        "masked_spec_embed", np.zeros((cfg.hidden_size,), np.float32)
    )

    # Positional conv: weight-norm parametrization (g, v) or plain weight.
    if "encoder.pos_conv_embed.conv.weight" in sd:
        w = sd["encoder.pos_conv_embed.conv.weight"]
    else:
        for gk in (
            "encoder.pos_conv_embed.conv.weight_g",
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
        ):
            if gk in sd:
                g = sd[gk]
                v = sd[gk.replace("weight_g", "weight_v").replace("original0", "original1")]
                # Weight-norm fold. HF applies weight_norm with dim=2 (per
                # kernel position); infer the normalized axes from g's
                # broadcast shape so both dim=0 and dim=2 layouts fold.
                g = np.reshape(g, [g.shape[i] if i < g.ndim else 1 for i in range(v.ndim)]) \
                    if g.ndim != v.ndim else g
                axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
                norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
                w = g * v / norm
                break
        else:
            raise KeyError("pos_conv weight not found")
    # torch grouped conv (out, in/groups, k) → flax (k, in/groups, out)
    p["pos_conv"] = {
        "conv": {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": sd["encoder.pos_conv_embed.conv.bias"],
        }
    }
    p["encoder_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p[f"layer{i}"] = {
            "attention": {
                "q_proj": {"kernel": sd[f"{b}.attention.q_proj.weight"].T,
                           "bias": sd[f"{b}.attention.q_proj.bias"]},
                "k_proj": {"kernel": sd[f"{b}.attention.k_proj.weight"].T,
                           "bias": sd[f"{b}.attention.k_proj.bias"]},
                "v_proj": {"kernel": sd[f"{b}.attention.v_proj.weight"].T,
                           "bias": sd[f"{b}.attention.v_proj.bias"]},
                "out_proj": {"kernel": sd[f"{b}.attention.out_proj.weight"].T,
                             "bias": sd[f"{b}.attention.out_proj.bias"]},
            },
            "layer_norm": {"scale": sd[f"{b}.layer_norm.weight"],
                           "bias": sd[f"{b}.layer_norm.bias"]},
            "final_layer_norm": {"scale": sd[f"{b}.final_layer_norm.weight"],
                                 "bias": sd[f"{b}.final_layer_norm.bias"]},
            "intermediate_dense": {"kernel": sd[f"{b}.feed_forward.intermediate_dense.weight"].T,
                                   "bias": sd[f"{b}.feed_forward.intermediate_dense.bias"]},
            "output_dense": {"kernel": sd[f"{b}.feed_forward.output_dense.weight"].T,
                             "bias": sd[f"{b}.feed_forward.output_dense.bias"]},
        }
    out = {"params": p}
    if "lm_head.weight" in sd:
        out["lm_head"] = {
            "kernel": sd["lm_head.weight"].T, "bias": sd["lm_head.bias"]
        }
    return out


def load_hf_checkpoint(model_dir: str) -> Tuple[Wav2Vec2Config, Dict[str, Any]]:
    """Load an HF wav2vec2/HuBERT/-ForCTC checkpoint directory into
    (config, params) — replaces the reference's from_pretrained calls."""
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    cfg = Wav2Vec2Config.from_hf(hf_cfg)
    import glob
    import os

    candidates = glob.glob(os.path.join(model_dir, "*.bin")) + glob.glob(
        os.path.join(model_dir, "*.safetensors")
    )
    if not candidates:
        raise FileNotFoundError(f"no checkpoint in {model_dir}")
    path = candidates[0]
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        from mm_s2ut.utils import torch_pickle

        sd = torch_pickle.load_checkpoint_numpy(path)
    np_sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
    }
    variables = convert_hf_state_dict(np_sd, cfg)
    if "lm_head" in variables:
        variables = {
            "params": {"wav2vec2": variables["params"], "lm_head": variables.pop("lm_head")}
        }
    return cfg, variables
