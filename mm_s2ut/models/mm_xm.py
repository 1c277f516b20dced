"""Enhanced path: ``mm_xm_transformer`` (wav2vec2 encoder + adaptor +
image fusion + mBART-style decoder).

TPU-native re-design of the reference MM_XMTransformerModel /
Wav2VecEncoderWithAdaptorForMultiModal (SURVEY.md C9; reference
models/mm_xm_transformer.py:127-346): a pretrained wav2vec2 encoder
(models/wav2vec2, HF-convertible) feeds a stride-2 Conv1dAdaptor, then
top fusion — selective attention + sigmoid gate per image source with
modality dropout (with the reference's quirk that dropping audio also
clears the padding mask, mm_xm_transformer.py:225-232) — and an
autoregressive decoder over the unit-mBART vocabulary (lang-tag bos/eos,
reference config/xm_transformer.yaml:4-7). Multitask CTC/decoder heads
hang off encoder states (SURVEY.md F9).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut import registry
from mm_s2ut.config import ModelConfig
from mm_s2ut.models.decoder import CTCHead, UnitDecoder
from mm_s2ut.models.fusion import FusionBlock, modality_dropout
from mm_s2ut.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

Dtype = Any


class Conv1dAdaptor(nn.Module):
    """Stride-2 conv stack shrinking the wav2vec2 frame rate (fairseq
    Conv1dAdaptor; built by the reference at mm_s2s_transformer.py:218-224
    and inside Wav2VecEncoderWithAdaptor)."""

    out_dim: int
    n_layers: int = 3
    kernel_size: int = 3
    stride: int = 2
    layernorm: bool = False
    proj: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.proj:
            x = nn.Dense(x.shape[-1] * 2, dtype=self.dtype, name="proj1")(x)
            x = jax.nn.glu(x, axis=-1)
        pad = self.kernel_size // 2
        for i in range(self.n_layers):
            if self.layernorm:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.Conv(
                self.out_dim * 2, (self.kernel_size,), strides=(self.stride,),
                padding=[(pad, pad)], dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = jax.nn.glu(x, axis=-1)
            lengths = (lengths + self.stride - 1) // self.stride
        if self.proj:
            x = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="proj2")(x)
            x = jax.nn.glu(x, axis=-1)
        return x, lengths


@registry.register_model("mm_xm_transformer")
class MMXMTransformerModel(nn.Module):
    """forward(waveform batch) → decoder logits (+multitask outputs)."""

    cfg: ModelConfig
    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    adaptor_layers: int = 3
    adaptor_kernel: int = 3
    adaptor_stride: int = 2

    @property
    def source_downsample_ratio(self) -> int:
        """Input positions per encoder position (raw samples through the
        wav2vec2 conv stack then the adaptor). Generation budgets
        (max_len_a·src + max_len_b) count ENCODER positions here — with
        raw-audio inputs, fairseq's src_tokens.size(1) would be samples
        and the budget would always clamp to max_target_positions, which
        a fixed-shape search cannot afford."""
        r = 1
        for s in self.w2v_cfg.conv_stride:
            r *= s
        return r * self.adaptor_stride**self.adaptor_layers

    def setup(self):
        cfg, mm = self.cfg, self.cfg.multimodal
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.wav2vec2 = Wav2Vec2Model(self.w2v_cfg, dtype=dtype)
        self.adaptor = Conv1dAdaptor(
            cfg.decoder_embed_dim,
            n_layers=self.adaptor_layers,
            kernel_size=self.adaptor_kernel,
            stride=self.adaptor_stride,
            layernorm=True,
            dtype=dtype,
        )
        if self.w2v_cfg.hidden_size != cfg.decoder_embed_dim:
            self.pre_adaptor_proj = nn.Dense(cfg.decoder_embed_dim, dtype=dtype)
        if mm.multimodal_attention_type is not None:
            self.fusion_blocks = [
                FusionBlock(
                    embed_dim=cfg.decoder_embed_dim,
                    image_dim=dim,
                    attention_type="selective_attention",
                    use_selective_gate=True,
                    image_pre_norm=mm.image_pre_norm,
                    image_dropout=mm.SA_image_dropout,
                    text_dropout=mm.SA_text_dropout,
                    attention_dropout=mm.SA_attention_dropout,
                    dtype=dtype,
                    name=f"fusion{i}",
                )
                for i, dim in enumerate(mm.image_feat_dim)
            ]
        else:
            self.fusion_blocks = []
        self.decoder = UnitDecoder(
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim,
            num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            max_positions=cfg.max_target_positions,
            dtype=dtype,
        )
        if cfg.ctc_weight > 0:
            self.ctc_head = CTCHead(cfg.vocab_size, dtype=dtype)
        # Per-task aux heads over encoder states (reference builds
        # multitask decoders in build_model, mm_xm_transformer.py:299-318).
        mt_heads = {}
        for t in cfg.multitask:
            vocab = t.vocab_size or cfg.vocab_size
            if t.decoder_type == "ctc":
                mt_heads[t.task_name] = CTCHead(vocab, dtype=dtype, name=f"mt_{t.task_name}")
            else:
                mt_heads[t.task_name] = UnitDecoder(
                    vocab_size=vocab,
                    embed_dim=t.decoder_embed_dim,
                    ffn_dim=t.decoder_embed_dim * 4,
                    num_layers=t.decoder_layers,
                    num_heads=t.decoder_attention_heads,
                    dropout=cfg.dropout,
                    attention_dropout=cfg.attention_dropout,
                    max_positions=cfg.max_target_positions,
                    dtype=dtype,
                    name=f"mt_{t.task_name}",
                )
                if t.decoder_embed_dim != cfg.decoder_embed_dim:
                    mt_heads[f"{t.task_name}_proj"] = nn.Dense(
                        t.decoder_embed_dim, dtype=dtype, name=f"mt_{t.task_name}_proj"
                    )
        self.multitask_heads = mt_heads

    def encode(
        self,
        waveform: jnp.ndarray,  # (B, S) raw audio
        lengths: jnp.ndarray,
        imgs_list: Sequence[jnp.ndarray] = (),
        img_masks_list: Sequence[Optional[jnp.ndarray]] = (),
        apply_mask: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        mm = self.cfg.multimodal
        out = self.wav2vec2(
            waveform, lengths, apply_mask=apply_mask, deterministic=deterministic
        )
        x = out["last_hidden_state"]
        if hasattr(self, "pre_adaptor_proj"):
            x = self.pre_adaptor_proj(x)
        x, feat_lens = self.adaptor(x, out["lengths"])
        padding_mask = jnp.arange(x.shape[1])[None, :] >= feat_lens[:, None]

        imgs_list = list(imgs_list)
        if self.fusion_blocks and mm.is_fusion_top and imgs_list:
            if not deterministic and mm.modality_dropout > 0:
                x, imgs_list = modality_dropout(
                    self.make_rng("modality"), x, imgs_list,
                    mm.modality_dropout, mm.audio_dropout,
                )
            masks = list(img_masks_list) or [None] * len(imgs_list)
            fused = []
            for block, img, img_mask in zip(self.fusion_blocks, imgs_list, masks):
                res, _ = block(
                    x, padding_mask, img.astype(x.dtype), img_mask,
                    deterministic=deterministic,
                )
                fused.append(res)
            x = fused[0]
            for extra in fused[1:]:
                x = x + extra
        return {
            "encoder_out": x,
            "encoder_padding_mask": padding_mask,
            "encoder_states": out["hidden_states"],
        }

    def __call__(
        self,
        src_tokens: jnp.ndarray,  # (B, S) waveform
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        imgs_list: Sequence[jnp.ndarray] = (),
        img_masks_list: Sequence[Optional[jnp.ndarray]] = (),
        tgt_speaker: Optional[jnp.ndarray] = None,  # trainer-call parity (unused)
        deterministic: bool = True,
        apply_mask: bool = False,
        multitask_prev_tokens: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, Any]:
        enc = self.encode(
            src_tokens, src_lengths, imgs_list, img_masks_list,
            apply_mask=apply_mask, deterministic=deterministic,
        )
        logits = self.decoder(
            prev_output_tokens,
            enc["encoder_out"],
            enc["encoder_padding_mask"],
            deterministic=deterministic,
        )
        out = {
            "logits": logits,
            "encoder_out": enc["encoder_out"],
            "encoder_padding_mask": enc["encoder_padding_mask"],
        }
        if self.cfg.ctc_weight > 0:
            out["ctc_logits"] = self.ctc_head(enc["encoder_out"])
        if self.cfg.multitask:
            mt_out = {}
            for t in self.cfg.multitask:
                head = self.multitask_heads[t.task_name]
                if t.decoder_type == "ctc":
                    mt_out[t.task_name] = head(enc["encoder_out"])
                else:
                    mem = enc["encoder_out"]
                    proj = self.multitask_heads.get(f"{t.task_name}_proj")
                    if proj is not None:
                        mem = proj(mem)
                    prev = (multitask_prev_tokens or {}).get(t.task_name)
                    if prev is None:
                        continue
                    mt_out[t.task_name] = head(
                        prev, mem, enc["encoder_padding_mask"],
                        deterministic=deterministic,
                    )
            out["multitask_logits"] = mt_out
        return out

    # Beam-search surface (same contract as MMS2UTModel).
    def decode_init(self, enc: Dict[str, Any], max_len: int, kv_dtype=None):
        return self.decoder.init_state(
            enc["encoder_out"], enc["encoder_padding_mask"], max_len,
            kv_dtype=kv_dtype,
        )

    def decode_step(self, prev_token: jnp.ndarray, state):
        return self.decoder.step(prev_token, state)

    def serve_step(self, prev_token: jnp.ndarray, state):
        """Continuous-batching decode step (infer/serving.py)."""
        return self.decoder.serve_step(prev_token, state)


@registry.register_model_architecture("mm_xm_transformer", "mm_xm_transformer")
def mm_xm_architecture_base(cfg: ModelConfig) -> ModelConfig:
    cfg.decoder_embed_dim = 1024
    cfg.decoder_ffn_embed_dim = 4096
    cfg.decoder_layers = 12
    cfg.decoder_attention_heads = 16
    return cfg
