"""Autoregressive unit decoder with shared embedding and KV-cached decoding.

TPU-native equivalent of the fairseq TransformerDecoder +
StackedEmbedding stack the reference imports (SURVEY.md F8; reference
models/mm_s2s_transformer.py:29-38). Two entry points:

* ``__call__`` — full-sequence teacher-forced forward (training): causal
  bias, one pass, logits (B, T, V).
* ``init_state`` / ``step`` — fixed-shape incremental decoding for the
  jitted beam search (SURVEY.md §7 hard part 2): self-attention KV caches
  are preallocated to max_len; encoder K/V is pre-projected once per layer
  (``static_kv`` cross-attention), so each step is pure MXU work with no
  re-projection.

n-frames-per-step packing (reference pack_units,
data/speech_to_speech_dataset.py:194-215) is supported by factored
embedding: a packed base-V id is unpacked to its n unit ids, each embedded
with the shared unit table plus a per-position embedding, then summed —
instead of a V^n embedding table (TPU-first redesign; the output side
predicts n units per step with n heads).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut.models.layers import (
    MultiHeadAttention,
    SinusoidalPositionalEmbedding,
    TransformerDecoderLayer,
    make_causal_bias,
    make_padding_bias,
)

Dtype = Any
DecoderState = Dict[str, Any]


class StackedEmbedding(nn.Module):
    """Embedding for (optionally) base-V packed unit ids.

    With ``n_frames_per_step == 1`` this is a plain scaled embedding.
    With n > 1, a packed id p = sum(u_i * V^(n-1-i)) + offset is unpacked
    and each unit embedded with the shared table + learned position-in-pack
    embedding, then summed. Special ids (< offset) embed directly.
    """

    vocab_size: int  # full dictionary size incl. specials
    embed_dim: int
    n_frames_per_step: int = 1
    offset: int = 4  # nspecial
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.embed_dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(self.embed_dim**-0.5),
            name="embed_tokens",
        )
        if self.n_frames_per_step > 1:
            self.pack_pos = nn.Embed(
                self.n_frames_per_step, self.embed_dim, dtype=self.dtype,
                embedding_init=nn.initializers.normal(self.embed_dim**-0.5),
            )

    @property
    def n_units(self) -> int:
        return self.vocab_size - self.offset

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        if self.n_frames_per_step <= 1:
            return self.embedding(ids)
        V = self.n_units
        is_special = ids < self.offset
        packed = jnp.maximum(ids - self.offset, 0)
        out = jnp.zeros((*ids.shape, self.embed_dim), self.dtype)
        for i in range(self.n_frames_per_step):
            unit = (packed // (V ** (self.n_frames_per_step - 1 - i))) % V
            out = out + self.embedding(unit + self.offset) + self.pack_pos(
                jnp.full_like(ids, i)
            )
        special = self.embedding(jnp.minimum(ids, self.offset - 1))
        return jnp.where(is_special[..., None], special, out)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Output projection sharing the input embedding (fairseq
        share_decoder_input_output_embed)."""
        table = self.embedding.embedding.astype(self.dtype)
        return jnp.einsum("btd,vd->btv", x, table, preferred_element_type=jnp.float32)


class UnitDecoder(nn.Module):
    vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    share_input_output_embed: bool = True
    n_frames_per_step: int = 1
    max_positions: int = 4096
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed = StackedEmbedding(
            self.vocab_size, self.embed_dim,
            n_frames_per_step=self.n_frames_per_step, dtype=self.dtype,
        )
        self.pos = SinusoidalPositionalEmbedding(
            self.embed_dim, self.max_positions, dtype=self.dtype
        )
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                dtype=self.dtype,
                name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.normalize_before:
            self.final_norm = nn.LayerNorm(dtype=self.dtype)
        if not self.share_input_output_embed:
            self.output_proj = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.embed_scale = math.sqrt(self.embed_dim)

    def _output(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.share_input_output_embed:
            return self.embed.attend(x)
        return self.output_proj(x).astype(jnp.float32)

    def __call__(
        self,
        prev_tokens: jnp.ndarray,  # (B, T) teacher-forced inputs
        encoder_out: jnp.ndarray,  # (B, S, D)
        encoder_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True=pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, T = prev_tokens.shape
        x = self.embed(prev_tokens) * self.embed_scale
        x = self.pos(x)
        x = self.drop(x, deterministic=deterministic)
        self_bias = make_causal_bias(T, self.dtype)
        cross_bias = (
            make_padding_bias(encoder_padding_mask, self.dtype)
            if encoder_padding_mask is not None else None
        )
        for layer in self.layers:
            x, _, _ = layer(
                x, encoder_out, self_bias=self_bias, cross_bias=cross_bias,
                deterministic=deterministic,
            )
        if self.normalize_before:
            x = self.final_norm(x)
        return self._output(x)

    # -- incremental decoding ------------------------------------------------

    def init_state(
        self,
        encoder_out: jnp.ndarray,
        encoder_padding_mask: Optional[jnp.ndarray],
        max_len: int,
    ) -> DecoderState:
        """Pre-project encoder K/V per layer and allocate self-attn caches."""
        B = encoder_out.shape[0]
        state: DecoderState = {"step": jnp.zeros((), jnp.int32), "layers": []}
        for layer in self.layers:
            state["layers"].append(
                {
                    "self": layer.self_attn.init_cache(B, max_len),
                    "cross": layer.cross_attn.precompute_kv(encoder_out),
                }
            )
        state["cross_bias"] = (
            make_padding_bias(encoder_padding_mask, self.dtype)
            if encoder_padding_mask is not None else None
        )
        return state

    def step(
        self,
        prev_token: jnp.ndarray,  # (B, 1) the token(s) generated last step
        state: DecoderState,
    ) -> Tuple[jnp.ndarray, DecoderState]:
        """One decode step → ((B, V) logits, updated state)."""
        x = self.embed(prev_token) * self.embed_scale
        x = self.pos(x, offset=state["step"])
        new_layers = []
        for layer, lstate in zip(self.layers, state["layers"]):
            x, self_cache, _ = layer(
                x, None,
                self_bias=None,
                cross_bias=state["cross_bias"],
                self_cache=lstate["self"],
                cross_cache=lstate["cross"],
                deterministic=True,
            )
            new_layers.append({"self": self_cache, "cross": lstate["cross"]})
        if self.normalize_before:
            x = self.final_norm(x)
        logits = self._output(x)[:, -1]
        new_state = {
            "step": state["step"] + 1,
            "layers": new_layers,
            "cross_bias": state["cross_bias"],
        }
        return logits, new_state


class CTCHead(nn.Module):
    """Auxiliary CTC projection over encoder states (multitask, SURVEY.md F9)."""

    vocab_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="ctc_proj")(
            encoder_out
        ).astype(jnp.float32)
