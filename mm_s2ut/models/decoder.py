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
        """Pre-project encoder K/V per layer; allocate ONE stacked
        self-attention cache (2, num_layers, B, max_len, H, Dh) — a single
        buffer so the beam-search reorder is one batched matmul instead of
        2·num_layers small ones (in-loop op fragmentation dominates the
        decode step otherwise)."""
        B = encoder_out.shape[0]
        H = self.num_heads
        Dh = self.embed_dim // H
        # Beam/batch axis LEADING: the beam-search reorder is then a plain
        # leading-axis row gather (the efficient gather form on TPU; any
        # other layout forced relayout copies around the reorder).
        state: DecoderState = {
            "step": jnp.zeros((), jnp.int32),
            "self_kv": jnp.zeros(
                (B, 2, self.num_layers, max_len, H, Dh), self.dtype
            ),
            "cross": [layer.cross_attn.precompute_kv(encoder_out) for layer in self.layers],
        }
        state["cross_bias"] = (
            make_padding_bias(encoder_padding_mask, self.dtype)
            if encoder_padding_mask is not None else None
        )
        return state

    def _self_attn_step(
        self, layer, x: jnp.ndarray, k_old: jnp.ndarray, v_old: jnp.ndarray,
        step_idx: jnp.ndarray,
    ):
        """Single-token self-attention against the read-only history buffer
        plus the freshly projected token — no per-layer cache write (the
        stacked buffer gets ONE batched row update per step; per-layer
        .at[].set() copies the whole stack each time)."""
        attn = layer.self_attn
        scale = attn.head_dim**-0.5
        # Fused QKV: one matmul instead of three (the kernel concat is
        # loop-invariant, XLA hoists it out of the decode while_loop).
        ap = attn.variables["params"]
        w = jnp.concatenate(
            [ap["q_proj"]["kernel"], ap["k_proj"]["kernel"], ap["v_proj"]["kernel"]],
            axis=1,
        ).astype(self.dtype)
        b = jnp.concatenate(
            [ap["q_proj"]["bias"], ap["k_proj"]["bias"], ap["v_proj"]["bias"]]
        ).astype(self.dtype)
        qkv = x @ w + b
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        q = attn._split(q) * scale  # (B, 1, H, Dh)
        k_new = attn._split(k_new)
        v_new = attn._split(v_new)
        logits_hist = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_old, preferred_element_type=jnp.float32
        )  # (B, H, 1, T)
        T = k_old.shape[1]
        valid = jnp.arange(T)[None, None, None, :] < step_idx
        logits_hist = jnp.where(valid, logits_hist, -1e9)
        logit_self = jnp.einsum(
            "bqhd,bqhd->bhq", q, k_new, preferred_element_type=jnp.float32
        )[..., None]  # (B, H, 1, 1)
        logits = jnp.concatenate([logits_hist, logit_self], axis=-1)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w[..., :T], v_old)
        w_self = w[..., -1].transpose(0, 2, 1)[..., None]  # (B, 1, H, 1)
        out = out + w_self * v_new
        out = attn.out_proj(out.reshape(x.shape[0], 1, attn.embed_dim))
        return out, k_new, v_new

    def step(
        self,
        prev_token: jnp.ndarray,  # (B, 1) the token generated last step
        state: DecoderState,
    ) -> Tuple[jnp.ndarray, DecoderState]:
        """One decode step → ((B, V) logits, updated state)."""
        x = self.embed(prev_token) * self.embed_scale
        x = self.pos(x, offset=state["step"])
        step_idx = state["step"]
        kv = state["self_kv"]
        new_ks, new_vs = [], []
        for i, layer in enumerate(self.layers):
            # Self-attention (pre/post-norm per layer config).
            residual = x
            h = layer.self_attn_layer_norm(x) if self.normalize_before else x
            h, k_new, v_new = self._self_attn_step(
                layer, h, kv[:, 0, i], kv[:, 1, i], step_idx
            )
            new_ks.append(k_new)
            new_vs.append(v_new)
            x = residual + h
            if not self.normalize_before:
                x = layer.self_attn_layer_norm(x)
            # Cross-attention over the precomputed (beam-shared) encoder K/V.
            residual = x
            h = layer.cross_attn_layer_norm(x) if self.normalize_before else x
            h, _, _ = layer.cross_attn(
                h, bias=state["cross_bias"], cache=state["cross"][i],
                static_kv=True, deterministic=True,
            )
            x = residual + h
            if not self.normalize_before:
                x = layer.cross_attn_layer_norm(x)
            # FFN.
            residual = x
            h = layer.final_layer_norm(x) if self.normalize_before else x
            x = residual + layer.ffn(h, deterministic=True)
            if not self.normalize_before:
                x = layer.final_layer_norm(x)
        if self.normalize_before:
            x = self.final_norm(x)
        logits = self._output(x)[:, -1]
        # ONE batched write: (B, 2, nL, 1, H, Dh) rows at time step_idx.
        new_rows = jnp.stack(
            [jnp.stack(new_ks, axis=1), jnp.stack(new_vs, axis=1)], axis=1
        )  # new_k[i]: (B, 1, H, Dh) → stack layers axis=1 → (B, nL, 1, H, Dh)
        kv = jax.lax.dynamic_update_slice_in_dim(kv, new_rows, step_idx, axis=3)
        new_state = {
            "step": step_idx + 1,
            "self_kv": kv,
            "cross": state["cross"],
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
