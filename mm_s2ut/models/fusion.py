"""Multimodal fusion library — the scientific core of the framework.

TPU-native re-design of the reference's fusion modules (SURVEY.md C7,
reference models/fuse.py): selective attention, multimodal attention with
optional text+image query merging, the sigmoid fusion gate, cross-modal
transformer layers, the external multimodal encoder, the BridgeTower
bidirectional co-attention tower, the Q-Former bottleneck, and AV-HuBERT
style modality dropout (reference models/mm_s2s_transformer.py:496-512).

Everything is batch-first (B, T, C), static-shape, and mask-driven
(additive float biases), so the whole fusion stack fuses into the encoder
under one jit. Softmax runs in fp32; matmuls hit the MXU in the configured
compute dtype.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut.models.layers import (
    NEG_INF,
    FeedForward,
    MultiHeadAttention,
    get_activation,
)

Dtype = Any


def _kpm_bias(key_padding_mask: Optional[jnp.ndarray], dtype) -> Optional[jnp.ndarray]:
    """(B, Tk) bool (True = pad) → (B, 1, 1, Tk) additive bias (or None)."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask, NEG_INF, 0.0).astype(dtype)[:, None, None, :]


class SelectiveAttention(nn.Module):
    """Cross-attention selecting image evidence per speech frame.

    Functional equivalent of the reference SelectiveAttention
    (models/fuse.py:36-117): separate q/k/v input dims, separate
    attention/intermediate/output widths, scale = qk_head_dim**-0.5,
    key-padding masking, returns (output, attention map).
    """

    qdim: int
    kdim: int
    vdim: int
    attn_dim: int
    intermediate_dim: int
    output_dim: int
    num_heads: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Tq, qdim)
        key: jnp.ndarray,  # (B, Tk, kdim)
        value: jnp.ndarray,  # (B, Tk, vdim)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Tk) True=pad
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.attn_dim % self.num_heads or self.intermediate_dim % self.num_heads:
            raise ValueError("attn_dim/intermediate_dim must divide num_heads")
        qk_head = self.attn_dim // self.num_heads
        v_head = self.intermediate_dim // self.num_heads
        B, Tq, _ = query.shape
        Tk = key.shape[1]

        dense = lambda d, name: nn.Dense(d, use_bias=self.qkv_bias, dtype=self.dtype, name=name)
        q = dense(self.attn_dim, "q_proj")(query) * (qk_head**-0.5)
        k = dense(self.attn_dim, "k_proj")(key)
        v = dense(self.intermediate_dim, "v_proj")(value)

        q = q.reshape(B, Tq, self.num_heads, qk_head)
        k = k.reshape(B, Tk, self.num_heads, qk_head)
        v = v.reshape(B, Tk, self.num_heads, v_head)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        bias = _kpm_bias(key_padding_mask, jnp.float32)
        if bias is not None:
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn_dropped = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn_dropped, v)
        out = out.reshape(B, Tq, self.intermediate_dim)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="out_proj")(out)
        return out, attn


class MultimodalAttention(nn.Module):
    """Image cross-attention with optional text+image query merging.

    Equivalent of the reference MultimodalAttention
    (models/fuse.py:120-167): an MHA (built with add_bias_kv — a learned
    extra key/value token) whose query is the speech stream, or, with
    ``is_merge_text_img``, the concatenation [speech; image]; keys/values
    are the image stream. Returns (output, query_padding_mask) since the
    merged query stream changes the downstream mask.
    """

    embed_dim: int
    kdim: int
    num_heads: int = 1
    dropout: float = 0.0
    add_bias_kv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # (B, T1, embed_dim)
        text_mask: Optional[jnp.ndarray],  # (B, T1) True=pad
        img: jnp.ndarray,  # (B, T2, kdim)
        img_mask: Optional[jnp.ndarray] = None,  # (B, T2) True=pad
        is_merge_text_img: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        B, T2 = img.shape[:2]
        if is_merge_text_img:
            if img.shape[-1] != text.shape[-1]:
                raise ValueError("merge_text_image requires matching dims")
            query = jnp.concatenate([text, img], axis=1)
            if text_mask is not None:
                query_mask = jnp.concatenate(
                    [text_mask, jnp.zeros((B, T2), bool)], axis=1
                )
            else:
                query_mask = None
        else:
            query, query_mask = text, text_mask

        key = value = img
        kpm = img_mask
        if self.add_bias_kv:
            bias_k = self.param(
                "bias_k", nn.initializers.xavier_normal(), (1, 1, self.kdim)
            ).astype(self.dtype)
            bias_v = self.param(
                "bias_v", nn.initializers.xavier_normal(), (1, 1, self.kdim)
            ).astype(self.dtype)
            key = jnp.concatenate([key, jnp.tile(bias_k, (B, 1, 1))], axis=1)
            value = jnp.concatenate([value, jnp.tile(bias_v, (B, 1, 1))], axis=1)
            if kpm is not None:
                kpm = jnp.concatenate([kpm, jnp.zeros((B, 1), bool)], axis=1)

        attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype, name="attn"
        )
        out, _, _ = attn(
            query, key=key, value=value,
            bias=_kpm_bias(kpm, self.dtype),
            deterministic=deterministic,
        )
        return out, query_mask


class GatedFusion(nn.Module):
    """Sigmoid-gated merge: ``res = (1-g)·text + g·attn_out`` with
    ``g = σ(W [attn_out; text])`` (reference mm_s2s_transformer.py:612-622).
    Without the gate, a plain residual add (reference's else branch).
    """

    embed_dim: int
    use_gate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray, attn_out: jnp.ndarray) -> jnp.ndarray:
        if not self.use_gate:
            return text + attn_out
        merged = jnp.concatenate([attn_out, text], axis=-1)
        gate = jax.nn.sigmoid(
            nn.Dense(self.embed_dim, dtype=self.dtype, name="gate")(merged)
        )
        return (1.0 - gate) * text + gate * attn_out


class FusionBlock(nn.Module):
    """One image source → speech fusion op (reference ``fuse_img_feat``,
    mm_s2s_transformer.py:594-622): image pre-norm + image/text dropout +
    selective/multimodal attention + gated merge.
    """

    embed_dim: int
    image_dim: int
    attention_type: str  # "selective_attention" | "multimodal_attention"
    use_selective_gate: bool = True
    is_merge_text_img: bool = False
    image_pre_norm: bool = True
    image_dropout: float = 0.1
    text_dropout: float = 0.0
    attention_dropout: float = 0.1
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # (B, T, D) encoder states
        text_mask: Optional[jnp.ndarray],  # (B, T) True=pad
        image: jnp.ndarray,  # (B, Ti, image_dim)
        image_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if self.image_pre_norm:
            image = nn.LayerNorm(dtype=self.dtype, name="image_pre_norm")(image)
        image = nn.Dropout(self.image_dropout)(image, deterministic=deterministic)
        text_in = nn.Dropout(self.text_dropout)(text, deterministic=deterministic)

        mask = text_mask
        if self.attention_type == "selective_attention":
            out, _ = SelectiveAttention(
                qdim=self.embed_dim, kdim=self.image_dim, vdim=self.image_dim,
                attn_dim=self.embed_dim, intermediate_dim=self.embed_dim,
                output_dim=self.embed_dim, num_heads=self.num_heads,
                attn_drop=self.attention_dropout, dtype=self.dtype,
                name="selective_attn",
            )(text_in, image, image, key_padding_mask=image_mask,
              deterministic=deterministic)
            gate_text = text_in
        elif self.attention_type == "multimodal_attention":
            out, mask = MultimodalAttention(
                embed_dim=self.embed_dim, kdim=self.image_dim,
                num_heads=self.num_heads, dropout=self.attention_dropout,
                dtype=self.dtype, name="multimodal_attn",
            )(text_in, text_mask, image, image_mask,
              is_merge_text_img=self.is_merge_text_img,
              deterministic=deterministic)
            gate_text = (
                jnp.concatenate([text_in, image], axis=1)
                if self.is_merge_text_img else text_in
            )
        else:
            raise ValueError(f"unknown attention_type {self.attention_type!r}")

        res = GatedFusion(
            self.embed_dim, use_gate=self.use_selective_gate, dtype=self.dtype,
            name="gated_fusion",
        )(gate_text, out)
        return res, mask


def modality_dropout(
    rng: jax.Array,
    speech: jnp.ndarray,
    images: Sequence[jnp.ndarray],
    modality_dropout_p: float,
    audio_dropout_p: float,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """AV-HuBERT-style batch-level modality dropout
    (reference mm_s2s_transformer.py:496-512): with probability
    ``modality_dropout_p`` one modality is zeroed for the whole batch —
    the audio stream with probability ``audio_dropout_p``, else all image
    streams. Negative probabilities disable (reference yaml sign<0
    convention). Branchless (lax-friendly): both streams are scaled by
    0/1 factors drawn once per call.
    """
    if modality_dropout_p <= 0.0:
        return speech, list(images)
    r1, r2 = jax.random.uniform(rng, (2,))
    drop = r1 < modality_dropout_p
    drop_audio = jnp.logical_and(drop, r2 < audio_dropout_p)
    drop_image = jnp.logical_and(drop, jnp.logical_not(r2 < audio_dropout_p))
    speech = speech * (1.0 - drop_audio.astype(speech.dtype))
    images = [im * (1.0 - drop_image.astype(im.dtype)) for im in images]
    return speech, images


class CrossModalLayer(nn.Module):
    """Transformer layer with self-attention on m1 and cross-attention to
    m2 (reference MultimodalTransformerDecoderLayer, models/fuse.py:187-285):
    configurable pre/post-norm and self-vs-cross order.
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    activation: str = "gelu"
    norm_first: bool = False
    self_attention_first: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype
        )
        self.cross_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.ffn = FeedForward(
            self.ffn_dim, self.embed_dim, self.activation,
            dropout=self.dropout, dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.dropout)

    def _sa(self, x, kpm, det):
        out, _, _ = self.self_attn(x, bias=_kpm_bias(kpm, self.dtype), deterministic=det)
        return self.drop(out, deterministic=det)

    def _ca(self, x, mem, kpm, det):
        out, _, _ = self.cross_attn(
            x, key=mem, bias=_kpm_bias(kpm, self.dtype), deterministic=det
        )
        return self.drop(out, deterministic=det)

    def __call__(
        self,
        m1: jnp.ndarray,
        m2: jnp.ndarray,
        m1_key_padding_mask: Optional[jnp.ndarray] = None,
        m2_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x, det = m1, deterministic
        if self.norm_first:
            if self.self_attention_first:
                x = x + self._sa(self.norm1(x), m1_key_padding_mask, det)
                x = x + self._ca(self.norm2(x), m2, m2_key_padding_mask, det)
            else:
                x = x + self._ca(self.norm2(x), m2, m2_key_padding_mask, det)
                x = x + self._sa(self.norm1(x), m1_key_padding_mask, det)
            x = x + self.drop(self.ffn(self.norm3(x), det), deterministic=det)
        else:
            if self.self_attention_first:
                x = self.norm1(x + self._sa(x, m1_key_padding_mask, det))
                x = self.norm2(x + self._ca(x, m2, m2_key_padding_mask, det))
            else:
                x = self.norm2(x + self._ca(x, m2, m2_key_padding_mask, det))
                x = self.norm1(x + self._sa(x, m1_key_padding_mask, det))
            x = self.norm3(x + self.drop(self.ffn(x, det), deterministic=det))
        return x


class ExternalMultimodalEncoder(nn.Module):
    """N cross-modal layers fusing per-layer speech states with image
    states (reference ExternalMultimodalTransformerEncoder,
    models/fuse.py:288-357): layer i consumes speech_states[i], with a
    layer-normed residual from the previous fused output.
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int = 6
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        m1: Sequence[jnp.ndarray],  # num_layers × (B, T1, D)
        m2: Sequence[jnp.ndarray],  # num_layers × (B, T2, D)
        m1_key_padding_mask: Optional[jnp.ndarray] = None,
        m2_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert len(m1) == len(m2) == self.num_layers
        residual_norm = nn.LayerNorm(dtype=self.dtype, name="residual_norm")
        last = None
        out = None
        for i in range(self.num_layers):
            x = m1[i]
            if last is not None:
                x = residual_norm(x + last)
            out = CrossModalLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"layer{i}",
            )(x, m2[i], m1_key_padding_mask, m2_key_padding_mask, deterministic)
            last = out
        return out


class BridgeTowerEncoder(nn.Module):
    """Bidirectional co-attention tower (reference
    BridgeTowerTransformerEncoder, models/fuse.py:360-447): at each level
    both streams get a layer-normed residual of their previous fused state,
    then m1 attends to m2 and m2 attends to the *updated* m1.
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int = 6
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        m1: Sequence[jnp.ndarray],
        m2: Sequence[jnp.ndarray],
        m1_key_padding_mask: Optional[jnp.ndarray] = None,
        m2_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert len(m1) == len(m2) == self.num_layers
        norm1 = nn.LayerNorm(dtype=self.dtype, name="residual_norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="residual_norm2")
        f1 = f2 = None
        for i in range(self.num_layers):
            f1 = norm1(m1[i] if f1 is None else m1[i] + f1)
            f2 = norm2(m2[i] if f2 is None else m2[i] + f2)
            f1 = CrossModalLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"layer_m1_{i}",
            )(f1, f2, m1_key_padding_mask, m2_key_padding_mask, deterministic)
            f2 = CrossModalLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"layer_m2_{i}",
            )(f2, f1, m2_key_padding_mask, m1_key_padding_mask, deterministic)
        return f1, f2


class QFormer(nn.Module):
    """Learned-query bottleneck (reference QFormerModel,
    models/fuse.py:769-874): ``num_queries`` learned embeddings attend to
    the speech stream for ``num_query_layers`` layers, then to the image
    stream for ``num_multimodal_layers`` layers, producing a fixed-size
    multimodal summary.
    """

    embed_dim: int
    num_heads: int = 12
    ffn_dim: int = 3072
    num_queries: int = 32
    num_query_layers: int = 4
    num_multimodal_layers: int = 2
    dropout: float = 0.1
    self_attention_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        m1: Optional[jnp.ndarray],  # (B, T1, D) speech (None ⇒ image-only)
        m2: jnp.ndarray,  # (B, T2, D) image
        m1_key_padding_mask: Optional[jnp.ndarray] = None,
        m2_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B = (m1 if m1 is not None else m2).shape[0]
        queries = self.param(
            "query_embedding",
            nn.initializers.normal(0.02),
            (1, self.num_queries, self.embed_dim),
        ).astype(self.dtype)
        out = jnp.tile(queries, (B, 1, 1))
        if m1 is not None:
            for i in range(self.num_query_layers):
                out = CrossModalLayer(
                    self.embed_dim, self.num_heads, self.ffn_dim,
                    dropout=self.dropout,
                    self_attention_first=self.self_attention_first,
                    dtype=self.dtype, name=f"query_layer{i}",
                )(out, m1, None, m1_key_padding_mask, deterministic)
        for i in range(self.num_multimodal_layers):
            out = CrossModalLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                dropout=self.dropout,
                self_attention_first=self.self_attention_first,
                dtype=self.dtype, name=f"multimodal_layer{i}",
            )(out, m2, None, m2_key_padding_mask, deterministic)
        return out
