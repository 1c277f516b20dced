"""Transformer building blocks (flax linen), TPU-first.

Replaces the fairseq base transformer machinery the reference subclasses
(SURVEY.md F7/F8: S2TTransformerEncoder conv subsampler + layers at
reference models/mm_s2s_transformer.py:87; TransformerDecoder imports at
models/mm_s2s_transformer.py:29-38). Design notes:

* Params live in fp32; compute dtype is configurable (bf16 on TPU, F3 —
  no loss scaling needed).
* Attention exposes an explicit, fixed-shape KV cache threaded through
  ``__call__`` so incremental decoding jits as a ``lax.while_loop`` body
  (SURVEY.md §7 hard part 2) — no mutable module state.
* All masks are additive float biases computed once per batch; no boolean
  fancy-indexing (static shapes for XLA).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any
Cache = Dict[str, jnp.ndarray]

NEG_INF = -1e9  # additive mask value (finite: avoids NaN softmax rows in bf16)


def make_padding_bias(padding_mask: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """(B, Tk) bool (True = pad) → (B, 1, 1, Tk) additive bias."""
    return jnp.where(padding_mask, NEG_INF, 0.0).astype(dtype)[:, None, None, :]


def make_causal_bias(t: int, dtype: Dtype) -> jnp.ndarray:
    """(1, 1, T, T) additive causal bias."""
    mask = jnp.tril(jnp.ones((t, t), bool))
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[None, None]


def lengths_to_padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) → (B, T) bool mask, True where padded."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "tanh": jnp.tanh,
        "glu": None,  # handled structurally
    }[name]


def sinusoidal_positions(
    max_len: int, dim: int, padding_idx: int = 1
) -> np.ndarray:
    """Fairseq-convention sinusoidal table: half sin, half cos, position
    offset by padding_idx+1, zero vector reserved rows. Shape (max_len, dim).
    """
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(padding_idx + 1, max_len + padding_idx + 1, dtype=np.float64)
    args = pos[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2:
        table = np.concatenate([table, np.zeros((max_len, 1))], axis=1)
    return table.astype(np.float32)


class SinusoidalPositionalEmbedding(nn.Module):
    """Computed in-graph (sin/cos on iota) rather than as a baked table:
    no multi-MB HLO constant, trivially fused by XLA on the VPU."""

    dim: int
    max_len: int = 8192  # kept for API parity; positions are unbounded
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: jnp.ndarray | int = 0) -> jnp.ndarray:
        """x: (B, T, D). offset: scalar start position (decode step), or a
        (B,) vector of per-row positions (continuous-batching decode,
        where co-scheduled utterances sit at different time steps)."""
        t = x.shape[1]
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        # Fairseq convention: positions start at padding_idx + 1 = 2.
        pos = jnp.arange(t, dtype=jnp.float32) + 2.0
        vector_offset = getattr(offset, "ndim", 0) == 1
        if vector_offset:
            pos = pos[None, :] + jnp.asarray(offset, jnp.float32)[:, None]
        elif not (isinstance(offset, int) and offset == 0):
            pos = pos + jnp.asarray(offset, jnp.float32)
        args = pos[..., None] * freqs[None, :]
        pe = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        if self.dim % 2:
            pe = jnp.pad(pe, [(0, 0)] * (pe.ndim - 1) + [(0, 1)])
        if not vector_offset:
            pe = pe[None]
        return x + pe.astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with optional fixed-shape KV cache.

    Cache layout: {"k": (B, Tmax, H, Dh), "v": same, "index": ()} —
    time-major per batch so decode-step writes are a dynamic_update_slice
    on axis 1. MXU-friendly einsums; softmax in fp32.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    # Distinct q/k/v input dims (reference SelectiveAttention,
    # models/fuse.py:36-64) are served by fusion.SelectiveAttention —
    # nn.Dense infers input widths here, so no kdim/vdim knobs exist.

    def setup(self):
        if self.embed_dim % self.num_heads:
            raise ValueError("embed_dim must divide num_heads")
        self.head_dim = self.embed_dim // self.num_heads
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        self.q_proj = dense(self.embed_dim, "q_proj")
        self.k_proj = dense(self.embed_dim, "k_proj")
        self.v_proj = dense(self.embed_dim, "v_proj")
        self.out_proj = dense(self.embed_dim, "out_proj")
        self.drop = nn.Dropout(self.dropout)

    def init_cache(self, batch: int, max_len: int) -> Cache:
        shape = (batch, max_len, self.num_heads, self.embed_dim // self.num_heads)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
            "index": jnp.zeros((), jnp.int32),
        }

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.head_dim)

    def __call__(
        self,
        query: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        cache: Optional[Cache] = None,
        static_kv: bool = False,
        deterministic: bool = True,
        return_weights: bool = False,
        key_padding_mask: Optional[jnp.ndarray] = None,
        use_flash: bool = False,
        causal: bool = False,
        causal_window: int = 0,
    ) -> Tuple[jnp.ndarray, Optional[Cache], Optional[jnp.ndarray]]:
        """Returns (out, new_cache, attn_weights|None).

        * self-attention: key/value None.
        * incremental self-attention: pass ``cache``; query is the new step(s).
        * cross-attention with cached encoder K/V: pass ``cache`` with
          ``static_kv=True`` (cache pre-filled via :meth:`precompute_kv`).
        * ``use_flash`` + ``key_padding_mask`` (no cache/bias/weights):
          fused Pallas attention kernel (ops.attention).
        * ``causal`` (+ ``causal_window``): position-causal self-attention
          mask — in-kernel iotas on the flash path, folded into the bias
          otherwise (cache-free self-attention only).
        """
        key = query if key is None else key
        value = key if value is None else value
        if causal and cache is not None:
            raise ValueError(
                "causal masking applies to cache-free self-attention; the "
                "incremental path is causal by construction"
            )
        if use_flash and cache is None and bias is None and not return_weights:
            from mm_s2ut.ops.attention import attention as fused_attention

            drop_rate = 0.0 if deterministic else self.dropout
            drop_seed = None
            if drop_rate > 0.0:
                # Per-call uint32 seed for the in-kernel counter-based
                # dropout hash (ops.attention.dropout_keep): flax's
                # "dropout" rng stream keeps layers/steps decorrelated.
                drop_seed = jax.random.bits(
                    self.make_rng("dropout"), (), jnp.uint32
                )
            q = self._split(self.q_proj(query))
            k = self._split(self.k_proj(key))
            v = self._split(self.v_proj(value))
            out = fused_attention(
                q, k, v, key_padding_mask=key_padding_mask,
                causal=causal, window=causal_window,
                dropout_rate=drop_rate, dropout_seed=drop_seed,
            )
            out = self.out_proj(out.reshape(*query.shape[:2], self.embed_dim).astype(self.dtype))
            return out, None, None
        if bias is None and key_padding_mask is not None:
            bias = make_padding_bias(key_padding_mask, self.dtype)
        if causal:
            # Declined the fused path (dropout in training, weights
            # requested, …) — fold the same mask into the bias so the
            # dense path stays causal.
            qpos = jnp.arange(query.shape[1])[:, None]
            kpos = jnp.arange(key.shape[1])[None, :]
            allowed = kpos <= qpos
            if causal_window > 0:
                allowed = jnp.logical_and(allowed, kpos > qpos - causal_window)
            cmask = jnp.where(allowed, 0.0, NEG_INF).astype(self.dtype)[None, None]
            bias = cmask if bias is None else bias + cmask
        q = self._split(self.q_proj(query)) * (self.head_dim**-0.5)

        new_cache = None
        if cache is not None and static_kv:
            # Decode-time cross-attention over the packed (B, H, S, 2Dh)
            # cache (precompute_kv — the only static-cache producer):
            # storage order IS the contraction order for both matmuls —
            # no per-step transposes inside the decode loop — and beams
            # share the B-sized buffer (beam-broadcast reads).
            return self._packed_cross(
                q, cache["kv"], bias, query, cache,
                scales=(cache["sk"], cache["sv"]) if "sk" in cache else None,
            )
        elif cache is not None:
            k_new = self._split(self.k_proj(key))
            v_new = self._split(self.v_proj(value))
            idx = cache["index"]
            k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_new, idx, 1)
            v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_new, idx, 1)
            new_cache = {"k": k, "v": v, "index": idx + key.shape[1]}
            # Mask out cache positions not yet written.
            t_total = k.shape[1]
            valid = jnp.arange(t_total)[None, :] < (idx + key.shape[1])
            step_bias = jnp.where(valid, 0.0, NEG_INF).astype(self.dtype)[:, None, None, :]
            bias = step_bias if bias is None else bias + step_bias
        else:
            k = self._split(self.k_proj(key))
            v = self._split(self.v_proj(value))

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = self.drop(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = self.out_proj(out.reshape(*query.shape[:2], self.embed_dim))
        return out, new_cache, (weights if return_weights else None)

    def _packed_cross(self, q, kv, bias, query, cache, scales=None):
        """q: (B·K, 1, H, Dh) pre-scaled; kv: (B, H, S, 2·Dh) interleaved
        (int8 with per-column dequant ``scales`` (sk, sv) when the cross
        cache was precomputed with ``kv_dtype='int8'``)."""
        from mm_s2ut.ops import decode_attention as da

        B, H, S, _ = kv.shape
        Dh = kv.shape[-1] // 2
        BK, Tq = q.shape[:2]
        K = BK // B
        qb = q.reshape(B, K * Tq, H, Dh).transpose(0, 2, 1, 3)  # (B,H,K·Tq,Dh)
        bias_row = (
            jnp.zeros((B, S), jnp.float32) if bias is None
            else bias.astype(jnp.float32).reshape(B, -1, S)[:, -1]
        )
        if scales is not None:
            fn = (da.cross_decode_attention_i8 if da.cross_supported(kv)
                  else da.cross_reference_i8)
            out = fn(qb, kv, scales[0], scales[1], bias_row)
        elif da.cross_supported(kv):
            out = da.cross_decode_attention(qb, kv, bias_row)
        else:
            out = da.cross_reference(qb, kv, bias_row)
        out = out.transpose(0, 2, 1, 3).reshape(BK, Tq, self.embed_dim)
        return self.out_proj(out), cache, None

    def precompute_kv(
        self, key: jnp.ndarray, value: Optional[jnp.ndarray] = None,
        kv_dtype: Optional[str] = None,
    ) -> Cache:
        """Pre-project encoder states for cached cross-attention, packed
        as ONE interleaved (B, H, S, 2·Dh) buffer in decode storage order
        (the transpose happens once here, not per decode step).

        ``kv_dtype='int8'`` stores the slab quantized per source column
        and head (symmetric, scale = amax/127 over Dh) with f32 dequant
        scales ``sk``/``sv`` (B, H, S): the slab is static for the whole
        decode, so quantization costs one pass here while every decode
        step's HBM read of it halves (ops/decode_attention.py
        cross int8 kernel folds the scales into the score rows and the
        softmax weights, keeping both matmuls native)."""
        value = key if value is None else value
        k = self._split(self.k_proj(key)).transpose(0, 2, 1, 3)  # (B, H, S, Dh)
        v = self._split(self.v_proj(value)).transpose(0, 2, 1, 3)
        if kv_dtype == "int8":
            kf = k.astype(jnp.float32)
            vf = v.astype(jnp.float32)
            sk = jnp.max(jnp.abs(kf), axis=-1) / 127.0  # (B, H, S)
            sv = jnp.max(jnp.abs(vf), axis=-1) / 127.0
            k_q = jnp.round(kf / jnp.maximum(sk, 1e-20)[..., None])
            v_q = jnp.round(vf / jnp.maximum(sv, 1e-20)[..., None])
            kv_q = jnp.clip(
                jnp.concatenate([k_q, v_q], axis=-1), -127, 127
            ).astype(jnp.int8)
            return {
                "kv": kv_q, "sk": sk, "sv": sv,
                "index": jnp.asarray(key.shape[1], jnp.int32),
            }
        return {
            "kv": jnp.concatenate([k, v], axis=-1),
            "index": jnp.asarray(key.shape[1], jnp.int32),
        }


class FeedForward(nn.Module):
    ffn_dim: int
    out_dim: int
    activation: str = "relu"
    dropout: float = 0.0
    activation_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from mm_s2ut.ops.dropout import HashDropout

        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = get_activation(self.activation)(h)
        # Counter-hash dropout: the backward recomputes the (B, T, ffn)
        # mask from a scalar seed instead of saving it (ops/dropout.py).
        h = HashDropout(self.activation_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)
        return h


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    use_flash: bool = False
    causal: bool = False
    causal_window: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ln1 = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")
        attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="self_attn",
        )
        ffn = FeedForward(
            self.ffn_dim, self.embed_dim, self.activation,
            self.dropout, self.activation_dropout, dtype=self.dtype, name="ffn",
        )
        from mm_s2ut.ops.dropout import HashDropout

        drop = HashDropout(self.dropout)

        use_flash = self.use_flash and key_padding_mask is not None
        residual = x
        h = ln1(x) if self.normalize_before else x
        h, _, _ = attn(
            h,
            bias=None if use_flash else padding_bias,
            deterministic=deterministic,
            key_padding_mask=key_padding_mask if use_flash else None,
            use_flash=use_flash,
            causal=self.causal,
            causal_window=self.causal_window,
        )
        h = drop(h, deterministic=deterministic)
        x = residual + h
        if not self.normalize_before:
            x = ln1(x)

        residual = x
        h = ln2(x) if self.normalize_before else x
        h = ffn(h, deterministic=deterministic)
        h = drop(h, deterministic=deterministic)
        x = residual + h
        if not self.normalize_before:
            x = ln2(x)
        return x


class TransformerDecoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="self_attn",
        )
        self.cross_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="cross_attn",
        )
        self.self_attn_layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.cross_attn_layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn = FeedForward(
            self.ffn_dim, self.embed_dim, self.activation,
            self.dropout, self.activation_dropout, dtype=self.dtype,
        )
        from mm_s2ut.ops.dropout import HashDropout

        self.drop = HashDropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        encoder_out: Optional[jnp.ndarray],
        self_bias: Optional[jnp.ndarray] = None,
        cross_bias: Optional[jnp.ndarray] = None,
        self_cache: Optional[Cache] = None,
        cross_cache: Optional[Cache] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[Cache], Optional[Cache]]:
        residual = x
        h = self.self_attn_layer_norm(x) if self.normalize_before else x
        h, self_cache, _ = self.self_attn(
            h, bias=self_bias, cache=self_cache, deterministic=deterministic
        )
        x = residual + self.drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        if encoder_out is not None or cross_cache is not None:
            residual = x
            h = self.cross_attn_layer_norm(x) if self.normalize_before else x
            h, cross_cache, _ = self.cross_attn(
                h, key=encoder_out, bias=cross_bias,
                cache=cross_cache, static_kv=cross_cache is not None,
                deterministic=deterministic,
            )
            x = residual + self.drop(h, deterministic=deterministic)
            if not self.normalize_before:
                x = self.cross_attn_layer_norm(x)

        residual = x
        h = self.final_layer_norm(x) if self.normalize_before else x
        h = self.ffn(h, deterministic=deterministic)
        x = residual + self.drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x, self_cache, cross_cache


class Conv1dSubsampler(nn.Module):
    """2× stride-2 Conv1d + GLU subsampler (4× downsampling).

    TPU-native stand-in for fairseq's Conv1dSubsampler used by the S2T
    encoder the reference subclasses (SURVEY.md F7). Convs run as XLA
    convolutions in NTC layout.
    """

    mid_channels: int = 1024
    out_dim: int = 512
    kernel_sizes: Tuple[int, ...] = (5, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, F) features → (B, T', out_dim), updated lengths."""
        n = len(self.kernel_sizes)
        for i, k in enumerate(self.kernel_sizes):
            out_ch = self.mid_channels if i < n - 1 else self.out_dim * 2
            x = nn.Conv(
                out_ch, (k,), strides=(2,), padding=[(k // 2, k // 2)],
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = jax.nn.glu(x, axis=-1)
            lengths = (lengths - 1) // 2 + 1
            # Zero padded frames between conv layers: the conv BIAS makes
            # them nonzero, and the next conv's kernel reads them near the
            # valid/pad boundary — without this, encoder outputs depend on
            # how far the batch was padded (breaks pad-length invariance
            # and batch-composition reproducibility).
            valid = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
            x = x * valid[..., None].astype(x.dtype)
        return x, lengths


def subsampled_length(length: int, n_convs: int = 2) -> int:
    for _ in range(n_convs):
        length = (length - 1) // 2 + 1
    return length
