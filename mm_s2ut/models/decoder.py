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
        if self.n_frames_per_step > 1:
            # fairseq TransformerUnitDecoder: each packed position expands
            # to n sub-frame states (Linear d → n·d), every sub-frame gets
            # its own V-way logits against the shared unit embedding — the
            # LOSS side stays base-V while the input side packs
            # (StackedEmbedding above).
            self.out_proj_n_frames = nn.Dense(
                self.n_frames_per_step * self.embed_dim,
                use_bias=False, dtype=self.dtype,
            )
        self.drop = nn.Dropout(self.dropout)
        self.embed_scale = math.sqrt(self.embed_dim)

    def _output(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.n_frames_per_step > 1:
            B, L, d = x.shape
            x = self.out_proj_n_frames(x).reshape(
                B, L * self.n_frames_per_step, d
            )
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
        kv_dtype: Optional[str] = None,
    ) -> DecoderState:
        """Pre-project encoder K/V per layer; allocate ONE stacked
        self-attention cache (B, num_layers, H, max_len·S, 2·Dh) whose
        second-to-last axis is pre-flattened over the beam-slot axis S
        (S=1 until ``tile_state_for_beams`` expands it; key column
        j = t·S + s) and whose last axis interleaves K‖V.

        Layout rationale (all measured on v5e at B=32 K=5 T=201):
          * last axis 2·Dh = 128 = exactly one lane tile — with Dh=64
            minor, XLA pads lanes to 128 (2× physical cache) and lowers
            the per-step row write as a FULL-CACHE copy (1.27 ms/step);
            interleaved at 128 lanes the same write is in-place
            (0.009 ms/step) and the cache is half the bytes;
          * the flattened (t·S+s) axis sits directly above the
            contraction dim, so the joint-slot attention matmuls are
            native MXU GEMMs in storage order, and the decode-attention
            Pallas kernel pulls each layer's contiguous (T·S, 2·Dh) slab
            via its BlockSpec index map — an XLA-side per-layer slice
            would copy the cache every step.

        ``kv_dtype="int8"`` stores the cache quantized with per-column,
        per-head dequant scales (``self_kv_sk`` / ``self_kv_sv``,
        (B, L, H, T) f32): the decode kernel's HBM read — the dominant
        decode cost — halves, with the scales folded into the score rows
        (K) and softmax weights (V) so both matmuls stay native
        (ops/decode_attention.py int8 variant). The current step's own
        K/V stay full precision. The static per-layer encoder cross K/V
        slab — read in full every decode step — is quantized the same
        way (per source column; MultiHeadAttention.precompute_kv).

        ``kv_dtype="int4"`` additionally nibble-packs the self-attention
        cache two logical columns per int8 byte in the half-split layout
        of ops/decode_attention.py (byte p = columns p and p + T·S/2),
        quartering the dominant HBM read; scales are int8-identical. T is
        rounded up to even so step writes never straddle the half
        boundary. The cross slab stays int8 (it is a minor decode cost).
        """
        if kv_dtype not in (None, "bfloat16", "float32", "int8", "int4"):
            raise ValueError(
                f"kv_cache_dtype={kv_dtype!r}: expected bfloat16, int8 or int4"
            )
        if self.n_frames_per_step > 1:
            # Beam decode emits one base-V token per step; searching the
            # packed multi-frame space is unimplemented (every shipped
            # reference config generates with n=1 — --reduce-unit data).
            # Raising beats silently searching the wrong space.
            raise NotImplementedError(
                "beam decode with n_frames_per_step > 1 is not supported"
            )
        B = encoder_out.shape[0]
        H = self.num_heads
        Dh = self.embed_dim // H
        int8_cache = kv_dtype in ("int8", "int4")
        int4_cache = kv_dtype == "int4"
        cache_dt = jnp.int8 if int8_cache else self.dtype
        if int4_cache:
            max_len = max_len + (max_len % 2)  # half-split needs T even
        state: DecoderState = {
            "step": jnp.zeros((), jnp.int32),
            "self_kv": jnp.zeros(
                (B, self.num_layers, H,
                 max_len // 2 if int4_cache else max_len, 2 * Dh),
                cache_dt,
            ),
            "cross": [
                layer.cross_attn.precompute_kv(
                    encoder_out, kv_dtype="int8" if int4_cache else kv_dtype
                )
                for layer in self.layers
            ],
        }
        if int8_cache:
            state["self_kv_sk"] = jnp.zeros(
                (B, self.num_layers, H, max_len), jnp.float32
            )
            state["self_kv_sv"] = jnp.zeros(
                (B, self.num_layers, H, max_len), jnp.float32
            )
        state["cross_bias"] = (
            make_padding_bias(encoder_padding_mask, self.dtype)
            if encoder_padding_mask is not None else None
        )
        return state

    @staticmethod
    def _flat_len(state: DecoderState) -> int:
        """Logical length of the cache's flattened (t·S + s) axis — twice
        the physical axis when the cache is int4 nibble-packed (detected
        by the 2:1 scale-to-slab shape ratio of the half-split layout)."""
        n = state["self_kv"].shape[3]
        if "self_kv_sk" in state and state["self_kv_sk"].shape[3] == 2 * n:
            return 2 * n
        return n

    def _self_attn_step(
        self, layer, x: jnp.ndarray, kv: jnp.ndarray, layer_idx: int,
        step_idx: jnp.ndarray, flat_rep: Optional[jnp.ndarray] = None,
        kv_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Single-token self-attention against the read-only history buffer
        plus the freshly projected token — no per-layer cache write (the
        stacked buffer gets ONE batched row update per step; per-layer
        .at[].set() copies the whole stack each time).

        ``kv`` is the WHOLE stacked cache (B, L, H, T·S, 2·Dh), K‖V
        interleaved on the last axis. With ``flat_rep`` (B, K, T·S) set
        (beam search; entry j where key column j is on beam k's ancestry
        path and in the past, else -1), the cache is *ancestry-indexed*:
        rows stay in the physical slot that wrote them and each beam
        attends jointly over ALL S=K slots. This replaces the per-step
        physical cache reorder (read+write of the whole cache, measured
        0.82 ms/step of a 1.21 ms/step decode at B=8 K=5) with a fused
        Pallas kernel (ops/decode_attention.py) that streams the cache
        through the MXU exactly once and never materializes the joint
        score tensor to HBM.
        """
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
        q = attn._split(q) * scale  # (N, 1, H, Dh)
        k_new = attn._split(k_new)
        v_new = attn._split(v_new)
        N = x.shape[0]
        B, H, Dh = kv.shape[0], kv.shape[2], kv.shape[4] // 2
        K = N // B

        def to_bhkd(t):  # (N, 1, H, Dh) → (B, H, K, Dh)
            return t.reshape(B, K, H, Dh).transpose(0, 2, 1, 3)

        # int4 cache is recognizable at trace time by shape: the packed
        # slab's flattened axis is HALF the scale arrays' (decode_attention
        # half-split layout); int8 stores them 1:1.
        int4 = kv_scales is not None and kv_scales[0].shape[3] == 2 * kv.shape[3]
        if flat_rep is not None:
            from mm_s2ut.ops import decode_attention as da

            if int4:
                fn = (
                    da.ancestry_decode_attention_i4 if da.supported_i4(kv)
                    else da.reference_i4
                )
                out = fn(
                    to_bhkd(q), to_bhkd(k_new), to_bhkd(v_new),
                    kv, kv_scales[0], kv_scales[1], flat_rep, layer_idx,
                )
            elif kv_scales is not None:
                fn = (
                    da.ancestry_decode_attention_i8 if da.supported(kv)
                    else da.reference_i8
                )
                out = fn(
                    to_bhkd(q), to_bhkd(k_new), to_bhkd(v_new),
                    kv, kv_scales[0], kv_scales[1], flat_rep, layer_idx,
                )
            else:
                fn = da.ancestry_decode_attention if da.supported(kv) else da.reference
                out = fn(
                    to_bhkd(q), to_bhkd(k_new), to_bhkd(v_new),
                    kv, flat_rep, layer_idx,
                )  # (B, H, K, Dh)
            out = out.transpose(0, 2, 1, 3).reshape(N, 1, H, Dh)
        else:
            # Plain incremental decoding (untiled state, S == 1): slot k's
            # history is its own rows; single-query matvec form.
            if int4:
                from mm_s2ut.ops.decode_attention import i4_unpack

                kv_layer = i4_unpack(kv[:, layer_idx])  # (B, H, T, 2Dh)
            else:
                kv_layer = kv[:, layer_idx]
            T = kv_layer.shape[2]
            logit_self = jnp.einsum(
                "bqhd,bqhd->bhq", q, k_new, preferred_element_type=jnp.float32
            )[..., None]  # (N, H, 1, 1)
            k_sq = kv_layer[:, :, :, :Dh]  # (B, H, T, Dh)
            v_sq = kv_layer[:, :, :, Dh:]
            if kv_scales is not None:
                k_sq = (k_sq.astype(jnp.float32) * kv_scales[0][:, layer_idx, :, :, None]).astype(self.dtype)
                v_sq = (v_sq.astype(jnp.float32) * kv_scales[1][:, layer_idx, :, :, None]).astype(self.dtype)
            q_t = q.transpose(0, 2, 1, 3)  # (N, H, 1, Dh)
            logits_hist = jnp.einsum(
                "bhqd,bhtd->bhqt", q_t, k_sq, preferred_element_type=jnp.float32
            )  # (N, H, 1, T)
            valid = jnp.arange(T)[None, None, None, :] < step_idx
            logits_hist = jnp.where(valid, logits_hist, -1e9)
            logits = jnp.concatenate([logits_hist, logit_self], axis=-1)
            wgt = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhqt,bhtd->bqhd", wgt[..., :T], v_sq
            )  # (N, 1, H, Dh)
            w_self = wgt[..., -1].transpose(0, 2, 1)[..., None]  # (N, 1, H, 1)
            out = out + w_self * v_new
        out = attn.out_proj(out.reshape(N, 1, attn.embed_dim))
        return out, k_new, v_new

    def prefill(
        self,
        prefix_tokens: jnp.ndarray,  # (B, P) int32, position 0 = BOS
        prefix_len: jnp.ndarray,     # scalar int32, tokens incl. BOS (<= P)
        state: DecoderState,
    ) -> Tuple[DecoderState, jnp.ndarray]:
        """Parallel teacher-forced prefill of a *tiled* beam-search cache.

        One causal forward over the whole prefix buffer (MXU-batched — no
        sequential per-token loop) computes every layer's K/V projections
        and writes them into beam slot 0 of the flattened (t·S + s) cache
        axis, exactly where step-by-step decoding of the same tokens would
        have put them (all beams share the prefix, ancestry stays 0). Used
        by the streaming prefix-reuse decode (infer/streaming.py): a
        re-translation that must extend a committed prefix restarts the
        search AT the prefix instead of replaying it token by token, so
        per-chunk decode cost stops growing with the accumulated context.

        Positions ≥ ``prefix_len`` may hold pad garbage: their cache
        columns are written but masked by the step counter until real
        decode steps overwrite them. With an int8 cache the written rows
        quantize identically to stepwise decoding, but the prefill pass
        itself attends to EXACT history where stepwise attends to
        quantized history — downstream logits agree within quantization
        noise (exactly, for full-precision caches). Returns ``(state', prefix_logp)``
        with ``state'["step"] = prefix_len - 1`` (the search re-processes
        the final prefix token as its first step, matching the step-loop
        invariant) and ``prefix_logp = Σ_{t=1}^{len-1} log p(tok_t | <t)``
        — the alive-beam score the continuation inherits.
        """
        if self.n_frames_per_step > 1:
            raise NotImplementedError(
                "prefill with n_frames_per_step > 1 is not supported"
            )
        kv = state["self_kv"]
        if "ancestry" not in state:
            raise ValueError("prefill expects a beam-tiled state")
        if "self_kv_sk" in state and state["self_kv_sk"].shape[3] == 2 * kv.shape[3]:
            raise NotImplementedError(
                "prefill supports float/bf16/int8 caches (int4 packs two "
                "columns per byte; streaming decodes at B=1 where int4 "
                "buys nothing)"
            )
        B, P = prefix_tokens.shape
        T_ = state["ancestry"].shape[2]
        S_ = kv.shape[3] // T_
        H, Dh = kv.shape[2], kv.shape[4] // 2

        x = self.embed(prefix_tokens) * self.embed_scale
        x = self.pos(x)
        self_bias = make_causal_bias(P, self.dtype)
        new_ks, new_vs = [], []
        for i, layer in enumerate(self.layers):
            residual = x
            h = layer.self_attn_layer_norm(x) if self.normalize_before else x
            attn = layer.self_attn
            q = attn._split(attn.q_proj(h)) * attn.head_dim**-0.5
            k_new = attn._split(attn.k_proj(h))  # (B, P, H, Dh)
            v_new = attn._split(attn.v_proj(h))
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_new,
                preferred_element_type=jnp.float32,
            ) + self_bias.astype(jnp.float32)
            wgt = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            h = jnp.einsum("bhqk,bkhd->bqhd", wgt, v_new)
            h = attn.out_proj(h.reshape(B, P, attn.embed_dim))
            new_ks.append(k_new)
            new_vs.append(v_new)
            x = residual + h
            if not self.normalize_before:
                x = layer.self_attn_layer_norm(x)
            residual = x
            h = layer.cross_attn_layer_norm(x) if self.normalize_before else x
            h, _, _ = layer.cross_attn(
                h, bias=state["cross_bias"], cache=state["cross"][i],
                static_kv=True, deterministic=True,
            )
            x = residual + h
            if not self.normalize_before:
                x = layer.cross_attn_layer_norm(x)
            residual = x
            h = layer.final_layer_norm(x) if self.normalize_before else x
            x = residual + layer.ffn(h, deterministic=True)
            if not self.normalize_before:
                x = layer.final_layer_norm(x)
        if self.normalize_before:
            x = self.final_norm(x)
        logits = self._output(x)  # (B, P, V) fp32

        # Cumulative prefix log-probability: logits at position t predict
        # token t+1; count only real (t+1 < prefix_len) transitions.
        logp = jax.nn.log_softmax(logits, axis=-1)
        nxt = jnp.concatenate(
            [prefix_tokens[:, 1:], prefix_tokens[:, :1]], axis=1
        )  # value at the wrapped tail is masked out below
        tok_lp = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]
        t_idx = jnp.arange(P)[None, :]
        prefix_logp = jnp.sum(
            jnp.where(t_idx + 1 < prefix_len, tok_lp, 0.0), axis=1
        )  # (B,)

        # Write slot 0 of the first P flattened positions: the physical
        # axis is (t, s) row-major, so a (B, L, H, T, S, 2Dh) reshape IS
        # the slot view — one strided static-slice write, no scatter.
        k_rows = jnp.stack(new_ks, axis=1).transpose(0, 1, 3, 2, 4)
        v_rows = jnp.stack(new_vs, axis=1).transpose(0, 1, 3, 2, 4)
        # (B, L, H, P, Dh) each
        kv5 = kv.reshape(B, self.num_layers, H, T_, S_, 2 * Dh)
        if "self_kv_sk" in state:
            levels = 127.0
            sk = jnp.max(jnp.abs(k_rows.astype(jnp.float32)), axis=-1) / levels
            sv = jnp.max(jnp.abs(v_rows.astype(jnp.float32)), axis=-1) / levels
            sk = jnp.maximum(sk, 1e-8)
            sv = jnp.maximum(sv, 1e-8)
            k_q = jnp.round(k_rows.astype(jnp.float32) / sk[..., None])
            v_q = jnp.round(v_rows.astype(jnp.float32) / sv[..., None])
            rows = jnp.clip(
                jnp.concatenate([k_q, v_q], axis=-1), -levels, levels
            ).astype(jnp.int8)
            kv5 = kv5.at[:, :, :, :P, 0, :].set(rows)
            sk5 = state["self_kv_sk"].reshape(B, self.num_layers, H, T_, S_)
            sv5 = state["self_kv_sv"].reshape(B, self.num_layers, H, T_, S_)
            updates = {
                "self_kv": kv5.reshape(kv.shape),
                "self_kv_sk": sk5.at[:, :, :, :P, 0].set(sk).reshape(
                    state["self_kv_sk"].shape
                ),
                "self_kv_sv": sv5.at[:, :, :, :P, 0].set(sv).reshape(
                    state["self_kv_sv"].shape
                ),
            }
        else:
            rows = jnp.concatenate([k_rows, v_rows], axis=-1).astype(kv.dtype)
            kv5 = kv5.at[:, :, :, :P, 0, :].set(rows)
            updates = {"self_kv": kv5.reshape(kv.shape)}
        new_state = {
            **state,
            **updates,
            "step": jnp.maximum(prefix_len - 1, 0).astype(jnp.int32),
        }
        return new_state, prefix_logp

    def step(
        self,
        prev_token: jnp.ndarray,  # (B, 1) the token generated last step
        state: DecoderState,
    ) -> Tuple[jnp.ndarray, DecoderState]:
        """One decode step → ((B, V) logits, updated state)."""
        step_idx = state["step"]
        kv = state["self_kv"]
        ancestry = state.get("ancestry")
        if ancestry is not None:
            # Shared across layers/heads: key column j = t·S + s is on beam
            # k's path iff ancestry[b, k, t] == s and t is in the past.
            # Encode as flat_rep[b, k, j] = j when valid, -1 otherwise —
            # the decode-attention kernel compares it against the column id.
            B_, K_, T_ = ancestry.shape
            S_ = self._flat_len(state) // T_
            t_idx = jnp.arange(T_, dtype=jnp.int32)[None, None, :]
            flat_idx = jnp.where(
                t_idx < step_idx, t_idx * S_ + ancestry.astype(jnp.int32), -1
            )  # (B, K, T)
            flat_rep = jnp.repeat(flat_idx, S_, axis=2)  # (B, K, T·S)
        else:
            flat_rep = None
        S_ = prev_token.shape[0] // kv.shape[0]
        logits, updates = self._step_core(
            prev_token, state, state["step"], flat_rep, step_idx * S_, step_idx
        )
        new_state = {**state, "step": step_idx + 1, **updates}
        return logits, new_state

    def serve_step(
        self,
        prev_token: jnp.ndarray,  # (B·K, 1)
        state: DecoderState,
    ) -> Tuple[jnp.ndarray, DecoderState]:
        """Continuous-batching decode step (infer/serving.py).

        Unlike :meth:`step`, co-scheduled utterances sit at DIFFERENT time
        positions: the cache's flattened (t·S) axis is a RING indexed by
        the shared global counter ``g`` (every active slot writes its new
        rows at physical ring position g mod T_ring — one aligned in-place
        DUS, same as offline decode), while each slot's logical time is
        its own ``local_step``. Validity and beam ancestry are resolved
        entirely through ``flat_rep``: physical ring slot tp holds a live
        row of batch b iff (tp - ring_base[b]) mod T_ring < local_step[b],
        where ring_base is the value of g when b's utterance was admitted.
        Positional embeddings use the per-slot local step.
        """
        kv = state["self_kv"]
        ancestry = state["ancestry"]  # (B, K, T_ring) PHYSICAL positions
        B_, K_, T_ = ancestry.shape
        S_ = self._flat_len(state) // T_
        g = state["g"]
        local_step = state["local_step"]  # (B,)
        ring_base = state["ring_base"]  # (B,)
        tp = jnp.arange(T_, dtype=jnp.int32)[None, :]
        age = jnp.mod(tp - ring_base[:, None], T_)  # (B, T_ring)
        valid = age < local_step[:, None]
        flat_idx = jnp.where(
            valid[:, None, :], tp[None] * S_ + ancestry.astype(jnp.int32), -1
        )  # (B, K, T_ring)
        flat_rep = jnp.repeat(flat_idx, S_, axis=2)
        pos_offset = jnp.repeat(local_step, S_)  # (B·K,)
        write_pos = jnp.mod(g, T_) * S_
        logits, updates = self._step_core(
            prev_token, state, pos_offset, flat_rep, write_pos, None
        )
        new_state = {
            **state,
            **updates,
            "g": g + 1,
            "local_step": jnp.minimum(local_step + 1, T_ - 1),
        }
        return logits, new_state

    def _step_core(
        self,
        prev_token: jnp.ndarray,
        state: DecoderState,
        pos_offset,
        flat_rep: Optional[jnp.ndarray],
        write_pos,
        plain_step_idx,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Shared decode-step body: embed → layers → logits → cache write.
        Returns (logits (N, V), dict of updated cache entries)."""
        kv = state["self_kv"]
        kv_scales = (
            (state["self_kv_sk"], state["self_kv_sv"])
            if "self_kv_sk" in state else None
        )
        step_idx = plain_step_idx
        x = self.embed(prev_token) * self.embed_scale
        x = self.pos(x, offset=pos_offset)
        new_ks, new_vs = [], []
        for i, layer in enumerate(self.layers):
            # Self-attention (pre/post-norm per layer config).
            residual = x
            h = layer.self_attn_layer_norm(x) if self.normalize_before else x
            h, k_new, v_new = self._self_attn_step(
                layer, h, kv, i, step_idx, flat_rep, kv_scales
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
        # The cache write below depends only on the per-layer K/V
        # projections — not on the attention OUTPUTS — so XLA's
        # latency-hiding scheduler may hoist it above the last layers'
        # attention-kernel reads of the cache; copy-insertion then has to
        # duplicate the whole cache to keep those reads valid (measured:
        # TWO full-cache copies per decode step, 2.4 ms of a 3.3 ms step
        # at B=32 K=10 T=201 int8 — more than the attention itself).
        # Pinning the write after the last read costs nothing and keeps
        # the dynamic_update_slice a true in-place row update.
        if kv_scales is not None:
            x, kv, sk_a, sv_a = jax.lax.optimization_barrier(
                (x, kv, kv_scales[0], kv_scales[1])
            )
            kv_scales = (sk_a, sv_a)
        else:
            x, kv = jax.lax.optimization_barrier((x, kv))
        logits = self._output(x)[:, -1]
        # ONE batched in-place write: (B, nL, H, S, 2·Dh) interleaved K‖V
        # rows at flattened position step·S — beam-slot k writes its token
        # into column step·S+k. The 128-lane last axis keeps this an
        # in-place row update (any other layout makes XLA copy the whole
        # cache per step — see init_state).
        B_, H_, Dh_ = kv.shape[0], kv.shape[2], kv.shape[4] // 2
        N_ = prev_token.shape[0]
        S_ = N_ // B_

        def to_rows(per_layer):  # list of (N, 1, H, Dh) → (B, nL, H, S, Dh)
            r = jnp.stack(per_layer, axis=1)  # (N, nL, 1, H, Dh)
            r = r.reshape(B_, S_, len(per_layer), H_, Dh_)
            return r.transpose(0, 2, 3, 1, 4)  # (B, nL, H, S, Dh)

        k_rows, v_rows = to_rows(new_ks), to_rows(new_vs)  # (B, nL, H, S, Dh)
        int4 = kv_scales is not None and kv_scales[0].shape[3] == 2 * kv.shape[3]
        if kv_scales is not None:
            # Per-row symmetric quantization: scale = amax/levels over Dh,
            # written alongside the rows so the kernel can dequant per
            # column (127 levels int8, 7 int4).
            levels = 7.0 if int4 else 127.0
            sk = jnp.max(jnp.abs(k_rows.astype(jnp.float32)), axis=-1) / levels
            sv = jnp.max(jnp.abs(v_rows.astype(jnp.float32)), axis=-1) / levels
            sk = jnp.maximum(sk, 1e-8)
            sv = jnp.maximum(sv, 1e-8)
            k_q = jnp.round(k_rows.astype(jnp.float32) / sk[..., None])
            v_q = jnp.round(v_rows.astype(jnp.float32) / sv[..., None])
            new_rows = jnp.clip(
                jnp.concatenate([k_q, v_q], axis=-1), -levels, levels
            ).astype(jnp.int8)
            if int4:
                # Half-split nibble write (ops/decode_attention.py layout):
                # byte p holds logical columns p (low nibble) and p + T·S/2
                # (high). T even ⇒ the S-column write never straddles the
                # boundary; read-merge-write of the S target bytes keeps
                # the OTHER nibble intact (live data in the serving ring).
                P_ = kv.shape[3]
                is_high = write_pos >= P_
                pb = write_pos - jnp.where(is_high, P_, 0)
                nib = new_rows.astype(jnp.int32) & 0xF
                old = jax.lax.dynamic_slice_in_dim(
                    kv, pb, S_, axis=3
                ).astype(jnp.int32) & 0xFF
                merged = jnp.where(
                    is_high, (old & 0x0F) | (nib << 4), (old & 0xF0) | nib
                )
                merged = merged - 256 * (merged >= 128)
                kv_written = jax.lax.dynamic_update_slice_in_dim(
                    kv, merged.astype(jnp.int8), pb, axis=3
                )
            else:
                kv_written = jax.lax.dynamic_update_slice_in_dim(
                    kv, new_rows, write_pos, axis=3
                )
            updates = {
                "self_kv": kv_written,
                "self_kv_sk": jax.lax.dynamic_update_slice_in_dim(
                    kv_scales[0], sk, write_pos, axis=3
                ),
                "self_kv_sv": jax.lax.dynamic_update_slice_in_dim(
                    kv_scales[1], sv, write_pos, axis=3
                ),
            }
        else:
            new_rows = jnp.concatenate([k_rows, v_rows], axis=-1)
            updates = {
                "self_kv": jax.lax.dynamic_update_slice_in_dim(
                    kv, new_rows, write_pos, axis=3
                )
            }
        return logits, updates


class CTCHead(nn.Module):
    """Auxiliary CTC projection over encoder states (multitask, SURVEY.md F9)."""

    vocab_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="ctc_proj")(
            encoder_out
        ).astype(jnp.float32)
