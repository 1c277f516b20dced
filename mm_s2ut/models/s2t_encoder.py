"""Speech transformer encoder (conv-subsample branch).

TPU-native equivalent of the fairseq ``S2TTransformerEncoder`` the
reference subclasses (SURVEY.md F7; reference models/mm_s2s_transformer.py:87):
(B, T, 80) log-mel features → 2× stride-2 Conv1d+GLU subsampler (4×) →
scaled sinusoidal positions → N pre-norm transformer layers → final LN.

Returns all layer states so in-layer/external fusion variants can consume
per-layer speech representations (reference encoder_states usage at
models/mm_s2s_transformer.py:536-556).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut.models.layers import (
    Conv1dSubsampler,
    SinusoidalPositionalEmbedding,
    TransformerEncoderLayer,
    lengths_to_padding_mask,
    make_padding_bias,
)

Dtype = Any


class SpeechTransformerEncoder(nn.Module):
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    conv_channels: int = 1024
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    max_positions: int = 6000
    use_flash: bool = False  # Pallas fused self-attention (train + eval;
    # attention dropout runs in-kernel via the counter-based hash)
    remat: bool = False  # activation rematerialization (reference
    # --checkpoint-activations; here jax.checkpoint per layer)
    sequence_parallel: bool = False  # shard activations (B, T, D) as
    # P(data, model, None) between layers when a mesh context is active
    pipeline_stages: int = 0  # >1 ⇒ run the layer stack as a GPipe over
    # the mesh's `pipe` axis (parallel/pipeline.py); needs an active mesh
    # with that many pipe devices
    pipeline_microbatches: int = 0  # 0 ⇒ defaults to pipeline_stages
    causal_attention: bool = False  # position-causal self-attention
    # (streaming-compatible: infer/streaming.py computes the identical
    # states incrementally); optional bounded left context below.
    attention_window: int = 0  # with causal_attention: attend only to the
    # last `attention_window` positions (0 = unbounded left context)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (B, T, F) fbank features
        lengths: jnp.ndarray,  # (B,) valid frame counts
        deterministic: bool = True,
        return_all_states: bool = False,
    ) -> dict:
        x, lengths = Conv1dSubsampler(
            mid_channels=self.conv_channels,
            out_dim=self.embed_dim,
            kernel_sizes=self.conv_kernel_sizes,
            dtype=self.dtype,
            name="subsampler",
        )(features.astype(self.dtype), lengths)

        x = x * math.sqrt(self.embed_dim)
        x = SinusoidalPositionalEmbedding(
            self.embed_dim, self.max_positions, dtype=self.dtype, name="pos"
        )(x)
        from mm_s2ut.ops.dropout import HashDropout

        x = HashDropout(self.dropout)(x, deterministic=deterministic)

        from mm_s2ut.ops.attention import on_tpu

        if self.use_flash and on_tpu():
            # The fused kernel wants sublane-aligned sequence lengths
            # (ops/attention.py gates on S % 8 == 0); bucketed batches
            # arrive at T/4 rows that are typically only even (the
            # sample-domain bucketing quantum). Pad the frame axis to a
            # multiple of 16 — padded rows are masked everywhere below
            # and every consumer of encoder_out honours the mask. Without
            # this, common shapes like T=250 silently fell back to the
            # dense XLA path.
            pad = (-x.shape[1]) % 16
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        padding_mask = lengths_to_padding_mask(lengths, x.shape[1])
        bias = make_padding_bias(padding_mask, self.dtype)
        key_padding_mask = padding_mask
        layer_causal = False
        if self.causal_attention:
            # Streaming-compatible mask: position i attends to j ≤ i (and
            # j > i − W when attention_window is set).
            if self.use_flash and self.pipeline_stages <= 1:
                # The flash kernel applies causal/window masks from iotas
                # in-kernel (ops/attention.py) — the dense (T, T) bias
                # below never materializes.
                layer_causal = True
            else:
                S = x.shape[1]
                i = jnp.arange(S)[:, None]
                j = jnp.arange(S)[None, :]
                allowed = j <= i
                if self.attention_window > 0:
                    allowed = jnp.logical_and(allowed, j > i - self.attention_window)
                causal = jnp.where(allowed, 0.0, -1e9).astype(self.dtype)
                bias = bias + causal[None, None, :, :]
                key_padding_mask = None
        # Zero out padded positions so they can't leak through convs/LN.
        x = x * (~padding_mask)[..., None].astype(x.dtype)

        states: List[jnp.ndarray] = []
        if self.pipeline_stages > 1:
            if return_all_states:
                raise ValueError(
                    "pipeline_stages > 1 keeps per-layer states resident on "
                    "their stage; in-layer/external fusion variants that "
                    "need encoder_states cannot run pipelined"
                )
            from mm_s2ut.parallel.pipeline import PipelinedEncoderStack

            mk_layer = lambda: TransformerEncoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                use_flash=self.use_flash,
                dtype=self.dtype,
            )
            x = PipelinedEncoderStack(
                layer_factory=mk_layer,
                num_layers=self.num_layers,
                n_stages=self.pipeline_stages,
                n_micro=self.pipeline_microbatches,
                remat=self.remat,
                name="pipe_stack",
            )(x, bias, deterministic, key_padding_mask)
            if self.normalize_before:
                x = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)
            return {
                "encoder_out": x,
                "encoder_padding_mask": padding_mask,
                "encoder_states": states,
                "lengths": lengths,
            }
        # static_argnums counts self: (x=1, padding_bias=2, deterministic=3,
        # key_padding_mask=4) — deterministic must stay a Python bool.
        layer_cls = (
            nn.remat(TransformerEncoderLayer, static_argnums=(3,))
            if self.remat else TransformerEncoderLayer
        )
        for i in range(self.num_layers):
            x = layer_cls(
                self.embed_dim, self.ffn_dim, self.num_heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                use_flash=self.use_flash,
                causal=layer_causal,
                causal_window=self.attention_window if layer_causal else 0,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, bias, deterministic, key_padding_mask)
            if self.sequence_parallel:
                from mm_s2ut.parallel import DATA_AXIS, MODEL_AXIS, maybe_shard

                x = maybe_shard(x, DATA_AXIS, MODEL_AXIS, None)
            if return_all_states:
                states.append(x)

        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)

        return {
            "encoder_out": x,  # (B, T', D)
            "encoder_padding_mask": padding_mask,  # (B, T') True=pad
            "encoder_states": states,
            "lengths": lengths,
        }
