"""ResNet-18 / 3D-conv visual frontend (AV-HuBERT-style lip/video encoder).

TPU-native equivalent of the reference's vestigial resnet encoder
(SURVEY.md C10; reference models/resnet_encoder.py:81-192 — which has
latent missing-import bugs and is unreachable in shipped configs; rebuilt
here as a working component): Conv3D temporal frontend → per-frame
ResNet-18 trunk → projection (+ optional transformer), producing a
(B, T, D) visual feature stream for the fusion layer.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        residual = x
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(norm("bn1")(h))
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = norm("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample")(x)
            residual = norm("bn_down")(residual)
        return jax.nn.relu(h + residual)


class ResNet18Trunk(nn.Module):
    """layers 2-5 of ResNet-18 (the stem is the 3D conv frontend)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for stage, (ch, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for block in range(2):
                x = BasicBlock(
                    ch, stride if block == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
        return x.mean(axis=(1, 2))  # global average pool → (N, 512)


class ResEncoder(nn.Module):
    """(B, T, H, W, C) video → (B, T, 512) frame features: Conv3D stem
    (temporal k=5) + 3D max-pool + ResNet-18 trunk applied per frame."""

    dtype: Dtype = jnp.float32
    frontend_channels: int = 64

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, T = video.shape[:2]
        x = nn.Conv(
            self.frontend_channels, (5, 7, 7), strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="frontend3d",
        )(video.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn0")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D trunk
        _, _, H, W, C = x.shape
        x = x.reshape(B * T, H, W, C)
        feats = ResNet18Trunk(dtype=self.dtype, name="trunk")(x, train)
        return feats.reshape(B, T, -1)


class SubModel(nn.Module):
    """ResEncoder + projection to the fusion width (+ optional transformer
    refinement) — the reference SubModel surface (resnet_encoder.py:177-192)."""

    out_dim: int = 768
    num_layers: int = 0
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        video: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if (video is None) == (features is None):
            raise ValueError("pass exactly one of video/features")
        x = ResEncoder(dtype=self.dtype, name="resnet")(video, train) if video is not None else features
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
        if self.num_layers:
            from mm_s2ut.models.layers import TransformerEncoderLayer

            for i in range(self.num_layers):
                x = TransformerEncoderLayer(
                    self.out_dim, self.out_dim * 4, self.num_heads,
                    dtype=self.dtype, name=f"layer{i}",
                )(x, deterministic=not train)
        return x
