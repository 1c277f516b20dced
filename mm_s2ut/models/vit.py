"""ViT image encoder (timm-graph-compatible) for offline/online image
features.

TPU-native equivalent of the reference's image feature path (SURVEY.md
F14/C11): timm ``vit_*_patch16_384.forward_features`` produces (577, 768)
patch features per 384² image (reference
scripts/extract_feature/get_img_feat_vit.py:69-92), consumed by the
fusion modules and extracted offline to per-split blobs. This module
reimplements that graph in flax (patch-embed conv → cls token + learned
positions → pre-norm transformer blocks → final LN) and converts timm/HF
checkpoints.

Also includes attention rollout (reference
scripts/extract_feature/vit_rollout.py) computed from the attention maps
returned by ``forward_features(..., return_attn=True)`` — no hooks needed.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.5, 0.5, 0.5)  # timm vit default (inception-style)
IMAGENET_STD = (0.5, 0.5, 0.5)


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 384
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layernorm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # +cls → 577 for B/16 @ 384


VIT_VARIANTS = {
    "vit_tiny_patch16_384": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "vit_small_patch16_384": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_384": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16_384": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
}


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype, name="norm1")(x)
        B, T, D = h.shape
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, c.num_heads, D // c.num_heads), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        scale = (D // c.num_heads) ** -0.5
        if self.use_flash and not return_attn:
            from mm_s2ut.ops.attention import attention as fused_attention

            attn = None
            # Pad keys/values to a lane-friendly length (577 → 584) with a
            # padding mask; queries keep their true length.
            pad = (-T) % 8
            if pad:
                kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
                mask = jnp.arange(T + pad)[None, :] >= T
                mask = jnp.broadcast_to(mask, (B, T + pad))
            else:
                kp, vp, mask = k, v, None
            out = fused_attention(q, kp, vp, key_padding_mask=mask, scale=scale)
            out = out.reshape(B, T, D)
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v).reshape(B, T, D)
        out = nn.Dense(D, dtype=self.dtype, name="proj")(out)
        x = x + out
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(D * c.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="fc2")(h)
        x = x + h
        return (x, attn) if return_attn else (x, None)


class VisionTransformer(nn.Module):
    cfg: ViTConfig = ViTConfig()
    dtype: Any = jnp.float32
    use_flash: bool = True  # fused Pallas attention on TPU (577 tokens)

    @nn.compact
    def __call__(
        self, pixels: jnp.ndarray, return_attn: bool = False
    ) -> Tuple[jnp.ndarray, Optional[List[jnp.ndarray]]]:
        """(B, H, W, 3) normalized pixels → ((B, 577, D) features,
        [per-layer (B, H, T, T) attention] if requested) — the
        ``forward_features`` surface."""
        c = self.cfg
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(pixels)
        B = x.shape[0]
        x = x.reshape(B, -1, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, c.seq_len, c.embed_dim)
        )
        x = x + pos.astype(self.dtype)
        attns = [] if return_attn else None
        for i in range(c.depth):
            x, attn = ViTBlock(
                c, dtype=self.dtype, use_flash=self.use_flash, name=f"block{i}"
            )(x, return_attn)
            if return_attn:
                attns.append(attn)
        x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype, name="norm")(x)
        return x, attns


def preprocess_images(
    images: List["Any"],
    image_size: int = 384,
    mean: Tuple[float, ...] = IMAGENET_MEAN,
    std: Tuple[float, ...] = IMAGENET_STD,
) -> np.ndarray:
    """PIL images → (B, S, S, 3) normalized float32. Matches the timm
    transform the reference builds with crop_pct=1.0, crop_mode='squash',
    bicubic (reference data/speech_to_speech_dataset.py:160-175)."""
    from PIL import Image

    out = np.zeros((len(images), image_size, image_size, 3), np.float32)
    for i, img in enumerate(images):
        img = img.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
        out[i] = np.asarray(img, np.float32) / 255.0
    out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return out


def attention_rollout(
    attns: List[np.ndarray], discard_ratio: float = 0.9, head_fusion: str = "max"
) -> np.ndarray:
    """Attention rollout saliency (reference vit_rollout.py:9-42): fuse
    heads, drop the lowest attentions, average with identity, and chain
    matrix products across layers. Returns (B, P) masks over patches."""
    result = None
    for attn in attns:  # (B, H, T, T)
        a = np.asarray(attn)
        if head_fusion == "mean":
            fused = a.mean(axis=1)
        elif head_fusion == "max":
            fused = a.max(axis=1)
        else:
            fused = a.min(axis=1)
        B, T, _ = fused.shape
        flat = fused.reshape(B, -1)
        n_drop = int(flat.shape[1] * discard_ratio)
        if n_drop:
            idx = np.argpartition(flat, n_drop, axis=1)[:, :n_drop]
            for b in range(B):
                rows, cols = np.unravel_index(idx[b], (T, T))
                keep = cols != 0  # never drop attention to cls
                fused[b, rows[keep], cols[keep]] = 0.0
        eye = np.eye(T, dtype=fused.dtype)[None]
        a_hat = (fused + eye) / 2.0
        a_hat = a_hat / a_hat.sum(axis=-1, keepdims=True)
        result = a_hat if result is None else a_hat @ result
    mask = result[:, 0, 1:]  # cls → patches
    return mask / (mask.max(axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# Checkpoint conversion (timm / HF ViT state dicts)
# ---------------------------------------------------------------------------


def load_timm_checkpoint(path: str, cfg: ViTConfig) -> Dict[str, Any]:
    """Convert a timm ViT ``pytorch_model.bin`` state dict (the reference's
    vit_timm load path, models/mm_s2s_transformer.py:275-284)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert_timm_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)


def convert_timm_state_dict(sd: Dict[str, np.ndarray], cfg: ViTConfig) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "cls_token": sd["cls_token"][0] if sd["cls_token"].ndim == 3 else sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            # torch conv (D, 3, P, P) → flax (P, P, 3, D)
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    if p["cls_token"].ndim == 2:
        p["cls_token"] = p["cls_token"][None]
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "qkv": {
                "kernel": sd[f"{b}.attn.qkv.weight"].T,
                "bias": sd[f"{b}.attn.qkv.bias"],
            },
            "proj": {
                "kernel": sd[f"{b}.attn.proj.weight"].T,
                "bias": sd[f"{b}.attn.proj.bias"],
            },
            "norm2": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "fc1": {
                "kernel": sd[f"{b}.mlp.fc1.weight"].T,
                "bias": sd[f"{b}.mlp.fc1.bias"],
            },
            "fc2": {
                "kernel": sd[f"{b}.mlp.fc2.weight"].T,
                "bias": sd[f"{b}.mlp.fc2.bias"],
            },
        }
    return {"params": p}
