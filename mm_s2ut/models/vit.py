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
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
    mode: str = "timm",
) -> np.ndarray:
    """PIL images → (B, S, S, 3) normalized float32.

    ``mode`` mirrors the reference's visual-preprocessor choices
    (data/speech_to_speech_dataset.py:160-190):
      * "timm" / "vit_timm" — squash-resize to S×S, bicubic,
        inception mean/std 0.5 (timm create_transform with crop_pct=1.0,
        crop_mode='squash');
      * "vit_openai" — CLIPProcessor: resize shortest edge to S bicubic,
        center-crop S×S, CLIP mean/std;
      * "vit_huggingface" — ViTImageProcessor: plain resize to S×S
        bilinear, mean/std 0.5.
    """
    from PIL import Image

    if mode in ("timm", "vit_timm", "default"):
        mean = mean or IMAGENET_MEAN
        std = std or IMAGENET_STD
        resample = Image.BICUBIC

        def prep(img):
            return img.resize((image_size, image_size), resample)
    elif mode == "vit_openai":
        mean = mean or CLIP_MEAN
        std = std or CLIP_STD

        def prep(img):
            w, h = img.size
            scale = image_size / min(w, h)
            nw, nh = round(w * scale), round(h * scale)
            img = img.resize((nw, nh), Image.BICUBIC)
            left = (nw - image_size) // 2
            top = (nh - image_size) // 2
            return img.crop((left, top, left + image_size, top + image_size))
    elif mode == "vit_huggingface":
        mean = mean or IMAGENET_MEAN
        std = std or IMAGENET_STD

        def prep(img):
            return img.resize((image_size, image_size), Image.BILINEAR)
    else:
        raise ValueError(f"unknown preprocess mode {mode!r}")

    out = np.zeros((len(images), image_size, image_size, 3), np.float32)
    for i, img in enumerate(images):
        out[i] = np.asarray(prep(img.convert("RGB")), np.float32) / 255.0
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
    vit_timm load path, models/mm_s2s_transformer.py:275-284). Torch-free
    for zip-format files (utils/torch_pickle.py)."""
    from mm_s2ut.utils import torch_pickle

    sd = torch_pickle.load_checkpoint_numpy(path)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert_timm_state_dict(
        {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray)},
        cfg,
    )


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


# ---------------------------------------------------------------------------
# CLIP visual tower (vit_openai path)
# ---------------------------------------------------------------------------

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    """Mirrors the HF CLIPVisionConfig surface (vit_openai reference path,
    models/mm_s2s_transformer.py:286-288)."""

    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layernorm_eps: float = 1e-5

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        D = c.embed_dim
        Dh = D // c.num_heads
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype, name="layer_norm1")(x)
        B, T, _ = h.shape
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(h) * Dh**-0.5
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(B, T, c.num_heads, Dh)
        k = k.reshape(B, T, c.num_heads, Dh)
        v = v.reshape(B, T, c.num_heads, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(int(D * c.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)  # CLIP's quick_gelu, not exact gelu
        h = nn.Dense(D, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionTransformer(nn.Module):
    """HF ``CLIPModel.vision_model`` graph: bias-free patch conv + class
    embedding + learned positions → pre-LN → quickgelu pre-norm blocks.

    ``__call__`` returns the per-layer hidden-states list exactly as the
    reference consumes it (``output_hidden_states=True`` →
    ``outputs['hidden_states']``, models/mm_s2s_transformer.py:298-306):
    entry 0 is the post-pre-LN embedding, entry i the output of block i;
    NO post-layernorm is applied to hidden states (HF applies it only to
    the pooled cls output)."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> List[jnp.ndarray]:
        c = self.cfg
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(pixels)
        B = x.shape[0]
        x = x.reshape(B, -1, c.embed_dim)
        cls = self.param("class_embedding", nn.initializers.zeros, (c.embed_dim,))
        x = jnp.concatenate(
            [jnp.tile(cls.astype(self.dtype)[None, None], (B, 1, 1)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, c.seq_len, c.embed_dim)
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=c.layernorm_eps, dtype=self.dtype, name="pre_layernorm"
        )(x)
        states = [x]
        for i in range(c.depth):
            x = CLIPBlock(c, dtype=self.dtype, name=f"block{i}")(x)
            states.append(x)
        return states


def convert_clip_state_dict(
    sd: Dict[str, np.ndarray], cfg: CLIPVisionConfig
) -> Dict[str, Any]:
    """HF CLIPVisionModel/CLIPModel (torch) state dict → flax params for
    :class:`CLIPVisionTransformer`. Accepts keys with or without the
    ``vision_model.`` prefix."""

    def strip(k: str) -> str:
        return k[len("vision_model."):] if k.startswith("vision_model.") else k

    sd = {strip(k): v for k, v in sd.items()}
    p: Dict[str, Any] = {
        "class_embedding": sd["embeddings.class_embedding"].reshape(-1),
        "pos_embed": sd["embeddings.position_embedding.weight"][None],
        "patch_embed": {
            "kernel": np.transpose(sd["embeddings.patch_embedding.weight"], (2, 3, 1, 0)),
        },
        "pre_layernorm": {
            "scale": sd["pre_layrnorm.weight"],  # HF's historical typo
            "bias": sd["pre_layrnorm.bias"],
        },
    }
    for i in range(cfg.depth):
        b = f"encoder.layers.{i}"
        blk = {
            "layer_norm1": {"scale": sd[f"{b}.layer_norm1.weight"],
                            "bias": sd[f"{b}.layer_norm1.bias"]},
            "layer_norm2": {"scale": sd[f"{b}.layer_norm2.weight"],
                            "bias": sd[f"{b}.layer_norm2.bias"]},
            "fc1": {"kernel": sd[f"{b}.mlp.fc1.weight"].T,
                    "bias": sd[f"{b}.mlp.fc1.bias"]},
            "fc2": {"kernel": sd[f"{b}.mlp.fc2.weight"].T,
                    "bias": sd[f"{b}.mlp.fc2.bias"]},
        }
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            blk[proj] = {
                "kernel": sd[f"{b}.self_attn.{proj}.weight"].T,
                "bias": sd[f"{b}.self_attn.{proj}.bias"],
            }
        p[f"block{i}"] = blk
    return {"params": p}


def load_clip_checkpoint(model_dir: str) -> Tuple[CLIPVisionConfig, Dict[str, Any]]:
    """Load an HF CLIP checkpoint dir (the reference's vit_openai load,
    CLIPModel.from_pretrained → .vision_model) into (config, params)."""
    import glob
    import json as _json
    import os

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = _json.load(f)
    vc = raw.get("vision_config", raw)
    cfg = CLIPVisionConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 16),
        embed_dim=vc.get("hidden_size", 768),
        depth=vc.get("num_hidden_layers", 12),
        num_heads=vc.get("num_attention_heads", 12),
        mlp_ratio=vc.get("intermediate_size", 3072) / vc.get("hidden_size", 768),
        layernorm_eps=vc.get("layer_norm_eps", 1e-5),
    )
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
        if hasattr(v, "numpy") or isinstance(v, np.ndarray)
    }
    return cfg, convert_clip_state_dict(np_sd, cfg)
