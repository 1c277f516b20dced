"""``python -m mm_s2ut.cli.vit_rollout`` — attention-rollout saliency maps.

Replaces the reference's hook-based analysis tool (SURVEY.md C12;
reference scripts/extract_feature/vit_rollout.py): the flax ViT returns
per-layer attention directly (no forward hooks), rollout chains
(A+I)/2 products, and the mask is saved as .npy (and optionally blended
over the image as a .png when matplotlib-free PIL compositing suffices).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.vit_rollout")


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.vit_rollout")
    ap.add_argument("--image", required=True)
    ap.add_argument("--model", default="vit_base_patch16_384")
    ap.add_argument("--checkpoint", required=True, help="timm pytorch_model.bin")
    ap.add_argument("--discard-ratio", type=float, default=0.9)
    ap.add_argument("--head-fusion", choices=["mean", "max", "min"], default="max")
    ap.add_argument("--output", required=True, help=".npy mask (+ .png overlay)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from mm_s2ut.models.vit import (
        VIT_VARIANTS, VisionTransformer, attention_rollout,
        load_timm_checkpoint, preprocess_images,
    )

    cfg = VIT_VARIANTS[args.model]
    variables = load_timm_checkpoint(args.checkpoint, cfg)
    vit = VisionTransformer(cfg)
    img = Image.open(args.image)
    pixels = preprocess_images([img], cfg.image_size)
    _, attns = vit.apply(variables, jnp.asarray(pixels), return_attn=True)
    mask = attention_rollout(
        [np.asarray(a) for a in attns],
        discard_ratio=args.discard_ratio,
        head_fusion=args.head_fusion,
    )[0]
    side = cfg.image_size // cfg.patch_size
    mask2d = mask.reshape(side, side)
    out = Path(args.output)
    np.save(out.with_suffix(".npy"), mask2d)

    # Overlay: upscale mask, blend red channel.
    m = Image.fromarray((mask2d * 255).astype(np.uint8)).resize(img.size)
    overlay = np.asarray(img.convert("RGB")).astype(np.float32)
    heat = np.asarray(m, np.float32)[..., None] / 255.0
    blended = (overlay * (1 - 0.5 * heat) + np.array([255.0, 0, 0]) * 0.5 * heat)
    Image.fromarray(blended.astype(np.uint8)).save(out.with_suffix(".png"))
    logger.info("saved %s(.npy/.png)", out)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
