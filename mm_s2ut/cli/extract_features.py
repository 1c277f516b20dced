"""``python -m mm_s2ut.cli.extract_features`` — offline ViT image features.

Replaces the reference's get_img_feat_vit.py (SURVEY.md C11; reference
scripts/extract_feature/get_img_feat_vit.py:85-122): runs the flax ViT's
forward_features over the flickr30k split file lists in caption order and
saves per-split ``{split}.npy`` blobs ((N, 577, D)) that ImageFeatureStore
reads directly. Batched on device; the reference's chunked-save/merge
dance is unnecessary (memmapped single write).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mm_s2ut.extract_features")


def get_filenames(flickr30k_root: str, split: str) -> List[Path]:
    """Caption-order image list (reference get_filenames, split maps at
    data/speech_to_speech_dataset.py:533-554)."""
    from mm_s2ut.data.image_store import SPLIT_IMG_DIR, SPLIT_TXT

    root = Path(flickr30k_root)
    img_dir = root / (SPLIT_IMG_DIR[split] + "-images")
    names = [
        l.strip() for l in (root / SPLIT_TXT[split]).read_text().splitlines() if l.strip()
    ]
    return [img_dir / n for n in names]


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.extract_features")
    ap.add_argument("--flickr30k-root", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "valid", "test2016"])
    ap.add_argument("--model", default="vit_base_patch16_384",
                    help="variant name (vit_{tiny,small,base,large}_patch16_384)")
    ap.add_argument("--extractor-type", default="vit_timm",
                    choices=("vit_timm", "vit_openai", "vit_huggingface"),
                    help="reference visual_extractor_type: timm ViT "
                    "(forward_features) or HF CLIP vision tower "
                    "(last hidden state, CLIPProcessor preprocessing)")
    ap.add_argument("--checkpoint", required=True,
                    help="timm pytorch_model.bin, or (vit_openai) an HF "
                    "CLIP checkpoint dir")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mm_s2ut.models.vit import (
        VIT_VARIANTS, CLIPVisionTransformer, VisionTransformer,
        load_clip_checkpoint, load_timm_checkpoint, preprocess_images,
    )

    if args.extractor_type == "vit_openai":
        cfg, variables = load_clip_checkpoint(args.checkpoint)
        clip = CLIPVisionTransformer(cfg)
        forward = jax.jit(lambda px: clip.apply(variables, px)[-1])
        prep_mode = "vit_openai"
    else:
        cfg = VIT_VARIANTS[args.model]
        variables = load_timm_checkpoint(args.checkpoint, cfg)
        vit = VisionTransformer(cfg)
        forward = jax.jit(lambda px: vit.apply(variables, px)[0])
        prep_mode = (
            "vit_huggingface" if args.extractor_type == "vit_huggingface"
            else "timm"
        )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for split in args.splits:
        paths = get_filenames(args.flickr30k_root, split)
        out = np.lib.format.open_memmap(
            out_dir / f"{split}.npy", mode="w+",
            dtype=np.float32, shape=(len(paths), cfg.seq_len, cfg.embed_dim),
        )
        B = args.batch_size
        for start in range(0, len(paths), B):
            chunk = paths[start : start + B]
            pixels = preprocess_images(
                [Image.open(p) for p in chunk], cfg.image_size, mode=prep_mode
            )
            if len(chunk) < B:  # pad to the compiled batch shape
                pixels = np.concatenate(
                    [pixels, np.zeros((B - len(chunk), *pixels.shape[1:]), np.float32)]
                )
            feats = np.asarray(forward(jnp.asarray(pixels)))[: len(chunk)]
            out[start : start + len(chunk)] = feats
            if (start // B) % 50 == 0:
                logger.info("%s: %d/%d", split, start + len(chunk), len(paths))
        out.flush()
        logger.info("wrote %s (%s)", out_dir / f"{split}.npy", out.shape)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
