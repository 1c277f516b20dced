"""Image-feature store.

Replacement for the reference ``ImageDataset`` (.pth blobs of precomputed
ViT/DETR features, reference data/speech_to_speech_dataset.py:36-68), with
the flickr30k split→image-dir/file-list maps preserved (reference
:533-554). Accepts the reference's torch ``{split}.pth`` blobs directly
(loaded once, converted to numpy) or ``.npy``/``.npz`` arrays — the
framework's own extractor (models/vit.py + cli/extract_features) writes
``.npy``.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

# Split-name → flickr30k image directory / caption-order file list
# (reference dic_img_dir / dic_txt, data/speech_to_speech_dataset.py:533-554).
SPLIT_IMG_DIR = {
    "test2017": "test2017",
    "testcoco": "testcoco",
    "test2016": "flickr30k",
    "train": "flickr30k",
    "val": "flickr30k",
    "valid": "flickr30k",
    "test.2017": "test2017",
    "test.coco": "testcoco",
    "test.2016": "flickr30k",
}
SPLIT_TXT = {
    "test2017": "test_2017_flickr.txt",
    "testcoco": "test_2017_mscoco.txt",
    "test2016": "test_2016_flickr.txt",
    "train": "train.txt",
    "val": "val.txt",
    "valid": "val.txt",
    "test.2017": "test_2017_flickr.txt",
    "test.coco": "test_2017_mscoco.txt",
    "test.2016": "test_2016_flickr.txt",
}


def _load_blob(path: Path) -> Optional[np.ndarray]:
    if not path.exists():
        return None
    suffix = path.suffix
    if suffix == ".npy":
        return np.load(path, mmap_mode="r")
    if suffix == ".npz":
        with np.load(path) as z:
            return z[list(z.keys())[0]]
    if suffix in (".pth", ".pt", ".bin"):
        # Compat path for reference-produced blobs; torch-free for
        # zip-format files (utils/torch_pickle.py).
        from mm_s2ut.utils import torch_pickle

        t = torch_pickle.load_checkpoint_numpy(path)
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)
    raise ValueError(f"unsupported feature blob {path}")


class ImageFeatureStore:
    """Per-split image features (N, T_img, D) + optional padding masks."""

    def __init__(
        self,
        feat_path: str | Path,
        mask_path: Optional[str | Path] = None,
        img_path_list: Optional[List[str]] = None,
        img_dir: Optional[str] = None,
    ):
        feats = _load_blob(Path(feat_path))
        if feats is None:
            raise FileNotFoundError(f"image features not found: {feat_path}")
        self.feats = feats
        self.masks = _load_blob(Path(mask_path)) if mask_path else None
        self.img_path_list = img_path_list
        self.img_dir = img_dir
        self.size = int(self.feats.shape[0])

    @classmethod
    def for_split(
        cls,
        feat_root: str | Path,
        split: str,
        flickr30k_root: Optional[str] = None,
    ) -> "ImageFeatureStore":
        """Open ``{feat_root}/{split}.(npy|pth)`` (+ ``{split}_mask``) with
        the reference's split naming; wire the flickr30k file list when a
        root is given so image paths are recoverable."""
        feat_root = Path(feat_root)
        feat_path = None
        for ext in (".npy", ".npz", ".pth", ".pt"):
            cand = feat_root / f"{split}{ext}"
            if cand.exists():
                feat_path = cand
                break
        if feat_path is None:
            raise FileNotFoundError(f"no {split}.(npy|npz|pth) under {feat_root}")
        mask_path = None
        for ext in (".npy", ".npz", ".pth", ".pt"):
            cand = feat_root / f"{split}_mask{ext}"
            if cand.exists():
                mask_path = cand
                break
        img_path_list, img_dir = None, None
        if flickr30k_root:
            # Same unknown-split fallback as RawImageStore.for_split.
            img_dir = os.path.join(
                flickr30k_root, SPLIT_IMG_DIR.get(split, "flickr30k") + "-images"
            )
            txt = Path(flickr30k_root) / SPLIT_TXT.get(split, f"{split}.txt")
            if txt.exists():
                img_path_list = [l.strip() for l in txt.read_text().splitlines() if l.strip()]
        return cls(feat_path, mask_path, img_path_list, img_dir)

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> Tuple[Optional[str], np.ndarray, Optional[np.ndarray]]:
        img_path = None
        if self.img_path_list is not None and self.img_dir is not None:
            img_path = os.path.join(self.img_dir, self.img_path_list[idx])
        mask = self.masks[idx] if self.masks is not None else None
        return img_path, np.asarray(self.feats[idx]), mask


def audio_stem_to_image_index(audio_path: str) -> int:
    """The reference's load-bearing quirk (SURVEY.md §7 hard part 7):
    image features are looked up by ``int(stem(audio_filename)) - 1`` into
    the flickr30k caption order (reference
    data/speech_to_speech_dataset.py:318-321)."""
    stem = os.path.splitext(os.path.basename(audio_path))[0]
    return int(stem) - 1


class RawImageStore:
    """On-line raw-image source (reference load_visual_extractor_type
    train path, data/speech_to_speech_dataset.py:168-190,318-330): opens
    the split's jpg by flickr30k caption order and applies the
    configured preprocessor mode (models/vit.py:preprocess_images).

    Duck-compatible with :class:`ImageFeatureStore` — ``__getitem__``
    returns ``(img_path, (S, S, 3) pixels, None)`` so the dataset/collate
    path is unchanged; the encoder detects the 3-D pixel item (vs 2-D
    features) and runs the in-graph ViT/CLIP extractor.
    """

    def __init__(
        self,
        img_dir: str,
        img_path_list: List[str],
        mode: str = "vit_timm",
        image_size: int = 224,
        mean: Optional[Tuple[float, ...]] = None,
        std: Optional[Tuple[float, ...]] = None,
    ):
        self.img_dir = img_dir
        self.img_path_list = list(img_path_list)
        self.mode = mode
        self.image_size = image_size
        self.mean, self.std = mean, std
        self.size = len(self.img_path_list)

    @classmethod
    def for_split(
        cls,
        flickr30k_root: str | Path,
        split: str,
        mode: str = "vit_timm",
        image_size: int = 224,
        mean=None,
        std=None,
    ) -> "RawImageStore":
        # Unknown split names (synthetic/custom corpora) fall back to the
        # flickr30k image dir and a literal "{split}.txt" list.
        img_dir = os.path.join(
            str(flickr30k_root), SPLIT_IMG_DIR.get(split, "flickr30k") + "-images"
        )
        txt = Path(flickr30k_root) / SPLIT_TXT.get(split, f"{split}.txt")
        if not txt.exists():
            raise FileNotFoundError(f"flickr30k caption list missing: {txt}")
        names = [l.strip() for l in txt.read_text().splitlines() if l.strip()]
        return cls(img_dir, names, mode, image_size, mean, std)

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> Tuple[Optional[str], np.ndarray, None]:
        from PIL import Image

        from mm_s2ut.models.vit import preprocess_images

        path = os.path.join(self.img_dir, self.img_path_list[idx])
        with Image.open(path) as img:
            pixels = preprocess_images(
                [img], self.image_size, mean=self.mean or None,
                std=self.std or None, mode=self.mode,
            )[0]
        return path, pixels, None
