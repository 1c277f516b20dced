"""Multimodal speech-to-speech (S2UT) dataset + collation.

TPU-native re-design of the reference
MultiModalSpeechToSpeechDataset/Creator (SURVEY.md C5; reference
data/speech_to_speech_dataset.py): the host side only *loads and aligns*
(waveforms, unit ids, image features); fbank, standardization and noise
mixing run on device (ops.fbank / ops.noise) inside the training pipeline.
Collation produces static, bucket-padded numpy batches (XLA-friendly)
while preserving the reference's semantics:

* targets: ``encode_line(unit string) + <eos>`` with offset-4 ids, trimmed
  to a multiple of n_frames_per_step (reference :276-342);
* ``prev_output_tokens``: packed units, EOS moved to the beginning
  (fairseq move_eos_to_beginning), lang-tag-as-BOS override when
  configured (reference :457-459);
* length-sorted descending by source frames (reference collater :377-471);
* image features looked up by audio-filename-stem − 1 (reference :318-321).
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from mm_s2ut.config import DataConfig, MultimodalConfig, NoiseConfig
from mm_s2ut.data.audio_io import get_waveform
from mm_s2ut.data.dictionary import Dictionary
from mm_s2ut.data.image_store import ImageFeatureStore, audio_stem_to_image_index
from mm_s2ut.data.manifest import ManifestRow, read_manifest
from mm_s2ut.ops.noise import select_noise, tile_noise_to_length

logger = logging.getLogger(__name__)


def pack_units(ids: np.ndarray, n_frames_per_step: int, vocab_size: int, offset: int = 4) -> np.ndarray:
    """Base-V packing of n consecutive unit ids into one id (reference
    pack_units, data/speech_to_speech_dataset.py:194-215). Input ends with
    EOS; output keeps EOS as its last element."""
    if n_frames_per_step <= 1:
        return ids
    V = vocab_size - offset
    if V**n_frames_per_step + offset > 2**31 - 1:
        raise ValueError(
            f"pack_units: V={V}^n={n_frames_per_step} exceeds int32 id "
            "space — reduce n_frames_per_step or the unit vocabulary"
        )
    body = ids[:-1].reshape(-1, n_frames_per_step) - offset
    scale = np.array(
        [V ** (n_frames_per_step - 1 - i) for i in range(n_frames_per_step)],
        dtype=np.int64,
    )
    packed = (body * scale).sum(axis=1) + offset
    return np.concatenate([packed, ids[-1:]]).astype(np.int64)


def unpack_units(packed: np.ndarray, n_frames_per_step: int, vocab_size: int, offset: int = 4) -> np.ndarray:
    """Inverse of :func:`pack_units` (specials pass through)."""
    if n_frames_per_step <= 1:
        return packed
    V = vocab_size - offset
    out: List[int] = []
    for p in packed:
        p = int(p)
        if p < offset:
            out.append(p)
            continue
        p -= offset
        units = [(p // V ** (n_frames_per_step - 1 - i)) % V for i in range(n_frames_per_step)]
        out.extend(u + offset for u in units)
    return np.asarray(out, np.int64)


@dataclass
class S2SItem:
    index: int
    id: str
    source: np.ndarray  # (S,) float32 waveform (or (T, F) features)
    target: np.ndarray  # (Lt,) unit ids incl. EOS
    tgt_lang_tag: Optional[int]
    src_audio_path: str
    imgs: List[np.ndarray]
    img_masks: List[Optional[np.ndarray]]
    speaker: Optional[np.ndarray] = None


class SpeechToSpeechDataset:
    def __init__(
        self,
        split: str,
        is_train: bool,
        data_cfg: DataConfig,
        rows: Sequence[ManifestRow],
        tgt_dict: Dictionary,
        image_stores: Sequence[ImageFeatureStore] = (),
        noise_wavs: Sequence[np.ndarray] = (),
        noise_cfg: Optional[NoiseConfig] = None,
        seed: int = 1,
    ):
        self.split = split
        self.is_train = is_train
        self.cfg = data_cfg
        self.rows = list(rows)
        self.tgt_dict = tgt_dict
        self.image_stores = list(image_stores)
        self.noise_wavs = list(noise_wavs)
        self.noise_cfg = noise_cfg or NoiseConfig()
        self.n_frames_per_step = data_cfg.n_frames_per_step
        self.rng = np.random.RandomState(seed)
        # Optional target speaker embeddings keyed by manifest id.
        self.speaker_embeds: Optional[Dict[str, str]] = None
        if data_cfg.target_speaker_embed:
            import csv

            with open(data_cfg.target_speaker_embed, newline="") as f:
                reader = csv.DictReader(f, delimiter="\t")
                self.speaker_embeds = {
                    r["id"]: r["speaker_embed"] for r in reader
                }

    # -- creation ------------------------------------------------------------

    @classmethod
    def from_tsv(
        cls,
        root: str | Path,
        split: str,
        data_cfg: DataConfig,
        tgt_dict: Dictionary,
        mm_cfg: Optional[MultimodalConfig] = None,
        noise_cfg: Optional[NoiseConfig] = None,
        is_train: Optional[bool] = None,
        seed: int = 1,
    ) -> "SpeechToSpeechDataset":
        rows = read_manifest(Path(root) / f"{split}.tsv")
        is_train = split.startswith("train") if is_train is None else is_train
        stores: List[ImageFeatureStore] = []
        if mm_cfg is not None:
            if mm_cfg.load_visual_extractor_type:
                # On-line raw-image path (reference
                # data/speech_to_speech_dataset.py:168-190,318-330): the
                # dataset yields preprocessed pixels and the encoder runs
                # the ViT/CLIP extractor in-graph.
                from mm_s2ut.data.image_store import RawImageStore

                stores.append(
                    RawImageStore.for_split(
                        mm_cfg.flickr30k_root, split,
                        mode=mm_cfg.load_visual_extractor_type,
                        image_size=mm_cfg.image_input_size,
                        mean=tuple(mm_cfg.image_mean) or None,
                        std=tuple(mm_cfg.image_std) or None,
                    )
                )
            else:
                for feat_root in mm_cfg.image_feat_path:
                    stores.append(
                        ImageFeatureStore.for_split(
                            feat_root, split, mm_cfg.flickr30k_root or None
                        )
                    )
        noise_wavs: List[np.ndarray] = []
        if noise_cfg and noise_cfg.noise_wav_dir and noise_cfg.noise_prob > 0:
            for p in sorted(Path(noise_cfg.noise_wav_dir).glob("*.wav")):
                noise_wavs.append(get_waveform(str(p))[0])
        return cls(
            split, is_train, data_cfg, rows, tgt_dict, stores, noise_wavs,
            noise_cfg, seed,
        )

    # -- access --------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.rows)

    def num_frames(self, index: int) -> int:
        return self.rows[index].src_n_frames

    def num_target_frames(self, index: int) -> int:
        return self.rows[index].tgt_n_frames // self.n_frames_per_step

    def _maybe_add_noise(self, wav: np.ndarray) -> np.ndarray:
        """Host-side per-sample noise mixing at a random SNR (reference
        add_noise path, data/speech_to_speech_dataset.py:217-232 +
        audio_utils.py:161-233). The device path (ops.noise.add_noise)
        is preferred for throughput; this keeps loader parity."""
        nc = self.noise_cfg
        if not self.noise_wavs or self.rng.rand() >= nc.noise_prob:
            return wav
        noise = select_noise(self.noise_wavs, 1, self.rng)
        noise = tile_noise_to_length(noise.reshape(-1), len(wav), -1, self.rng)
        snr = self.rng.uniform(nc.noise_snr_low, nc.noise_snr_high)
        factor = 1.0 / (10.0 ** (snr / 20.0) + 1.0)
        clean_amp = np.abs(wav).mean()
        noise_amp = np.abs(noise).mean() + 1e-14
        noisy = wav * (1 - factor) + noise * (factor * clean_amp / noise_amp)
        peak = max(np.abs(noisy).max(), 1.0)
        return (noisy / peak).astype(np.float32)

    def __getitem__(self, index: int) -> S2SItem:
        row = self.rows[index]
        path = row.src_audio
        if self.cfg.audio_root and not os.path.isabs(path):
            path = os.path.join(self.cfg.audio_root, path)
        wav, _ = get_waveform(path, use_sample_rate=self.cfg.sample_rate)
        if self.is_train:
            wav = self._maybe_add_noise(wav.astype(np.float32))
        item = self._target_item(index, row)
        item.source = wav.astype(np.float32)
        return item

    # -- native fast path -------------------------------------------------------

    def collate_native(
        self,
        indices: Sequence[int],
        src_pad: int,
        tgt_pad: int,
        n_threads: int = 8,
    ) -> Optional[Dict[str, np.ndarray]]:
        """Batch decode via the C++ loader (mm_s2ut.native): all wavs of the
        batch are decoded by a GIL-free thread pool straight into the padded
        buffer. Returns None when the fast path doesn't apply (noise aug
        active, native lib unavailable, or non-wav/resampled sources) —
        callers fall back to :meth:`collate`."""
        if self.is_train and self.noise_wavs and self.noise_cfg.noise_prob > 0:
            return None
        from mm_s2ut import native

        if not native.available():
            return None
        rows = [self.rows[int(i)] for i in indices]
        paths = []
        for row in rows:
            p = row.src_audio
            if self.cfg.audio_root and not os.path.isabs(p):
                p = os.path.join(self.cfg.audio_root, p)
            if not p.endswith(".wav"):
                return None
            paths.append(p)
        src, src_lengths, rates = native.load_batch(paths, src_pad, n_threads)
        if not (rates == self.cfg.sample_rate).all():
            return None  # needs resampling — python path
        order = np.argsort(-src_lengths, kind="stable")
        rows = [rows[i] for i in order]
        src = src[order]
        src_lengths = src_lengths[order]
        items = []
        for local_i, row in zip(order, rows):
            item = self._target_item(int(indices[int(local_i)]), row)
            items.append(item)
        batch = self._collate_targets(items, tgt_pad)
        batch["src_features"] = src
        batch["src_lengths"] = src_lengths.astype(np.int32)
        return batch

    def lang_tag_index(self, lang: str) -> int:
        """Vocabulary id of ``<lang:xx>`` (fairseq LANG_TAG_TEMPLATE)."""
        tag = lang if lang.startswith("<lang:") else f"<lang:{lang}>"
        return self.tgt_dict.index(tag)

    def _encode_target(self, row: ManifestRow):
        """(target ids, tgt_lang_tag) for one manifest row. The S2T
        dataset overrides THIS hook (tokenizer/BPE + bos/lang-tag target
        framing), so both __getitem__ and the native/grain collate path
        share one target construction."""
        target = self.tgt_dict.encode_line(row.tgt_text, append_eos=True).astype(np.int64)
        n = self.n_frames_per_step
        if n > 1:
            body = len(target) - 1
            keep = body - body % n
            target = np.concatenate([target[:keep], [self.tgt_dict.eos()]])
        tgt_lang_tag = None
        # S2S convention: lang tag as the decoder's first input token
        # (reference prepend_tgt_lang_tag_as_bos,
        # speech_to_speech_dataset.py:280-283,455-459). The S2T/xm
        # convention (prepend_bos_and_append_tgt_lang_tag) lives in the
        # s2t_dataset _encode_target override.
        if self.cfg.prepend_tgt_lang_tag_as_bos and row.tgt_lang:
            tgt_lang_tag = self.lang_tag_index(row.tgt_lang)
        return target, tgt_lang_tag

    def _target_item(self, index: int, row: ManifestRow) -> S2SItem:
        """Item without audio (targets/images only) for the native path."""
        target, tgt_lang_tag = self._encode_target(row)
        imgs: List[np.ndarray] = []
        masks: List[Optional[np.ndarray]] = []
        if self.image_stores:
            img_idx = audio_stem_to_image_index(row.src_audio)
            for store in self.image_stores:
                _, feat, mask = store[img_idx]
                imgs.append(np.asarray(feat, np.float32))
                masks.append(None if mask is None else np.asarray(mask, bool))
        speaker = None
        if self.speaker_embeds is not None and row.id in self.speaker_embeds:
            speaker = np.load(self.speaker_embeds[row.id]).astype(np.float32).reshape(-1)
        return S2SItem(
            index=index, id=row.id, source=np.zeros(0, np.float32),
            target=target, tgt_lang_tag=tgt_lang_tag,
            src_audio_path=row.src_audio, imgs=imgs, img_masks=masks,
            speaker=speaker,
        )

    def _collate_targets(
        self, items: Sequence[S2SItem], tgt_pad: Optional[int]
    ) -> Dict[str, np.ndarray]:
        """Target/image collation shared by both paths (items pre-ordered)."""
        pad_id, eos_id = self.tgt_dict.pad(), self.tgt_dict.eos()
        B = len(items)
        nfs = self.n_frames_per_step
        packed = [
            pack_units(it.target, nfs, len(self.tgt_dict)) for it in items
        ]
        L = tgt_pad or max(len(p) for p in packed)
        # Reference semantics (_collate_target, speech_to_speech_dataset.py
        # :344-375): only the DECODER INPUT packs n frames per id
        # (StackedEmbedding consumes base-V^n); the loss target stays
        # unpacked base-V — the decoder head expands each packed position
        # to n sub-frame logits (UnitDecoder._output). target_lengths /
        # ntokens count PACKED positions, as in the reference.
        Lt = L if nfs <= 1 else nfs * (L - 1) + 1
        target = np.full((B, Lt), pad_id, np.int32)
        prev = np.full((B, L), pad_id, np.int32)
        target_lengths = np.zeros((B,), np.int32)
        for i, (it, p) in enumerate(zip(items, packed)):
            n = min(len(p), L)
            nt = min(len(it.target), Lt)
            target[i, :nt] = it.target[:nt]
            prev[i, 0] = it.tgt_lang_tag if it.tgt_lang_tag is not None else eos_id
            prev[i, 1:n] = p[: n - 1]
            target_lengths[i] = n
        batch: Dict[str, np.ndarray] = {
            "id": np.asarray([it.index for it in items], np.int64),
            "prev_output_tokens": prev,
            "target": target,
            "target_lengths": target_lengths,
            "ntokens": np.asarray(target_lengths.sum(), np.int64),
            "nsentences": np.asarray(B, np.int64),
        }
        if items[0].imgs:
            imgs_list, masks_list = [], []
            for k in range(len(items[0].imgs)):
                imgs_list.append(np.stack([it.imgs[k] for it in items]))
                if items[0].img_masks[k] is not None:
                    masks_list.append(np.stack([it.img_masks[k] for it in items]))
                else:
                    masks_list.append(np.zeros((B, imgs_list[k].shape[1]), bool))
            batch["imgs_list"] = tuple(imgs_list)
            batch["img_masks_list"] = tuple(masks_list)
        if items[0].speaker is not None:
            batch["tgt_speaker"] = np.stack([it.speaker for it in items])
        return batch

    # -- collation -------------------------------------------------------------

    def collate(
        self,
        items: Sequence[S2SItem],
        src_pad: Optional[int] = None,
        tgt_pad: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Pad + sort descending by source length. ``src_pad``/``tgt_pad``
        fix the padded shapes (bucketing); default = batch max."""
        order = np.argsort([-len(it.source) for it in items], kind="stable")
        items = [items[i] for i in order]
        B = len(items)

        S = src_pad or max(len(it.source) for it in items)
        src = np.zeros((B, S), np.float32)
        src_lengths = np.zeros((B,), np.int32)
        for i, it in enumerate(items):
            n = min(len(it.source), S)
            src[i, :n] = it.source[:n]
            src_lengths[i] = n

        batch = self._collate_targets(items, tgt_pad)
        batch["src_features"] = src  # waveforms; device fbank converts downstream
        batch["src_lengths"] = src_lengths
        return batch
