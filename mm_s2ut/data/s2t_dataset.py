"""Multimodal speech-to-text dataset (enhanced path).

TPU-native equivalent of the reference MultiModalSpeechToTextDataset /
Creator (SURVEY.md C6; reference data/speech_to_text_dataset.py): same
manifest/collation machinery as the S2S dataset, but targets are text
tokenized against the task vocabulary (unit-mBART style, lang tags as
bos/eos — reference config/xm_transformer.yaml:4-7), and multi-split
training supports temperature resampling (reference :386-394).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence  # noqa: F401

import numpy as np

from mm_s2ut.data.dataset import SpeechToSpeechDataset


class MultiModalSpeechToTextDataset(SpeechToSpeechDataset):
    """Overrides target encoding: raw transcript → (optional)
    pre-tokenizer → (optional) SentencePiece → vocab ids (+ optional
    lang-tag bos), EOS appended — the reference's build_tokenizer/
    build_bpe dataset chain (tasks/speech_to_text.py:48-49). With no
    ``bpe_tokenizer`` configured, targets must be pre-tokenized offline."""

    def tokenize(self, text: str) -> str:
        from mm_s2ut.data.sentencepiece import (
            apply_pre_tokenizer, build_bpe_tokenizer,
        )

        text = apply_pre_tokenizer(self.cfg.pre_tokenizer or None, text)
        if not hasattr(self, "_bpe"):
            self._bpe = build_bpe_tokenizer(self.cfg.bpe_tokenizer or None)
        if self._bpe is not None:
            text = " ".join(self._bpe.encode(text))
        return text

    def _encode_target(self, row):
        # Hook shared by __getitem__ AND the native/grain collate path —
        # overriding __getitem__ alone left collate_native encoding raw
        # untokenized transcripts with no bos/lang-tag framing.
        target = self.tgt_dict.encode_line(
            self.tokenize(row.tgt_text), append_eos=True
        ).astype(np.int64)
        tgt_lang_tag = None
        if self.cfg.prepend_tgt_lang_tag_as_bos and row.tgt_lang:
            tgt_lang_tag = self.lang_tag_index(row.tgt_lang)
        if self.cfg.prepend_bos_and_append_tgt_lang_tag and row.tgt_lang:
            # xm/unit-mBART convention (reference config/xm_transformer.yaml:5-7
            # via fairseq SpeechToTextDataset): target =
            # <bos> tokens <eos> <lang:tgt>; the collater's rotation then
            # makes prev_output_tokens start with the lang tag (fairseq
            # collate_tokens(move_eos_to_beginning=True, eos_idx=None)
            # copies the LAST target token to position 0), matching
            # generation that starts from eos_token = the lang tag.
            tag = self.lang_tag_index(row.tgt_lang)
            target = np.concatenate(
                [[self.tgt_dict.bos()], target, [tag]]
            ).astype(np.int64)
            tgt_lang_tag = tag
        return target, tgt_lang_tag


class ResampledConcat:
    """Temperature-resampled concatenation of datasets (reference
    ResamplingDataset use, data/speech_to_text_dataset.py:386-394):
    size ratio for split i ∝ (n_i / N)^(1/T) normalized so the largest
    split keeps ratio 1 at T=1."""

    def __init__(self, datasets: Sequence, temperature: float = 1.0, seed: int = 1):
        self.datasets = list(datasets)
        self.seed = seed
        sizes = np.asarray([len(d) for d in self.datasets], np.float64)
        if temperature == 1.0 or len(self.datasets) == 1:
            self.ratios = np.ones(len(self.datasets))
        else:
            probs = sizes / sizes.sum()
            smoothed = probs ** (1.0 / temperature)
            smoothed /= smoothed.sum()
            # fairseq convention: ratio_i = smoothed_i · N / n_i — small
            # splits get upsampled (>1), large splits downsampled (<1).
            self.ratios = smoothed * sizes.sum() / sizes
        self.target_sizes = np.maximum(np.round(sizes * self.ratios).astype(int), 1)

    def __len__(self) -> int:
        return int(self.target_sizes.sum())

    def epoch_indices(self, epoch: int) -> List[tuple]:
        """[(dataset_idx, sample_idx), ...] for one resampled epoch.
        Upsampled splits repeat samples (with-replacement draw); the
        shuffle is seeded per epoch."""
        rng = np.random.RandomState(self.seed + epoch)
        out: List[tuple] = []
        for di, (ds, n) in enumerate(zip(self.datasets, self.target_sizes)):
            if n == len(ds):
                idx = np.arange(len(ds))
            else:
                idx = rng.choice(len(ds), size=n, replace=n > len(ds))
            out.extend((di, int(i)) for i in idx)
        rng.shuffle(out)
        return out

    def get(self, dataset_idx: int, sample_idx: int):
        return self.datasets[dataset_idx][sample_idx]
