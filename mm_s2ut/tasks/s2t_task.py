"""Task: ``multimodal_speech_to_text`` (enhanced / xm_transformer path).

TPU-native equivalent of the reference S2T task (SURVEY.md C2; reference
tasks/speech_to_text.py:28-65): same yaml plumbing as the S2S task, but
datasets carry text targets against the unit-mBART-style vocabulary, the
model is ``mm_xm_transformer`` (wav2vec2 encoder + adaptor + fusion), and
the frontend feeds raw waveforms (use_audio_input, reference
config/xm_transformer.yaml:3) instead of fbank.
"""
from __future__ import annotations

import logging
from typing import Dict, Iterator, Optional

import numpy as np

from mm_s2ut import registry
from mm_s2ut.config import Config
from mm_s2ut.data.bucketing import LengthBucketBatcher
from mm_s2ut.data.s2t_dataset import MultiModalSpeechToTextDataset
from mm_s2ut.models.mm_xm import MMXMTransformerModel
from mm_s2ut.models.wav2vec2 import Wav2Vec2Config
from mm_s2ut.tasks.s2s_task import MultiModalSpeechToSpeechTask

logger = logging.getLogger(__name__)


@registry.register_task("multimodal_speech_to_text")
class MultiModalSpeechToTextTask(MultiModalSpeechToSpeechTask):
    def load_dataset(self, split: str) -> MultiModalSpeechToTextDataset:
        if split not in self.datasets:
            self.datasets[split] = MultiModalSpeechToTextDataset.from_tsv(
                self.cfg.data.data_root,
                split,
                self.cfg.data,
                self.tgt_dict,
                mm_cfg=self.cfg.model.multimodal,
                noise_cfg=self.cfg.data.noise,
                seed=self.cfg.train.seed,
            )
        return self.datasets[split]

    def init_params(self, model):
        """Raw-waveform init batch (the XM model's wav2vec2 frontend
        consumes audio samples, not fbank — the inherited S2S dummy is
        (B, T, 80) mel features and traces a rank-3 'waveform')."""
        mm = self.cfg.model.multimodal
        n_imgs = len(mm.image_feat_path) or len(mm.image_feat_dim)
        B, S, Tt = 2, 3200, 8
        wavs = np.zeros((B, S), np.float32)
        lengths = np.full((B,), S, np.int32)
        prev = np.zeros((B, Tt), np.int32)
        imgs = tuple(
            np.zeros((B, 8, d), np.float32)
            for d in mm.image_feat_dim[:n_imgs]
        )
        masks = tuple(np.zeros((B, 8), bool) for _ in imgs)
        return model.init(self.root_key, wavs, lengths, prev, imgs, masks)

    def build_model(self, w2v_cfg: Optional[Wav2Vec2Config] = None):
        return MMXMTransformerModel(
            self.cfg.model,
            w2v_cfg=w2v_cfg or Wav2Vec2Config.from_args(self.cfg.model.w2v_args),
        )

    def batch_iterator(
        self, split: str, epoch: int = 0, shuffle: Optional[bool] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Raw-waveform batches (wav2vec2 consumes audio directly —
        use_audio_input=true in the reference data config)."""
        ds = self.load_dataset(split)
        data = self.cfg.data
        shuffle = ds.is_train if shuffle is None else shuffle
        batcher = LengthBucketBatcher(
            [ds.num_frames(i) for i in range(len(ds))],
            [ds.num_target_frames(i) + 2 for i in range(len(ds))],
            max_tokens=data.max_tokens * 160,  # frames→samples convention
            num_buckets=data.num_buckets,
            quantum=320 * 16,
            seed=self.cfg.train.seed,
        )
        for bucket, idx in batcher.epoch(epoch, shuffle=shuffle):
            items = [ds[int(i)] for i in idx]
            yield ds.collate(items, src_pad=bucket.src_len, tgt_pad=bucket.tgt_len)
