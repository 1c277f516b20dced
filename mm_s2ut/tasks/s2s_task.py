"""Task: ``multimodal_speech_to_speech`` (textless S2UT).

TPU-native equivalent of the reference task layer (SURVEY.md C1; reference
tasks/speech_to_speech.py:33-123): wires the typed config →
dataset/dictionary → model → criterion → trainer, seeds globals, and owns
the *device frontend* — a jitted program that turns padded waveform
batches into standardized log-mel features on the TPU (replacing the
reference's num-workers=8 CPU fbank path, SURVEY.md §3.1).
"""
from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut import registry
from mm_s2ut.config import Config, DataConfig, MultimodalConfig, NoiseConfig
from mm_s2ut.data.bucketing import LengthBucketBatcher
from mm_s2ut.data.dataset import SpeechToSpeechDataset
from mm_s2ut.data.dictionary import Dictionary, UnitDictionary
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.ops.fbank import FbankConfig, batched_log_mel_fbank, standardize
from mm_s2ut.utils.seed import set_seed

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("fbank_cfg", "do_standardize"))
def waveform_frontend(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    fbank_cfg: FbankConfig,
    do_standardize: bool = False,
):
    """(B, S) padded waveforms → ((B, T, M) log-mels, (B,) frame lengths).

    Waveforms are rescaled to int16 range first for kaldi parity
    (reference data/audio_utils.py:289-290)."""
    feats, frame_lens = batched_log_mel_fbank(
        waveforms * 32768.0, lengths, fbank_cfg
    )
    if do_standardize:
        feats = standardize(feats, frame_lens)
    return feats, frame_lens


@registry.register_task("multimodal_speech_to_speech")
class MultiModalSpeechToSpeechTask:
    def __init__(self, cfg: Config, tgt_dict: Optional[Dictionary] = None):
        self.cfg = cfg
        self.root_key = set_seed(cfg.train.seed)
        self.tgt_dict = tgt_dict or self._build_dictionary()
        cfg.model.vocab_size = len(self.tgt_dict)
        cfg.model.n_frames_per_step = cfg.data.n_frames_per_step
        self.datasets: Dict[str, SpeechToSpeechDataset] = {}
        self.fbank_cfg = FbankConfig(
            sample_rate=cfg.data.sample_rate, num_mel_bins=cfg.data.num_mel_bins
        )

    # -- setup ---------------------------------------------------------------

    def _build_dictionary(self) -> Dictionary:
        data = self.cfg.data
        vocab_path = Path(data.data_root) / data.vocab_filename if data.data_root else None
        if vocab_path and vocab_path.exists():
            d = Dictionary.load(vocab_path)
            logger.info("loaded dictionary %s (%d symbols)", vocab_path, len(d))
            return d
        lang_tags = []
        if (
            data.prepend_bos_and_append_tgt_lang_tag
            or data.prepend_tgt_lang_tag_as_bos
        ) and data.tgt_lang:
            tag = data.tgt_lang if data.tgt_lang.startswith("<lang:") else f"<lang:{data.tgt_lang}>"
            lang_tags.append(tag)
        return UnitDictionary(data.target_code_size, lang_tags)

    def load_dataset(self, split: str) -> SpeechToSpeechDataset:
        if split not in self.datasets:
            self.datasets[split] = SpeechToSpeechDataset.from_tsv(
                self.cfg.data.data_root,
                split,
                self.cfg.data,
                self.tgt_dict,
                mm_cfg=self.cfg.model.multimodal,
                noise_cfg=self.cfg.data.noise,
                seed=self.cfg.train.seed,
            )
        return self.datasets[split]

    def build_model(self) -> MMS2UTModel:
        arch_name = self.cfg.model.arch
        if arch_name in registry.available("arch"):
            _, arch_fn = registry.get_arch(arch_name)
            arch_fn(self.cfg.model)
        from mm_s2ut.models import build_model_from_config

        return build_model_from_config(self.cfg)

    def init_params(self, model: MMS2UTModel):
        ds = next(iter(self.datasets.values()), None)
        n_imgs = len(self.cfg.model.multimodal.image_feat_path) or len(
            self.cfg.model.multimodal.image_feat_dim
        )
        B, T, Tt = 2, 64, 8
        if self.cfg.model.speech_encoder_type != "conv_transformer":
            # wav2vec2/mHuBERT branches take raw waveforms; the dummy must
            # survive the conv stack (strides product ~320 samples/frame).
            T = 3200
            feats = np.zeros((B, T), np.float32)
        else:
            feats = np.zeros((B, T, self.cfg.data.num_mel_bins), np.float32)
        lengths = np.full((B,), T, np.int32)
        prev = np.zeros((B, Tt), np.int32)
        mm = self.cfg.model.multimodal
        if mm.load_visual_extractor_type:
            S = mm.image_input_size
            imgs = (np.zeros((B, S, S, 3), np.float32),)
            masks = (np.zeros((B, S), bool),)
        else:
            imgs = tuple(
                np.zeros((B, 8, d), np.float32)
                for d in mm.image_feat_dim[:n_imgs]
            )
            masks = tuple(np.zeros((B, 8), bool) for _ in imgs)
        return model.init(self.root_key, feats, lengths, prev, imgs, masks)

    # -- batching -------------------------------------------------------------

    def batch_iterator(
        self, split: str, epoch: int = 0, shuffle: Optional[bool] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Host collation (waveforms, bucket-padded) → device fbank →
        model-ready batches with ``src_features`` as log-mels."""
        ds = self.load_dataset(split)
        data = self.cfg.data
        shuffle = ds.is_train if shuffle is None else shuffle
        # max_tokens counts FBANK FRAMES (the reference textless
        # convention: --max-tokens 8000 ≈ 8 × ~1000-frame utterances).
        # Manifest src_n_frames counts SAMPLES for waveform input
        # (wav2vec_manifest convention, reference preprocess/2_manifest.sh),
        # so the frames budget converts to a samples budget by the frame
        # shift; src pad lengths stay in samples for waveform collation.
        shift = self.fbank_cfg.frame_shift
        batcher = LengthBucketBatcher(
            [ds.num_frames(i) for i in range(len(ds))],
            [ds.num_target_frames(i) + 2 for i in range(len(ds))],
            max_tokens=data.max_tokens * shift,
            num_buckets=data.num_buckets,
            quantum=shift * 32,
            seed=self.cfg.train.seed,
        )
        def host_batches():
            for bucket, idx in batcher.epoch(epoch, shuffle=shuffle):
                # Native C++ batch decode when applicable, python fallback.
                batch = ds.collate_native(idx, bucket.src_len, bucket.tgt_len)
                if batch is None:
                    items = [ds[int(i)] for i in idx]
                    batch = ds.collate(items, src_pad=bucket.src_len, tgt_pad=bucket.tgt_len)
                yield batch

        from mm_s2ut.data.prefetch import prefetch

        raw_input = self.cfg.model.speech_encoder_type != "conv_transformer"
        for batch in prefetch(host_batches(), depth=2):
            if raw_input:
                # wav2vec2/mHuBERT speech branches consume raw waveforms
                # (reference forward_wav2vec2_multimodal,
                # mm_s2s_transformer.py:308-376) — no fbank stage.
                # standardize_audio still applies (the fairseq
                # wav2vec2-large recipe normalizes raw waveforms
                # per-utterance; silently dropping the flag here would
                # make it frontend-dependent).
                if data.standardize_audio:
                    wavs = batch["src_features"]
                    lens = batch["src_lengths"]
                    valid = (
                        np.arange(wavs.shape[1])[None, :] < lens[:, None]
                    )
                    n = np.maximum(lens.astype(np.float64), 1)[:, None]
                    mean = (wavs * valid).sum(1, keepdims=True) / n
                    var = (((wavs - mean) * valid) ** 2).sum(1, keepdims=True) / n
                    batch["src_features"] = (
                        (wavs - mean) / np.sqrt(var + 1e-7) * valid
                    ).astype(np.float32)
                yield batch
                continue
            feats, frame_lens = waveform_frontend(
                jnp.asarray(batch["src_features"]),
                jnp.asarray(batch["src_lengths"]),
                self.fbank_cfg,
                data.standardize_audio,
            )
            batch["src_features"] = feats
            batch["src_lengths"] = frame_lens
            yield batch

    # -- convenience ----------------------------------------------------------

    def load_sample(
        self, audio_path: str, image_path: Optional[str] = None
    ) -> Dict[str, np.ndarray]:
        """Single-sample net input (the task.load_sample API the reference
        documents at README.md:232 but never implemented): wav → device
        fbank; image → .npy features (raw images go through
        inference.load_image_features)."""
        from mm_s2ut.data.audio_io import get_waveform

        wav, _ = get_waveform(audio_path, use_sample_rate=self.cfg.data.sample_rate)
        wav = wav.astype(np.float32)[None]
        lengths = np.asarray([wav.shape[1]], np.int32)
        feats, frame_lens = waveform_frontend(
            jnp.asarray(wav), jnp.asarray(lengths), self.fbank_cfg,
            self.cfg.data.standardize_audio,
        )
        sample: Dict[str, np.ndarray] = {
            "src_features": np.asarray(feats),
            "src_lengths": np.asarray(frame_lens),
        }
        if image_path is not None:
            from mm_s2ut.inference import load_image_features

            dims = self.cfg.model.multimodal.image_feat_dim
            feats_img = load_image_features(image_path, None, dims[0] if dims else 768)
            sample["imgs_list"] = (feats_img,)
            sample["img_masks_list"] = (np.zeros(feats_img.shape[:2], bool),)
        return sample

    def _load_visual_extractor_weights(self, model, params):
        """Initialize the on-line visual extractor from the pretrained
        checkpoint named by ``multimodal.load_visual_extractor`` (the
        reference's build_visual_extractor from_pretrained load,
        mm_s2s_transformer.py:272-290): timm ``.pth``/``.bin`` for
        vit_timm / vit_huggingface, an HF CLIP dir for vit_openai."""
        mm = self.cfg.model.multimodal
        from mm_s2ut.models.vit import (
            ViTConfig, load_clip_checkpoint, load_timm_checkpoint,
        )

        if mm.load_visual_extractor_type == "vit_openai":
            _, vparams = load_clip_checkpoint(mm.load_visual_extractor)
        else:
            vparams = load_timm_checkpoint(
                mm.load_visual_extractor,
                getattr(model, "vit_cfg", None) or ViTConfig(),
            )
        vparams = vparams["params"]  # converters return full variables
        try:
            from flax.core import unfreeze

            raw = unfreeze(params)
        except Exception:
            raw = params
        tgt = raw["params"]["visual_extractor"]
        want = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tgt)
        got = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), vparams)
        if want != got:
            raise ValueError(
                f"visual extractor checkpoint {mm.load_visual_extractor} does "
                f"not match the configured graph "
                f"(visual_extractor_args={mm.visual_extractor_args})"
            )
        raw["params"]["visual_extractor"] = jax.tree_util.tree_map(
            jnp.asarray, vparams
        )
        logger.info(
            "loaded visual extractor (%s) from %s",
            mm.load_visual_extractor_type, mm.load_visual_extractor,
        )
        return raw

    def build_trainer(self, criterion: str = "speech_to_unit"):
        from mm_s2ut.train.trainer import Trainer

        model = self.build_model()
        params = self.init_params(model)
        mm = self.cfg.model.multimodal
        if mm.load_visual_extractor_type and mm.load_visual_extractor:
            params = self._load_visual_extractor_weights(model, params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info("model %s: %.1fM params", self.cfg.model.arch, n_params / 1e6)
        return Trainer(self.cfg, model, params, criterion_name=criterion)

    def build_inference_metrics_fn(self, trainer):
        """MCD inference metrics at validation (fairseq --eval-inference):
        beam-decode each valid batch, vocode predicted and target units,
        and return summed MCD logging outputs for
        :func:`mm_s2ut.eval.mcd.reduce_inference_metrics`."""
        import json

        from mm_s2ut.eval.mcd import batch_mel_cepstral_distortion
        from mm_s2ut.infer.generator import UnitGenerator
        from mm_s2ut.models.hifigan import (
            CodeHiFiGAN, HiFiGANConfig, load_fairseq_checkpoint,
        )

        tcfg = self.cfg.train
        if not (tcfg.eval_vocoder_path and tcfg.eval_vocoder_cfg):
            raise ValueError(
                "train.eval_inference needs eval_vocoder_path + eval_vocoder_cfg"
            )
        with open(tcfg.eval_vocoder_cfg) as fh:
            vcfg_raw = json.load(fh)
        vcfg = HiFiGANConfig(**{
            k: v for k, v in vcfg_raw.items()
            if k in HiFiGANConfig.__dataclass_fields__
        })
        variables = load_fairseq_checkpoint(tcfg.eval_vocoder_path, vcfg)
        dur = bool(vcfg_raw.get("dur_prediction", vcfg.dur_prediction))
        sr = vcfg_raw.get("sampling_rate", 16000)

        def vocode(unit_seqs):
            seqs = [s if len(s) else [0] for s in unit_seqs]
            L = max(len(s) for s in seqs)
            max_frames = (8 * L + 16) if dur else (L + 1)
            model = CodeHiFiGAN(vcfg, max_frames=max_frames)
            units = np.zeros((len(seqs), L), np.int32)
            lens = np.asarray([len(s) for s in seqs], np.int32)
            for i, s in enumerate(seqs):
                units[i, : len(s)] = s
            wav, n_samples = model.apply(
                variables, jnp.asarray(units), jnp.asarray(lens),
                dur_prediction=dur,
            )
            wav, n_samples = np.asarray(wav), np.asarray(n_samples)
            return [wav[i, : n_samples[i]] for i in range(len(seqs))]

        def to_units(tokens):
            return self.tgt_dict.ids_to_units(tokens).tolist()

        # Build the generator ONCE: its jitted encode closure is keyed on
        # the callable, so a fresh UnitGenerator per batch would retrace
        # and recompile the encoder every validation batch. Params are a
        # jit argument — refresh them per call to track training.
        gen = UnitGenerator(
            trainer.model, trainer.state.params, self.cfg.generation
        )

        def fn(batch):
            gen.params = trainer.state.params
            hyps = gen.generate(
                np.asarray(batch["src_features"]), np.asarray(batch["src_lengths"]),
                tuple(np.asarray(x) for x in batch.get("imgs_list", ())),
                tuple(np.asarray(x) for x in batch.get("img_masks_list", ())),
            )
            pred = [to_units(h[0]["tokens"]) for h in hyps]
            targ = [to_units(t[t != self.tgt_dict.pad()].tolist())
                    for t in np.asarray(batch["target"])]
            return batch_mel_cepstral_distortion(vocode(targ), vocode(pred), sr)

        return fn
