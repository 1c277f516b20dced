"""Typed configuration tree.

One config system replacing the reference's three layers (SURVEY.md §5.6):
fairseq argparse ``add_args`` (reference tasks/speech_to_speech.py:47-81),
fairseq data-config YAML (reference config/xm_transformer.yaml), and the
OmegaConf multimodal YAML (reference config/multimodal_s2ut_transformer.yaml,
loaded at tasks/speech_to_speech.py:86-91 and models/mm_s2s_transformer.py:103-107).

The ``multimodal_s2ut_transformer.yaml`` key names are preserved verbatim
(BASELINE.json requires the yaml surface unchanged): see
:class:`MultimodalConfig` field names.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import yaml

# ---------------------------------------------------------------------------
# Multimodal (fusion) config — key-for-key the reference yaml surface.
# Reference: config/multimodal_s2ut_transformer.yaml:1-41 and the
# getattr-defaulted read sites in models/mm_s2s_transformer.py:103-126.
# ---------------------------------------------------------------------------

VISUAL_EXTRACTOR_TYPE_CHOICES = (None, "", "vit", "detr", "resnet", "resnet+encoder")
MULTIMODAL_ATTENTION_TYPE_CHOICES = (
    None, "selective_attention", "multimodal_attention",
    # Fusion modules the reference implements (fuse.py:288-357, 360-447)
    # but never lists in its shipped yaml choices — first-class here.
    "external_multimodal_transformer", "bridge_tower",
)


@dataclass
class MultimodalConfig:
    # Selective-attention dropouts.
    SA_image_dropout: float = 0.1
    SA_text_dropout: float = 0.0
    SA_attention_dropout: float = 0.1
    # Pre-norm the image stream before fusion.
    image_pre_norm: bool = True
    # Fuse at the top of the encoder (vs in-layer fusion).
    is_fusion_top: bool = True
    # One image-feature source per entry; dims must align 1:1.
    image_feat_path: List[str] = field(default_factory=list)
    image_feat_dim: List[int] = field(default_factory=lambda: [768])
    flickr30k_root: str = ""
    # Optional on-line visual extractor (None ⇒ offline features).
    visual_extractor_type_choices: List[Any] = field(
        default_factory=lambda: list(VISUAL_EXTRACTOR_TYPE_CHOICES)
    )
    load_visual_extractor_type: Optional[str] = None
    load_visual_extractor: Optional[str] = None
    # Raw-image preprocessing for the on-line extractor (reference yaml
    # keys image_input_size/image_mean/image_std,
    # data/speech_to_speech_dataset.py:108-109,160-167).
    image_input_size: int = 224
    image_mean: List[float] = field(default_factory=list)
    image_std: List[float] = field(default_factory=list)
    # Overrides for the extractor graph (ViTConfig / CLIPVisionConfig
    # fields, e.g. {embed_dim: 192, depth: 12}); empty ⇒ published
    # defaults. The reference sizes its graph from the checkpoint dir
    # (timm/transformers from_pretrained); here the graph is explicit.
    visual_extractor_args: Dict[str, Any] = field(default_factory=dict)
    # AV-HuBERT-style modality dropout: probability of dropping one modality;
    # given a drop, probability the *audio* stream is the one zeroed.
    # Negative value disables (reference yaml comments, sign<0 convention).
    modality_dropout: float = -0.5
    audio_dropout: float = -0.5
    # Fusion op selection + sigmoid gate.
    multimodal_attention_type_choices: List[Any] = field(
        default_factory=lambda: list(MULTIMODAL_ATTENTION_TYPE_CHOICES)
    )
    multimodal_attention_type: Optional[str] = "multimodal_attention"
    use_selective_gate: bool = True
    is_merge_text_img: bool = False
    # Image-only ablation (read unconditionally by the reference model at
    # mm_s2s_transformer.py:107 although absent from the shipped yaml — here
    # it is a first-class default=False field, fixing that gap).
    only_img: bool = False
    # Q-Former bottleneck between speech and image streams (reference
    # multimodal_extractor_type, mm_s2s_transformer.py:197-211).
    multimodal_extractor_type: Optional[str] = None  # None | "q_former"
    num_queries: int = 32
    num_query_layers: int = 4
    num_multimodal_layers: int = 2
    self_attention_first: bool = False
    # In-layer fusion depth (wav2vec2_multimodal branch,
    # mm_s2s_transformer.py:246-258).
    num_cross_attention_layers: int = 1
    # External multimodal transformer depth (fuse.py:288-357 use).
    external_multimodal_transformer_layers: int = 6

    def validate(self) -> "MultimodalConfig":
        # The *_choices lists mirror the reference yaml (they let an
        # enriched yaml narrow the legal set); entries the framework has
        # no implementation for are rejected regardless.
        attn_choices = [
            c for c in self.multimodal_attention_type_choices
            if c in MULTIMODAL_ATTENTION_TYPE_CHOICES
        ] or list(MULTIMODAL_ATTENTION_TYPE_CHOICES)
        vis_choices = [
            c for c in self.visual_extractor_type_choices
            if c in VISUAL_EXTRACTOR_TYPE_CHOICES
        ] or list(VISUAL_EXTRACTOR_TYPE_CHOICES)
        if self.multimodal_attention_type not in attn_choices:
            raise ValueError(
                f"multimodal_attention_type={self.multimodal_attention_type!r} "
                f"not in {attn_choices}"
            )
        if self.load_visual_extractor_type not in vis_choices:
            raise ValueError(
                f"load_visual_extractor_type={self.load_visual_extractor_type!r} "
                f"not in {vis_choices}"
            )
        if self.image_feat_path and len(self.image_feat_path) != len(self.image_feat_dim):
            raise ValueError("image_feat_path and image_feat_dim must align 1:1")
        return self


# ---------------------------------------------------------------------------
# Data config — the fairseq data-config yaml surface
# (reference config/xm_transformer.yaml:1-7) plus S2S dataset knobs
# (reference tasks/speech_to_speech.py:47-81).
# ---------------------------------------------------------------------------


@dataclass
class MultitaskTaskConfig:
    """One auxiliary task head (reference --multitask-config-yaml surface,
    SURVEY.md F9: per-task CTC or transformer-decoder heads with weighted
    losses; reference models/mm_xm_transformer.py:299-318)."""

    task_name: str = "aux"
    decoder_type: str = "ctc"  # "ctc" | "transformer"
    loss_weight: float = 1.0
    vocab_size: int = 0  # 0 ⇒ main target vocabulary
    label_smoothing: float = 0.0
    decoder_layers: int = 2
    decoder_embed_dim: int = 256
    decoder_attention_heads: int = 4


def load_multitask_yaml(path: "str | Path") -> List[MultitaskTaskConfig]:
    """Reference multitask yaml: {task_name: {decoder_type, loss_weight,
    ...}} mapping → list of task configs."""
    raw = load_yaml(path)
    tasks = []
    for name, body in (raw or {}).items():
        body = dict(body or {})
        body.pop("dict", None), body.pop("data", None)  # data-side keys
        known = {f.name for f in dataclasses.fields(MultitaskTaskConfig)}
        kwargs = {k: v for k, v in body.items() if k in known}
        tasks.append(MultitaskTaskConfig(task_name=name, **kwargs))
    return tasks


@dataclass
class NoiseConfig:
    """On-the-fly noise augmentation (reference --noise-config-yaml,
    tasks/speech_to_speech.py:76-81; mixing math data/audio_utils.py:161-233)."""

    noise_wav_dir: str = ""
    noise_prob: float = 0.0
    noise_snr_low: float = 5.0
    noise_snr_high: float = 20.0


@dataclass
class DataConfig:
    data_root: str = ""
    audio_root: str = ""
    standardize_audio: bool = False
    use_audio_input: bool = True  # raw waveform in, else precomputed fbank
    vocab_filename: str = "dict.txt"
    # S2S path: prev_output_tokens starts with the target lang tag
    # (reference prepend_tgt_lang_tag_as_bos,
    # data/speech_to_speech_dataset.py:280-283,455-459).
    prepend_tgt_lang_tag_as_bos: bool = False
    # S2T/xm path: target = <bos> … <eos> <lang:tgt>; generation starts
    # from and stops on the lang tag (reference config/xm_transformer.yaml:5-7
    # + fairseq SpeechToTextDataset/SpeechToTextTask semantics).
    prepend_bos_and_append_tgt_lang_tag: bool = False
    tgt_lang: str = ""
    # Generation stop symbol override (e.g. "<lang:en>"); consumed by
    # cli/generate — the hypothesis starts from and ends at this symbol,
    # and lang tags are stripped from T-/H-/D- output text.
    eos_token: str = ""
    # Fbank frontend (kaldi-compatible; reference data/audio_utils.py:326-349).
    num_mel_bins: int = 80
    sample_rate: int = 16000
    # Optional per-utterance target speaker embeddings: TSV with columns
    # (id, speaker_embed) mapping ids to .npy files (reference
    # cfg.target_speaker_embed, data/speech_to_speech_dataset.py:137-144).
    target_speaker_embed: str = ""
    # Target side.
    target_is_code: bool = True
    target_code_size: int = 1000
    n_frames_per_step: int = 1
    # S2T (enhanced path) raw-transcript tokenization, fairseq
    # S2TDataConfig surface (reference tasks/speech_to_text.py:48-49):
    # pre_tokenizer: {tokenizer: none|space}; bpe_tokenizer:
    # {bpe: sentencepiece, sentencepiece_model: <path>}. Empty ⇒ targets
    # are pre-tokenized offline.
    pre_tokenizer: Dict[str, Any] = field(default_factory=dict)
    bpe_tokenizer: Dict[str, Any] = field(default_factory=dict)
    # Batching (reference --max-tokens dynamic batching; here token-bucketed
    # with static padded shapes for XLA).
    max_tokens: int = 8000
    max_source_positions: int = 4000
    max_target_positions: int = 3000
    num_buckets: int = 8
    noise: NoiseConfig = field(default_factory=NoiseConfig)


# ---------------------------------------------------------------------------
# Model (architecture) config.
# Defaults mirror the fairseq `s2ut_transformer` arch the reference registers
# its mm variant over (reference models/mm_s2s_transformer.py:703-710).
# ---------------------------------------------------------------------------


@dataclass
class ModelConfig:
    arch: str = "mm_s2ut_transformer"
    # Encoder (conv-subsample speech transformer, F7).
    conv_kernel_sizes: List[int] = field(default_factory=lambda: [5, 5])
    conv_channels: int = 1024
    input_feat_per_channel: int = 80
    input_channels: int = 1
    encoder_embed_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_layers: int = 12
    encoder_attention_heads: int = 8
    encoder_normalize_before: bool = True
    # Decoder (unit decoder, F8).
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    decoder_normalize_before: bool = True
    share_decoder_input_output_embed: bool = True
    # Common.
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation_fn: str = "relu"
    layernorm_eps: float = 1e-5
    max_source_positions: int = 6000
    max_target_positions: int = 3000
    # Speech-encoder branch selection (reference mm_s2s_transformer.py:378-462):
    # "conv_transformer" | "hubert" | "wav2vec2" | "wav2vec2_multimodal"
    speech_encoder_type: str = "conv_transformer"
    # wav2vec2/mHuBERT encoder dims for the in-graph speech branches and
    # the XM model. The reference reads these from the w2v_path
    # checkpoint's saved args (mm_s2s_transformer.py:408-430); here they
    # are explicit yaml keys overriding Wav2Vec2Config field defaults
    # (empty ⇒ base-model dims).
    w2v_args: Dict[str, Any] = field(default_factory=dict)
    # Speaker embedding (optional).
    speaker_embed_dim: int = 0
    # Units.
    vocab_size: int = 1010  # 4 specials + 1000 units + lang tags padding
    n_frames_per_step: int = 1
    # Auxiliary CTC head on the encoder (multitask, F9).
    ctc_weight: float = 0.0
    # Compute dtype for the forward pass (bf16 on TPU, F3).
    dtype: str = "bfloat16"
    # Fused Pallas attention in the encoder (train and eval; attention
    # dropout runs in-kernel via a counter-based hash mask that the
    # backward recompute regenerates bit-identically).
    use_flash_attention: bool = True
    # Per-layer activation rematerialization in the encoder (reference
    # --checkpoint-activations → jax.checkpoint).
    checkpoint_activations: bool = False
    # Opt-in sequence parallelism: encoder activations annotated
    # P(data, model, None) between layers (needs a jax.set_mesh context;
    # no-op otherwise). Beyond-reference capability (SURVEY §2.3).
    sequence_parallel: bool = False
    # Streaming-compatible encoder: position-causal self-attention with an
    # optional bounded left context. Train with these on, then serve
    # incrementally via infer/streaming.py (states are bit-equal to the
    # offline forward). Beyond-reference capability (low-latency S2ST).
    encoder_causal_attention: bool = False
    encoder_attention_window: int = 0
    # Opt-in pipeline parallelism: >1 runs the encoder transformer stack
    # as a GPipe over the mesh's `pipe` axis (parallel/pipeline.py).
    # Beyond-reference capability (SURVEY §2.3).
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0  # 0 ⇒ defaults to pipeline_stages
    # Auxiliary multitask heads (F9).
    multitask: List[MultitaskTaskConfig] = field(default_factory=list)
    # Multimodal fusion block.
    multimodal: MultimodalConfig = field(default_factory=MultimodalConfig)


# ---------------------------------------------------------------------------
# Train / optimization config (F1/F2).
# Defaults mirror reference scripts/textless/1_train.sh:105-125.
# ---------------------------------------------------------------------------


@dataclass
class TrainConfig:
    lr: float = 5e-4
    warmup_updates: int = 10000
    warmup_init_lr: float = 1e-7
    lr_scheduler: str = "inverse_sqrt"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    clip_norm: float = 10.0
    update_freq: int = 1
    max_update: int = 400000
    label_smoothing: float = 0.2
    rdrop_alpha: float = 0.0
    seed: int = 1
    save_dir: str = "checkpoints"
    save_interval_updates: int = 1000
    keep_last_checkpoints: int = 5
    log_interval: int = 100
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    # Modality freeze schedule (reference --freezing-updates).
    freezing_updates: int = 0
    # Eval-time inference metrics (fairseq --eval-inference surface used by
    # the reference task, tasks/speech_to_speech.py:25 + criterion reduce
    # :105-117): run generator + vocoder on valid batches, report MCD stats.
    eval_inference: bool = False
    eval_vocoder_path: str = ""
    eval_vocoder_cfg: str = ""
    # Rematerialisation policy for memory (reference --checkpoint-activations).
    checkpoint_activations: bool = False


@dataclass
class GenerationConfig:
    beam: int = 10
    max_len_a: float = 1.0
    max_len_b: int = 200
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    max_tokens: int = 8000
    # n-best to emit into generate-*.txt (reference emits top-1 H/D lines).
    nbest: int = 1
    # Decode KV-cache storage: "bfloat16" (exact), "int8" (per-column
    # symmetric quantization of BOTH the growing self-attention cache and
    # the static per-layer encoder cross K/V slab; halves the decode
    # kernels' HBM reads — the dominant decode cost), or "int4" (self-
    # attention cache nibble-packed two columns per byte on top of the
    # int8 cross slab; quarters the dominant read — the decode kernel is
    # DMA-bound, so bytes ≈ time).
    kv_cache_dtype: str = "bfloat16"


@dataclass
class MeshConfig:
    """Device-mesh layout (SURVEY.md §5.8). DP is the parity requirement;
    the model axis is first-class so TP can be enabled without restructuring."""

    data: int = -1  # -1 ⇒ all devices on the data axis
    model: int = 1
    pipe: int = 1


@dataclass
class Config:
    task: str = "multimodal_speech_to_speech"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


# ---------------------------------------------------------------------------
# Construction helpers.
# ---------------------------------------------------------------------------


def _build(cls, data: Any):
    if data is None:
        return cls()
    if dataclasses.is_dataclass(cls):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        unknown = {}
        for key, value in dict(data).items():
            if key in fields:
                ftype = fields[key].type
                fdefault = fields[key].default_factory() if fields[key].default_factory is not dataclasses.MISSING else fields[key].default  # type: ignore[misc]
                if dataclasses.is_dataclass(fdefault):
                    kwargs[key] = _build(type(fdefault), value)
                else:
                    kwargs[key] = value
            else:
                unknown[key] = value
        obj = cls(**kwargs)
        if unknown:
            # Unknown keys are kept (forward compatibility with enriched
            # yamls copied beside the data — reference textless/1_train.sh:86-88).
            object.__setattr__(obj, "_extra", unknown)
        return obj
    return data


def load_yaml(path: str | Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_multimodal_yaml(path: str | Path) -> MultimodalConfig:
    """Load a reference-format ``multimodal_s2ut_transformer.yaml``."""
    return _build(MultimodalConfig, load_yaml(path)).validate()


def load_data_yaml(path: str | Path) -> DataConfig:
    """Load a reference-format data config yaml (xm_transformer.yaml surface)."""
    return _build(DataConfig, load_yaml(path))


def load_config(path: str | Path) -> Config:
    """Load a full framework config (nested task/model/data/train yaml)."""
    cfg = _build(Config, load_yaml(path))
    cfg.model.multitask = [
        t if isinstance(t, MultitaskTaskConfig) else MultitaskTaskConfig(**t)
        for t in cfg.model.multitask
    ]
    # The encoder's input width is the fbank frontend's output width; a
    # mismatched input_feat_per_channel would silently change the model
    # the yaml describes (fairseq sizes the conv subsampler from this key).
    want = cfg.model.input_feat_per_channel * cfg.model.input_channels
    if want != cfg.data.num_mel_bins:
        raise ValueError(
            f"model.input_feat_per_channel×input_channels = {want} must equal "
            f"data.num_mel_bins = {cfg.data.num_mel_bins}"
        )
    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def save_yaml(cfg: Any, path: str | Path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
