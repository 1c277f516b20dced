"""Flagship model: multimodal speech-to-unit transformer (``mm_s2ut_transformer``).

TPU-native re-design of the reference MM_S2UTTransformerModel /
MM_S2STransformerEncoder (SURVEY.md C8; reference
models/mm_s2s_transformer.py:87-710): a speech encoder branch, optional
target-speaker conditioning, top fusion of one or more image-feature
sources via selective/multimodal attention with a sigmoid gate, AV-HuBERT
style modality dropout, the ``only_img`` ablation, and an autoregressive
unit decoder.

Everything runs as one jitted program. Train-time stochasticity (modality
dropout) draws from a named PRNG stream ("modality") instead of host
numpy (reference mm_s2s_transformer.py:497), preserving the batch-level
draw distribution (SURVEY.md §7 hard part 6).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut import registry
from mm_s2ut.config import ModelConfig
from mm_s2ut.models.decoder import CTCHead, UnitDecoder
from mm_s2ut.models.fusion import (
    BridgeTowerEncoder,
    ExternalMultimodalEncoder,
    FusionBlock,
    QFormer,
    modality_dropout,
)
from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder
from mm_s2ut.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    Wav2Vec2WithMultiModal,
)

Dtype = Any


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


@registry.register_model("mm_s2ut_transformer")
class MMS2UTModel(nn.Module):
    """forward(batch) → {"logits", "encoder_padding_mask", ...}.

    Batch keys (net_input parity with reference
    models/mm_s2s_transformer.py:667-700):
      src_features (B,T,F), src_lengths (B,),
      prev_output_tokens (B,Tt),
      imgs_list: tuple of (B,Ti,Di), img_masks_list: tuple of (B,Ti) True=pad,
      tgt_speaker: (B,spk) optional.
    """

    cfg: ModelConfig
    # wav2vec2/HuBERT branch config (speech_encoder_type != conv_transformer;
    # reference loads these from --mhubert-ckpt-path / --wav2vec2-model-dir,
    # mm_s2s_transformer.py:228-258 — here weights arrive via
    # wav2vec2.convert_hf_state_dict into this submodule's params).
    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    # On-line visual-extractor graph config (multimodal.load_visual_-
    # extractor_type; reference build_visual_extractor,
    # mm_s2s_transformer.py:272-290). None ⇒ the type's published default
    # (ViT-B/16-384 for vit_timm/vit_huggingface, CLIP ViT-B/32 for
    # vit_openai); weights arrive via vit.convert_timm_state_dict /
    # convert_clip_state_dict into this submodule's params.
    vit_cfg: Any = None

    @property
    def source_downsample_ratio(self) -> int:
        """Input positions per pre-subsample encoder frame: 1 for the
        fbank/conv branch (generation budgets count fbank frames, the
        reference convention), the conv-stack stride product (~320
        samples/frame) for raw-waveform wav2vec2/mHuBERT branches —
        keeps max_len_a·src in the regime fairseq tuned it for
        (UnitGenerator._max_len)."""
        if self.cfg.speech_encoder_type == "conv_transformer":
            return 1
        r = 1
        for s in self.w2v_cfg.conv_stride:
            r *= s
        return r

    def setup(self):
        cfg, mm = self.cfg, self.cfg.multimodal
        dtype = _dtype(cfg)
        if mm.load_visual_extractor_type:
            from mm_s2ut.models.vit import (
                CLIPVisionConfig,
                CLIPVisionTransformer,
                ViTConfig,
                VisionTransformer,
            )

            if mm.load_visual_extractor_type == "vit_openai":
                self.visual_extractor = CLIPVisionTransformer(
                    self.vit_cfg or CLIPVisionConfig(), dtype=dtype,
                )
            else:  # vit_timm / vit_huggingface share the timm ViT graph
                self.visual_extractor = VisionTransformer(
                    self.vit_cfg or ViTConfig(), dtype=dtype,
                )
        if cfg.speech_encoder_type == "wav2vec2_multimodal":
            # In-layer fusion variant (reference Wav2Vec2WithMultiModal,
            # fuse.py:450-766): cross-attention to image feats inside the
            # top encoder layers.
            self.speech_encoder = Wav2Vec2WithMultiModal(
                self.w2v_cfg,
                m2_dim=mm.image_feat_dim[0] if mm.image_feat_dim else 768,
                num_cross_attention_layers=getattr(mm, "num_cross_attention_layers", 1),
                dtype=dtype,
            )
        elif cfg.speech_encoder_type in ("hubert", "wav2vec2"):
            self.speech_encoder = Wav2Vec2Model(self.w2v_cfg, dtype=dtype)
        if cfg.speech_encoder_type != "conv_transformer":
            if self.w2v_cfg.hidden_size != cfg.encoder_embed_dim:
                # The reference keeps 768/1024→512 projections around
                # (mm_s2s_transformer.py:212-216).
                self.speech_proj = nn.Dense(cfg.encoder_embed_dim, dtype=dtype)
        self.encoder = SpeechTransformerEncoder(
            embed_dim=cfg.encoder_embed_dim,
            ffn_dim=cfg.encoder_ffn_embed_dim,
            num_layers=cfg.encoder_layers,
            num_heads=cfg.encoder_attention_heads,
            conv_channels=cfg.conv_channels,
            conv_kernel_sizes=tuple(cfg.conv_kernel_sizes),
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.encoder_normalize_before,
            max_positions=cfg.max_source_positions,
            use_flash=cfg.use_flash_attention,
            remat=cfg.checkpoint_activations,
            sequence_parallel=cfg.sequence_parallel,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
            causal_attention=cfg.encoder_causal_attention,
            attention_window=cfg.encoder_attention_window,
            dtype=dtype,
        )
        if cfg.speaker_embed_dim:
            self.spk_emb_proj = nn.Dense(cfg.encoder_embed_dim, dtype=dtype)
        if mm.multimodal_attention_type in ("selective_attention", "multimodal_attention"):
            self.fusion_blocks = [
                FusionBlock(
                    embed_dim=cfg.encoder_embed_dim,
                    image_dim=dim,
                    attention_type=mm.multimodal_attention_type,
                    use_selective_gate=mm.use_selective_gate,
                    is_merge_text_img=mm.is_merge_text_img,
                    image_pre_norm=mm.image_pre_norm,
                    image_dropout=mm.SA_image_dropout,
                    text_dropout=mm.SA_text_dropout,
                    attention_dropout=mm.SA_attention_dropout,
                    dtype=dtype,
                    name=f"fusion{i}",
                )
                for i, dim in enumerate(mm.image_feat_dim)
            ]
        elif mm.multimodal_attention_type == "bridge_tower":
            # Bidirectional co-attention tower (reference
            # BridgeTowerTransformerEncoder, fuse.py:360-447 — defined but
            # unreachable in the reference's shipped configs; here wired as
            # a first-class multimodal_attention_type). Consumes per-layer
            # speech states like the external tower; the fused SPEECH
            # stream (f1) replaces the encoder output.
            n_layers = mm.external_multimodal_transformer_layers
            self.bridge_towers = [
                BridgeTowerEncoder(
                    embed_dim=cfg.encoder_embed_dim,
                    num_heads=max(cfg.encoder_embed_dim // 64, 1),
                    ffn_dim=cfg.encoder_embed_dim * 4,
                    num_layers=n_layers,
                    dropout=mm.SA_attention_dropout,
                    dtype=dtype,
                    name=f"bridge_tower{i}",
                )
                for i, _ in enumerate(mm.image_feat_dim)
            ]
            self.bridge_img_projs = [
                nn.Dense(cfg.encoder_embed_dim, dtype=dtype, name=f"bridge_img_proj{i}")
                for i, _ in enumerate(mm.image_feat_dim)
            ]
            self.fusion_blocks = []
        elif mm.multimodal_attention_type == "external_multimodal_transformer":
            # Per-layer speech-state fusion tower (reference
            # multimodal_attention_type external_multimodal_transformer,
            # mm_s2s_transformer.py:157-172, fuse.py:288-357). One tower per
            # image source; image features are projected to the encoder
            # width (the reference requires matching dims).
            n_layers = mm.external_multimodal_transformer_layers
            self.external_towers = [
                ExternalMultimodalEncoder(
                    embed_dim=cfg.encoder_embed_dim,
                    num_heads=max(cfg.encoder_embed_dim // 64, 1),
                    ffn_dim=cfg.encoder_embed_dim * 4,
                    num_layers=n_layers,
                    dropout=mm.SA_attention_dropout,
                    dtype=dtype,
                    name=f"external_tower{i}",
                )
                for i, _ in enumerate(mm.image_feat_dim)
            ]
            self.external_img_projs = [
                nn.Dense(cfg.encoder_embed_dim, dtype=dtype, name=f"external_img_proj{i}")
                for i, _ in enumerate(mm.image_feat_dim)
            ]
            self.fusion_blocks = []
        else:
            self.fusion_blocks = []
        if mm.multimodal_extractor_type == "q_former":
            img_dim = mm.image_feat_dim[0] if mm.image_feat_dim else 768
            self.q_former = QFormer(
                embed_dim=img_dim,
                num_heads=max(img_dim // 64, 1),
                ffn_dim=img_dim * 4,
                num_queries=mm.num_queries,
                num_query_layers=mm.num_query_layers,
                num_multimodal_layers=mm.num_multimodal_layers,
                dropout=mm.SA_attention_dropout,
                self_attention_first=mm.self_attention_first,
                dtype=dtype,
            )
            if img_dim != cfg.encoder_embed_dim:
                self.q_former_speech_proj = nn.Dense(img_dim, dtype=dtype)
        # only_img ablation: image features stand in for the encoder output;
        # project to model width when dims differ (the reference feeds the raw
        # image dim and relies on matching dims — mm_s2s_transformer.py:515-523).
        if mm.only_img and mm.image_feat_dim and mm.image_feat_dim[0] != cfg.encoder_embed_dim:
            self.only_img_proj = nn.Dense(cfg.encoder_embed_dim, dtype=dtype)
        self.decoder = UnitDecoder(
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim,
            num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            n_frames_per_step=cfg.n_frames_per_step,
            max_positions=cfg.max_target_positions,
            dtype=dtype,
        )
        if cfg.ctc_weight > 0:
            self.ctc_head = CTCHead(cfg.vocab_size, dtype=dtype)
        # Auxiliary multitask heads (F9): per-task CTC projection or a
        # small transformer decoder over encoder states.
        self.multitask_heads = {}
        mt_heads = {}
        for t in cfg.multitask:
            vocab = t.vocab_size or cfg.vocab_size
            if t.decoder_type == "ctc":
                mt_heads[t.task_name] = CTCHead(
                    vocab, dtype=dtype, name=f"mt_{t.task_name}"
                )
            else:
                mt_heads[t.task_name] = UnitDecoder(
                    vocab_size=vocab,
                    embed_dim=t.decoder_embed_dim,
                    ffn_dim=t.decoder_embed_dim * 4,
                    num_layers=t.decoder_layers,
                    num_heads=t.decoder_attention_heads,
                    dropout=cfg.dropout,
                    attention_dropout=cfg.attention_dropout,
                    max_positions=cfg.max_target_positions,
                    dtype=dtype,
                    name=f"mt_{t.task_name}",
                )
                if t.decoder_embed_dim != cfg.encoder_embed_dim:
                    mt_heads[f"{t.task_name}_proj"] = nn.Dense(
                        t.decoder_embed_dim, dtype=dtype,
                        name=f"mt_{t.task_name}_proj",
                    )
        self.multitask_heads = mt_heads

    # -- encoder side --------------------------------------------------------

    def encode(
        self,
        src_features: jnp.ndarray,
        src_lengths: jnp.ndarray,
        imgs_list: Sequence[jnp.ndarray] = (),
        img_masks_list: Sequence[Optional[jnp.ndarray]] = (),
        tgt_speaker: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg, mm = self.cfg, self.cfg.multimodal
        imgs_list = list(imgs_list)
        img_masks_list = list(img_masks_list) or [None] * len(imgs_list)

        if hasattr(self, "visual_extractor") and imgs_list and imgs_list[0].ndim == 4:
            # On-line extraction from raw (B, S, S, 3) pixels (reference
            # forward_visual_extractor + `imgs_list[0] = img_feat_list[-1]`,
            # mm_s2s_transformer.py:292-306,475-478): the LAST hidden state
            # replaces the first image source; no key padding (mask zeros).
            vout = self.visual_extractor(imgs_list[0].astype(_dtype(cfg)))
            feats = vout[-1] if isinstance(vout, list) else vout[0]
            imgs_list[0] = feats
            img_masks_list[0] = jnp.zeros(feats.shape[:2], bool)

        if mm.only_img:
            # Reference parity: the ablation replaces the encoder output with
            # the FIRST image source and stops — the reference's source loop
            # does `out["encoder_out"] = [img]; ...; break` on the first
            # iteration (mm_s2s_transformer.py:513-523), so later sources are
            # never consulted.
            img = imgs_list[0].astype(_dtype(cfg))
            if hasattr(self, "only_img_proj"):
                img = self.only_img_proj(img)
            mask = img_masks_list[0]
            if mask is None:
                mask = jnp.zeros(img.shape[:2], bool)
            return {"encoder_out": img, "encoder_padding_mask": mask, "encoder_states": []}

        in_layer_fusion = cfg.speech_encoder_type == "wav2vec2_multimodal"
        if in_layer_fusion:
            # src_features is the raw waveform for wav2vec2 branches
            # (reference forward_wav2vec2_multimodal, :308-376).
            w2v = self.speech_encoder(
                src_features, src_lengths,
                imgs_list[0] if imgs_list else jnp.zeros(
                    (src_features.shape[0], 1, mm.image_feat_dim[0]), _dtype(cfg)
                ),
                img_masks_list[0] if img_masks_list else None,
                apply_mask=not deterministic,
                deterministic=deterministic,
            )
            x = w2v["last_hidden_state"]
            if hasattr(self, "speech_proj"):
                x = self.speech_proj(x)
            out = {"encoder_out": x, "encoder_padding_mask": w2v["padding_mask"],
                   "encoder_states": w2v["hidden_states"]}
            padding_mask = w2v["padding_mask"]
        elif cfg.speech_encoder_type in ("hubert", "wav2vec2"):
            # Frozen-then-finetuned pretrained branch (reference mhubert /
            # HF wav2vec2 forward, :408-462): masking only at train time.
            w2v = self.speech_encoder(
                src_features, src_lengths,
                apply_mask=not deterministic, deterministic=deterministic,
            )
            x = w2v["last_hidden_state"]
            if hasattr(self, "speech_proj"):
                x = self.speech_proj(x)
            out = {"encoder_out": x, "encoder_padding_mask": w2v["padding_mask"],
                   "encoder_states": w2v["hidden_states"]}
            padding_mask = w2v["padding_mask"]
        else:
            need_states = (
                hasattr(self, "external_towers")
                or hasattr(self, "bridge_towers")
                or (bool(self.fusion_blocks) and not mm.is_fusion_top)
            )
            out = self.encoder(
                src_features, src_lengths, deterministic=deterministic,
                return_all_states=need_states,
            )
            x = out["encoder_out"]
            padding_mask = out["encoder_padding_mask"]

        if cfg.speaker_embed_dim and tgt_speaker is not None:
            spk = jnp.broadcast_to(
                tgt_speaker[:, None, :].astype(x.dtype),
                (*x.shape[:2], tgt_speaker.shape[-1]),
            )
            x = self.spk_emb_proj(jnp.concatenate([x, spk], axis=-1))

        if mm.multimodal_extractor_type == "q_former" and imgs_list:
            # Bottleneck: learned queries attend to speech then image; the
            # q_former output replaces the image stream (reference
            # mm_s2s_transformer.py:483-497).
            speech_in = x
            if hasattr(self, "q_former_speech_proj"):
                speech_in = self.q_former_speech_proj(speech_in)
            imgs_list[0] = self.q_former(
                speech_in, imgs_list[0].astype(x.dtype),
                m1_key_padding_mask=padding_mask,
                m2_key_padding_mask=img_masks_list[0],
                deterministic=deterministic,
            )
            img_masks_list[0] = jnp.zeros(imgs_list[0].shape[:2], bool)

        def run_towers(x, imgs_list, towers, projs, unpack):
            """Shared external/bridge tower fusion: per-source tower over
            the last n encoder layer states, summed across sources."""
            if not deterministic and mm.modality_dropout > 0:
                x, imgs_list = modality_dropout(
                    self.make_rng("modality"), x, imgs_list,
                    mm.modality_dropout, mm.audio_dropout,
                )
            n_layers = mm.external_multimodal_transformer_layers
            states = out.get("encoder_states") or [x]
            speech_states = (
                states[-n_layers:]
                if len(states) >= n_layers else [states[-1]] * n_layers
            )
            fused = []
            masks = list(img_masks_list) or [None] * len(imgs_list)
            for tower, proj, img, img_mask in zip(towers, projs, imgs_list, masks):
                img_p = proj(img.astype(x.dtype))
                fused.append(unpack(tower(
                    speech_states, [img_p] * n_layers,
                    m1_key_padding_mask=padding_mask,
                    m2_key_padding_mask=img_mask,
                    deterministic=deterministic,
                )))
            x = fused[0]
            for extra in fused[1:]:
                x = x + extra
            return x

        if hasattr(self, "external_towers") and imgs_list:
            x = run_towers(
                x, imgs_list, self.external_towers, self.external_img_projs,
                unpack=lambda r: r,
            )

        if hasattr(self, "bridge_towers") and imgs_list:
            x = run_towers(
                x, imgs_list, self.bridge_towers, self.bridge_img_projs,
                unpack=lambda r: r[0],
            )

        if self.fusion_blocks and mm.is_fusion_top and imgs_list and not in_layer_fusion:
            # Batch-level modality dropout, train only.
            if not deterministic and mm.modality_dropout > 0:
                x, imgs_list = modality_dropout(
                    self.make_rng("modality"), x, imgs_list,
                    mm.modality_dropout, mm.audio_dropout,
                )
            fused = []
            mask = padding_mask
            for block, img, img_mask in zip(self.fusion_blocks, imgs_list, img_masks_list):
                res, mask = block(
                    x, padding_mask, img.astype(x.dtype), img_mask,
                    deterministic=deterministic,
                )
                fused.append(res)
            # Sum combiner over image sources (reference f(xs,'sum'),
            # mm_s2s_transformer.py:560,564-575).
            x = fused[0]
            for extra in fused[1:]:
                x = x + extra
            padding_mask = mask

        return {
            "encoder_out": x,
            "encoder_padding_mask": padding_mask,
            "encoder_states": out.get("encoder_states", []),
        }

    # -- full forward (training) ----------------------------------------------

    def __call__(
        self,
        src_features: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        imgs_list: Sequence[jnp.ndarray] = (),
        img_masks_list: Sequence[Optional[jnp.ndarray]] = (),
        tgt_speaker: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        multitask_prev_tokens: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, Any]:
        enc = self.encode(
            src_features, src_lengths, imgs_list, img_masks_list,
            tgt_speaker, deterministic=deterministic,
        )
        logits = self.decoder(
            prev_output_tokens,
            enc["encoder_out"],
            enc["encoder_padding_mask"],
            deterministic=deterministic,
        )
        out = {
            "logits": logits,
            "encoder_out": enc["encoder_out"],
            "encoder_padding_mask": enc["encoder_padding_mask"],
        }
        if self.cfg.ctc_weight > 0:
            out["ctc_logits"] = self.ctc_head(enc["encoder_out"])
        if self.cfg.multitask:
            mt_out = {}
            for t in self.cfg.multitask:
                head = self.multitask_heads[t.task_name]
                if t.decoder_type == "ctc":
                    mt_out[t.task_name] = head(enc["encoder_out"])
                else:
                    mem = enc["encoder_out"]
                    proj = self.multitask_heads.get(f"{t.task_name}_proj")
                    if proj is not None:
                        mem = proj(mem)
                    prev = (multitask_prev_tokens or {}).get(t.task_name)
                    if prev is None:
                        continue  # no aux targets in this batch
                    mt_out[t.task_name] = head(
                        prev, mem, enc["encoder_padding_mask"],
                        deterministic=deterministic,
                    )
            out["multitask_logits"] = mt_out
        return out

    # -- incremental decoding (beam search) ------------------------------------

    def decode_init(self, enc: Dict[str, Any], max_len: int, kv_dtype=None):
        return self.decoder.init_state(
            enc["encoder_out"], enc["encoder_padding_mask"], max_len,
            kv_dtype=kv_dtype,
        )

    def decode_step(self, prev_token: jnp.ndarray, state):
        return self.decoder.step(prev_token, state)

    def decode_prefill(self, prefix_tokens, prefix_len, state):
        """Parallel teacher-forced prefill of a tiled beam state (streaming
        prefix-reuse decode; see UnitDecoder.prefill)."""
        return self.decoder.prefill(prefix_tokens, prefix_len, state)

    def serve_step(self, prev_token: jnp.ndarray, state):
        """Continuous-batching decode step (infer/serving.py)."""
        return self.decoder.serve_step(prev_token, state)


@registry.register_model_architecture("mm_s2ut_transformer", "mm_s2ut_transformer")
def mm_s2ut_architecture_base(cfg: ModelConfig) -> ModelConfig:
    """Base hyperparameters (mirrors fairseq s2ut_architecture_base that the
    reference arch registration delegates to — mm_s2s_transformer.py:703-710)."""
    return cfg


@registry.register_model_architecture("mm_s2ut_transformer", "mm_s2ut_transformer_small")
def mm_s2ut_architecture_small(cfg: ModelConfig) -> ModelConfig:
    cfg.encoder_embed_dim = 256
    cfg.encoder_ffn_embed_dim = 1024
    cfg.encoder_layers = 6
    cfg.encoder_attention_heads = 4
    cfg.decoder_embed_dim = 256
    cfg.decoder_ffn_embed_dim = 1024
    cfg.decoder_layers = 3
    cfg.decoder_attention_heads = 4
    return cfg
