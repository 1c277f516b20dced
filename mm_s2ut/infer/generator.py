"""High-level sequence generator: encode → beam search → hypotheses.

Replaces the fairseq-generate driver layer (SURVEY.md §3.2): batches go
through the jitted encoder once, the decoder state is tiled per beam, and
the whole search runs on device. Output formatting mirrors the reference's
generate-*.txt artifact chain (H-/D-/T- lines parsed by
scripts/3_generate_waveform.sh:24-26) for drop-in eval compatibility.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut.config import GenerationConfig
from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams, trim_hypothesis


class UnitGenerator:
    """Beam-search generator over an MMS2UTModel.

    ``params`` may be one pytree or a sequence of pytrees: a sequence
    runs LOGIT-ENSEMBLE decoding — each model keeps its own decode
    cache, and per-step next-token scores are the log of the mean
    probability across models (fairseq EnsembleModel.forward_decoder
    semantics; the reference loads ensembles via
    checkpoint_utils.load_model_ensemble_and_task,
    mm_s2s_transformer.py:229)."""

    def __init__(
        self,
        model,
        params,
        gen_cfg: GenerationConfig = GenerationConfig(),
        eos_id: int = 2,
        bos_id: int = 2,
        pad_id: int = 1,
        unk_id: int = 3,
        max_target_positions: int = 3000,
    ):
        self.model = model
        is_ensemble = isinstance(params, (list, tuple))
        self.params_list = tuple(params) if is_ensemble else (params,)
        self.params = self.params_list[0]
        self.cfg = gen_cfg
        self.eos_id, self.bos_id, self.pad_id, self.unk_id = eos_id, bos_id, pad_id, unk_id
        self.max_target_positions = max_target_positions
        self.vocab_size = model.cfg.vocab_size

        self._encode = jax.jit(
            lambda params, feats, lengths, imgs, img_masks: model.apply(
                params, feats, lengths, imgs, img_masks, None,
                deterministic=True, method=model.encode,
            )
        )

        # ONE jitted decode-init + search closure per generator: beam_search
        # keys its jit cache on the decode_step callable, so building a
        # fresh lambda per generate() call would retrace the whole search
        # every batch. Bound here, the program caches per (shapes, max_len).
        def _search(params_list, encs, max_len):
            states = tuple(
                tile_state_for_beams(
                    self.model.apply(
                        p, enc, max_len + 1, method=self.model.decode_init,
                        kv_dtype=getattr(self.cfg, "kv_cache_dtype", None),
                    ),
                    self.cfg.beam,
                )
                for p, enc in zip(params_list, encs)
            )

            def step(tokens, sts):
                outs = [
                    self.model.apply(p, tokens, st, method=self.model.decode_step)
                    for p, st in zip(params_list, sts)
                ]
                new_sts = tuple(st for _, st in outs)
                if len(outs) == 1:
                    return outs[0][0], new_sts
                # log(mean_i softmax(logits_i)) — normalized, so the
                # search's own log_softmax is a numerical no-op on it.
                logps = jnp.stack([
                    jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
                    for l, _ in outs
                ])
                avg = jax.nn.logsumexp(logps, axis=0) - jnp.log(float(len(outs)))
                return avg, new_sts

            return beam_search(
                step,
                states,
                encs[0]["encoder_out"].shape[0],
                beam_size=self.cfg.beam,
                max_len=max_len,
                eos_id=self.eos_id,
                bos_id=self.bos_id,
                pad_id=self.pad_id,
                vocab_size=self.vocab_size,
                len_penalty=self.cfg.len_penalty,
                unk_penalty=self.cfg.unk_penalty,
                unk_id=self.unk_id,
            )

        self._search = jax.jit(_search, static_argnames=("max_len",))

    def _max_len(self, src_frames: int) -> int:
        # Budget counts encoder positions: raw-audio models (XM) expose
        # their conv downsampling so max_len_a·src stays in the regime the
        # reference tuned it for (fbank frames / text positions), instead
        # of sample counts that always clamp to max_target_positions.
        ratio = getattr(self.model, "source_downsample_ratio", 1)
        src_positions = -(-src_frames // ratio)
        return int(
            min(
                self.cfg.max_len_a * src_positions + self.cfg.max_len_b,
                self.max_target_positions - 1,
            )
        )

    def generate(
        self,
        src_features: np.ndarray,  # (B, T, F)
        src_lengths: np.ndarray,  # (B,)
        imgs_list: Sequence[np.ndarray] = (),
        img_masks_list: Sequence[np.ndarray] = (),
    ) -> List[List[Dict[str, Any]]]:
        """Returns, per example, a list of ``beam`` hypotheses sorted by
        score: {"tokens": List[int], "score": float}."""
        B = src_features.shape[0]
        K = self.cfg.beam
        for img in imgs_list:
            if img.shape[0] != B:
                raise ValueError(
                    f"image batch {img.shape[0]} != audio batch {B}"
                )
        encs = tuple(
            self._encode(
                p, jnp.asarray(src_features), jnp.asarray(src_lengths),
                tuple(jnp.asarray(x) for x in imgs_list),
                tuple(jnp.asarray(x) for x in img_masks_list),
            )
            for p in self.params_list
        )
        max_len = self._max_len(int(src_features.shape[1]))
        seqs, scores = self._search(self.params_list, encs, max_len)
        seqs = np.asarray(seqs)
        scores = np.asarray(scores)
        results = []
        for b in range(B):
            hyps = [
                {
                    "tokens": trim_hypothesis(seqs[b, k], self.eos_id, self.pad_id),
                    "score": float(scores[b, k]),
                }
                for k in range(K)
            ]
            results.append(hyps)
        return results


def format_generation_output(
    sample_ids: Sequence[int],
    hypos: Sequence[Sequence[Dict[str, Any]]],
    dictionary,
    targets: Optional[Sequence[Sequence[int]]] = None,
    nbest: int = 1,
    strip_ids: Sequence[int] = (),
) -> List[str]:
    """Emit fairseq-generate-format lines (T-/H-/D-) so the reference's
    downstream unit-extraction pipeline (grep "^D-" | sort -nk1 | cut -f3,
    scripts/3_generate_waveform.sh:24-26) works unchanged. H- carries raw
    symbols, D- the detokenized/cleaned string — identical for units.
    ``strip_ids``: extra symbol ids removed from all lines (fairseq
    symbols_to_strip_from_output — lang tags on the xm path)."""
    strip = set(int(s) for s in strip_ids)

    def to_str(tokens) -> str:
        if strip:
            tokens = [t for t in tokens if int(t) not in strip]
        return dictionary.string(tokens)

    lines: List[str] = []
    for i, sid in enumerate(sample_ids):
        if targets is not None:
            lines.append(f"T-{sid}\t{to_str(targets[i])}")
        for hyp in hypos[i][:nbest]:
            text = to_str(hyp["tokens"])
            lines.append(f"H-{sid}\t{hyp['score']:.4f}\t{text}")
            lines.append(f"D-{sid}\t{hyp['score']:.4f}\t{text}")
    return lines
