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
    """Beam-search generator over an MMS2UTModel."""

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
        self.params = params
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
        def _search(params, enc, max_len):
            state = self.model.apply(
                params, enc, max_len + 1, method=self.model.decode_init,
                kv_dtype=getattr(self.cfg, "kv_cache_dtype", None),
            )
            state = tile_state_for_beams(state, self.cfg.beam)
            return beam_search(
                lambda t, s: self.model.apply(
                    params, t, s, method=self.model.decode_step
                ),
                state,
                enc["encoder_out"].shape[0],
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
        return int(
            min(
                self.cfg.max_len_a * src_frames + self.cfg.max_len_b,
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
        enc = self._encode(
            self.params, jnp.asarray(src_features), jnp.asarray(src_lengths),
            tuple(jnp.asarray(x) for x in imgs_list),
            tuple(jnp.asarray(x) for x in img_masks_list),
        )
        max_len = self._max_len(int(src_features.shape[1]))
        seqs, scores = self._search(self.params, enc, max_len)
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
