"""High-level sequence generator: encode → beam search → hypotheses.

Replaces the fairseq-generate driver layer (SURVEY.md §3.2): batches go
through the jitted encoder once, the decoder state is tiled per beam, and
the whole search runs on device. Output formatting mirrors the reference's
generate-*.txt artifact chain (H-/D-/T- lines parsed by
scripts/3_generate_waveform.sh:24-26) for drop-in eval compatibility.
"""
from __future__ import annotations

import json
import pickle
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
        # (B, T, feat_dim, img_shapes) -> (encode_exec, search_exec):
        # ahead-of-time deserialized executables (aot_load) that generate()
        # prefers over the jitted path when the batch shape matches.
        self._aot: Dict[tuple, tuple] = {}

    # ---- AOT executable serialization (serving cold-start, VERDICT r4 #7).
    #
    # A serving restart otherwise pays ~20 s of tracing + persistent-cache
    # load before the first batch. ``aot_save`` lowers + compiles the two
    # programs behind ``generate`` (encode, decode-init+beam-search) at one
    # concrete operating point and serializes the compiled binaries
    # (jax.experimental.serialize_executable); ``aot_load`` restores them
    # with ZERO tracing or compilation in the loading process. Artifacts
    # are gated on the full generation config + model config + backend, so
    # a generator with a different beam/budget/model never picks one up.

    def _aot_meta(self, B: int, T: int, feat_dim: int,
                  img_shapes: tuple) -> Dict[str, Any]:
        dev = jax.devices()[0]
        return {
            "B": int(B), "T": int(T), "feat_dim": int(feat_dim),
            "img_shapes": [list(map(int, s)) for s in img_shapes],
            "gen_cfg": repr(self.cfg),
            "model_cfg": repr(self.model.cfg),
            "n_models": len(self.params_list),
            "ids": [self.eos_id, self.bos_id, self.pad_id, self.unk_id],
            "max_target_positions": self.max_target_positions,
            "max_len": self._max_len(T),
            "jax": jax.__version__,
            "platform": dev.platform,
            "device_kind": getattr(dev, "device_kind", ""),
        }

    def _aot_avals(self, B: int, T: int, feat_dim: int, img_shapes: tuple):
        feats = jax.ShapeDtypeStruct((B, T, feat_dim), jnp.float32)
        lengths = jax.ShapeDtypeStruct((B,), jnp.int32)
        imgs = tuple(jax.ShapeDtypeStruct((B,) + tuple(int(d) for d in s),
                                          jnp.float32) for s in img_shapes)
        masks = tuple(jax.ShapeDtypeStruct((B, int(s[0])), jnp.bool_)
                      for s in img_shapes)
        return feats, lengths, imgs, masks

    def aot_save(self, path, B: int, T: int, feat_dim: int = 80,
                 img_shapes: Sequence[Sequence[int]] = ()) -> Path:
        """Compile the generate programs for a (B, T[, images]) operating
        point and serialize the executables under ``path``. Returns the
        artifact file. Also installs the executables into this generator."""
        from jax.experimental import serialize_executable as se

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        img_shapes = tuple(tuple(int(d) for d in s) for s in img_shapes)
        feats, lengths, imgs, masks = self._aot_avals(B, T, feat_dim, img_shapes)

        enc_exec = self._encode.lower(
            self.params, feats, lengths, imgs, masks).compile()
        enc_aval = jax.eval_shape(
            lambda p, f, l, im, mk: self.model.apply(
                p, f, l, im, mk, None,
                deterministic=True, method=self.model.encode),
            self.params, feats, lengths, imgs, masks,
        )
        max_len = self._max_len(T)
        search_exec = self._search.lower(
            self.params_list, (enc_aval,) * len(self.params_list),
            max_len=max_len).compile()

        meta = self._aot_meta(B, T, feat_dim, img_shapes)
        blob = {
            "meta": meta,
            "encode": se.serialize(enc_exec),
            "search": se.serialize(search_exec),
        }
        out = path / f"generate_b{B}_t{T}_f{feat_dim}_i{len(img_shapes)}.aot"
        with open(out, "wb") as f:
            pickle.dump(blob, f)
        self._aot[(B, T, feat_dim, img_shapes)] = (enc_exec, search_exec)
        return out

    def aot_load(self, path) -> int:
        """Load every compatible serialized operating point under ``path``
        into this generator (no tracing/compilation). Returns the number
        loaded; incompatible artifacts (different generation config, model
        config, ensemble size, backend, or jax version) are skipped."""
        from jax.experimental import serialize_executable as se

        path = Path(path)
        if not path.is_dir():
            return 0
        n = 0
        for art in sorted(path.glob("*.aot")):
            try:
                with open(art, "rb") as f:
                    blob = pickle.load(f)
                meta = blob["meta"]
                key = (meta["B"], meta["T"], meta["feat_dim"],
                       tuple(tuple(s) for s in meta["img_shapes"]))
                want = self._aot_meta(*key)
                if meta != want:
                    continue
                # Single-device programs: pin execution to device 0 (the
                # default loader fans out to every visible device, which
                # breaks under a forced multi-device CPU test topology).
                dev = jax.devices()[:1]
                enc_exec = se.deserialize_and_load(
                    *blob["encode"], execution_devices=dev)
                search_exec = se.deserialize_and_load(
                    *blob["search"], execution_devices=dev)
            except Exception:  # artifact from another build/backend
                continue
            self._aot[key] = (enc_exec, search_exec)
            n += 1
        return n

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
        aot = None
        if self._aot and getattr(src_features, "ndim", 0) == 3:
            aot = self._aot.get((
                B, int(src_features.shape[1]), int(src_features.shape[2]),
                tuple(tuple(int(d) for d in x.shape[1:]) for x in imgs_list),
            ))
        if aot is not None:
            enc_fn, search_fn = aot
            feats_j = jnp.asarray(src_features, jnp.float32)
            lens_j = jnp.asarray(src_lengths, jnp.int32)
            imgs_j = tuple(jnp.asarray(x, jnp.float32) for x in imgs_list)
            masks_j = tuple(jnp.asarray(x, bool) for x in img_masks_list)
            encs = tuple(
                enc_fn(p, feats_j, lens_j, imgs_j, masks_j)
                for p in self.params_list
            )
            seqs, scores = search_fn(self.params_list, encs)
        else:
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
