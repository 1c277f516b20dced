"""Unit HiFi-GAN vocoder with duration prediction — device-side unit→wav.

TPU-native re-design of fairseq's CodeHiFiGANVocoder (SURVEY.md F11; the
reference vocodes via generate_waveform_from_code.py --vocoder code_hifigan
--dur-prediction, scripts/3_generate_waveform.sh:28-32):

* unit ids → embedding → (optional) duration predictor → length-regulated
  frame sequence → transposed-conv upsample stack with multi-receptive-
  field (MRF) resblocks → tanh waveform;
* the data-dependent repeat_interleave is static-shape: durations are
  cumsum'd and frames gather their unit via searchsorted, padded to a
  fixed frame budget with a validity mask (SURVEY.md §7 hard part 5);
* convs run as XLA NTC convolutions (MXU); weight norm is folded at
  load time (inference graphs carry plain kernels);
* ``load_fairseq_checkpoint`` converts the published torch vocoder
  weights to this module's params so the reference's checkpoints work
  unchanged.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    """Mirrors the fairseq/config.json surface of code_hifigan."""

    num_embeddings: int = 1000
    embedding_dim: int = 128
    model_in_dim: int = 128
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (11, 8, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    # Duration predictor (var_pred_* keys in fairseq config).
    dur_prediction: bool = True
    var_pred_hidden_dim: int = 128
    var_pred_kernel_size: int = 3
    var_pred_dropout: float = 0.5
    # Optional speaker conditioning.
    num_speakers: int = 0
    speaker_embedding_dim: int = 0

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    @classmethod
    def from_json(cls, path: str | Path) -> "HiFiGANConfig":
        raw = json.loads(Path(path).read_text())
        def tup(x):
            return tuple(tuple(i) if isinstance(i, (list, tuple)) else i for i in x)
        return cls(
            num_embeddings=raw.get("num_embeddings", 1000),
            embedding_dim=raw.get("embedding_dim", 128),
            model_in_dim=raw.get("model_in_dim", raw.get("embedding_dim", 128)),
            upsample_initial_channel=raw.get("upsample_initial_channel", 512),
            upsample_rates=tuple(raw.get("upsample_rates", (5, 4, 4, 2, 2))),
            upsample_kernel_sizes=tuple(raw.get("upsample_kernel_sizes", (11, 8, 8, 4, 4))),
            resblock_kernel_sizes=tuple(raw.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tup(raw.get("resblock_dilation_sizes", ((1, 3, 5),) * 3)),
            dur_prediction=bool(raw.get("dur_prediction_weight", raw.get("dur_prediction", True))),
            var_pred_hidden_dim=raw.get("var_pred_hidden_dim", 128),
            var_pred_kernel_size=raw.get("var_pred_kernel_size", 3),
            var_pred_dropout=raw.get("var_pred_dropout", 0.5),
            num_speakers=raw.get("num_speakers", 0),
            speaker_embedding_dim=raw.get("speaker_embedding_dim", 0),
        )


class ResBlock(nn.Module):
    """MRF residual block: pairs of dilated/plain convs with leaky ReLU."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = jax.nn.leaky_relu(x, LRELU_SLOPE)
            pad = (self.kernel_size - 1) * d // 2
            h = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,),
                padding=[(pad, pad)], dtype=self.dtype, name=f"convs1_{i}",
            )(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            pad = (self.kernel_size - 1) // 2
            h = nn.Conv(
                self.channels, (self.kernel_size,),
                padding=[(pad, pad)], dtype=self.dtype, name=f"convs2_{i}",
            )(h)
            x = x + h
        return x


def _fold_matrix(k: int, d: int, f: int) -> Tuple[np.ndarray, int, int]:
    """Constant scatter map for time-folding a SAME dilated conv.

    A conv ``y[t] = Σ_j W[j]·x[t + j·d - p]`` (p = (k-1)·d//2) on a
    (T, C) signal is exactly a conv on the *reshaped* (T/f, f·C) signal
    — the reshape is free because C is minor — with folded kernel
    ``W'[q, r·C+ci, s·C+co] = Σ_j M[j,q,r,s]·W[j,ci,co]`` where for each
    output lane-phase s and tap j, the input position a = s + j·d - p
    lands in folded block q = ⌊a/f⌋ at phase r = a mod f.

    Returns (M (k, K', f, f) 0/1 constant, pad_left, pad_right) with
    K' = q_max − q_min + 1, pad_left = −q_min, pad_right = q_max.
    """
    p = (k - 1) * d // 2
    qs = [(s + j * d - p) // f for s in range(f) for j in range(k)]
    q_min, q_max = min(qs), max(qs)
    Kp = q_max - q_min + 1
    M = np.zeros((k, Kp, f, f), np.float32)
    for s in range(f):
        for j in range(k):
            a = s + j * d - p
            M[j, a // f - q_min, a % f, s] = 1.0
    return M, -q_min, q_max


class HiFiGANGenerator(nn.Module):
    """Small-channel MRF stages are the throughput problem on TPU: an
    isolated conv at C ≤ 64 offers the MXU only K·N = k·C² useful
    work per 128×128 tile, so XLA runs the late stages at ≤17% lane
    utilization (measured: the MRF stacks own ~170 ms of a 412 ms
    e2e batch at B=32). Two apply-time repackings are provided — both
    keep the parameter/checkpoint structure unchanged:

    * ``folded_mrf`` (default): time-folding. x (B, T, C) is reshaped —
      free, C is the minor axis — to (B, T/f, f·C) with f = 128/C, and
      every MRF conv runs as a dense folded conv whose (K', f·C, f·C)
      kernel is built from the original weights by a constant scatter
      (:func:`_fold_matrix`). ~K'·f/k more FLOPs, but they run at full
      128-lane MXU occupancy, a net win for C ≤ 64; elementwise ops
      (leaky_relu, residual adds, the block mean) are fold-invariant.
    * ``grouped_mrf``: feature_group_count packing of the 3 parallel
      blocks. Measured SLOWER on v5e than three separate convs; kept as
      a documented, parity-tested variant.
    """

    cfg: HiFiGANConfig
    dtype: Any = jnp.float32
    grouped_mrf: bool = False
    # Default on: measured 176.8 → 129.3 ms for the published architecture
    # at B=32 × 800 frames bf16 on v5e (bit-exact vs per-block).
    folded_mrf: bool = True

    def _folded_resblock(self, x, name: str, k: int, dils, ch: int, f: int):
        """One ResBlock computed in (T/f, f·ch) folded space.
        x: (B, T/f, f·ch) folded input; returns same shape."""
        params = self.variables["params"][name]

        def fold_w(w, d):
            M, pl, pr = _fold_matrix(k, d, f)
            wf = jnp.einsum(
                "jqrs,jab->qrasb", jnp.asarray(M, w.dtype), w
            ).reshape(M.shape[1], f * ch, f * ch)
            return wf, pl, pr

        for i, d in enumerate(dils):
            h = jax.nn.leaky_relu(x, LRELU_SLOPE)
            w1 = params[f"convs1_{i}"]["kernel"].astype(self.dtype)
            b1 = params[f"convs1_{i}"]["bias"].astype(self.dtype)
            wf, pl, pr = fold_w(w1, d)
            h = jax.lax.conv_general_dilated(
                h, wf, window_strides=(1,), padding=[(pl, pr)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + jnp.tile(b1, f)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            w2 = params[f"convs2_{i}"]["kernel"].astype(self.dtype)
            b2 = params[f"convs2_{i}"]["bias"].astype(self.dtype)
            wf2, pl2, pr2 = fold_w(w2, 1)
            h = jax.lax.conv_general_dilated(
                h, wf2, window_strides=(1,), padding=[(pl2, pr2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + jnp.tile(b2, f)
            x = x + h
        return x

    def _grouped_mrf_stage(self, x, block_names, ch):
        """x: (B, T, ch); block_names: param names of this stage's
        ResBlocks (same dilation schedule, different kernel sizes).
        Returns the mean of the (packed) blocks."""
        c = self.cfg
        n = len(block_names)
        kmax = max(c.resblock_kernel_sizes)
        n_steps = len(c.resblock_dilation_sizes[0])
        h = jnp.tile(x, (1, 1, n))  # (B, T, n·ch), group-major
        params = self.variables["params"]

        def packed(which: str, j: int):
            kers, biases = [], []
            for g, name in enumerate(block_names):
                k = c.resblock_kernel_sizes[g]
                w = params[name][f"{which}_{j}"]["kernel"].astype(self.dtype)
                b = params[name][f"{which}_{j}"]["bias"].astype(self.dtype)
                pad = (kmax - k) // 2
                w = jnp.pad(w, ((pad, kmax - k - pad), (0, 0), (0, 0)))
                kers.append(w)
                biases.append(b)
            return jnp.concatenate(kers, axis=2), jnp.concatenate(biases)

        for j in range(n_steps):
            d = c.resblock_dilation_sizes[0][j]
            w1, b1 = packed("convs1", j)
            w2, b2 = packed("convs2", j)
            pad1 = (kmax - 1) * d // 2
            a = jax.lax.conv_general_dilated(
                jax.nn.leaky_relu(h, LRELU_SLOPE), w1,
                window_strides=(1,), padding=[(pad1, pad1)],
                rhs_dilation=(d,), feature_group_count=n,
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b1
            pad2 = (kmax - 1) // 2
            a = jax.lax.conv_general_dilated(
                jax.nn.leaky_relu(a, LRELU_SLOPE), w2,
                window_strides=(1,), padding=[(pad2, pad2)],
                feature_group_count=n,
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b2
            h = h + a
        B, T = h.shape[:2]
        return h.reshape(B, T, n, ch).mean(axis=2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, model_in_dim) frames → (B, T·hop) waveform in [-1, 1]."""
        c = self.cfg
        x = nn.Conv(
            c.upsample_initial_channel, (7,), padding=[(3, 3)],
            dtype=self.dtype, name="conv_pre",
        )(x)
        n_res = len(c.resblock_kernel_sizes)
        same_dil = all(
            tuple(d) == tuple(c.resblock_dilation_sizes[0])
            for d in c.resblock_dilation_sizes
        )
        for i, (rate, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            # ConvTranspose with torch-compatible output length T·rate:
            # torch uses padding=(k-rate)//2 on both sides of the full output.
            x = nn.ConvTranspose(
                ch, (k,), strides=(rate,), padding="VALID",
                dtype=self.dtype, name=f"ups_{i}",
            )(x)
            trim = (k - rate) // 2
            if trim > 0:
                x = x[:, trim:-trim]
            blocks = [
                ResBlock(ch, rk, tuple(rd), dtype=self.dtype,
                         name=f"resblocks_{i * n_res + j}")
                for j, (rk, rd) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
                )
            ]
            f = 128 // ch if ch and 128 % ch == 0 else 0
            if (
                self.folded_mrf and f > 1 and x.shape[1] % f == 0
                and not self.is_initializing()
            ):
                xf = x.reshape(x.shape[0], x.shape[1] // f, f * ch)
                acc = None
                for j, (rk, rd) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
                ):
                    h = self._folded_resblock(
                        xf, f"resblocks_{i * n_res + j}", rk, tuple(rd), ch, f
                    )
                    acc = h if acc is None else acc + h
                x = (acc / n_res).reshape(x.shape[0], x.shape[1], ch)
            elif self.grouped_mrf and same_dil and n_res > 1 and not self.is_initializing():
                names = [f"resblocks_{i * n_res + j}" for j in range(n_res)]
                x = self._grouped_mrf_stage(x, names, ch)
            else:
                # Init always walks the per-block graph so params are
                # created with the standard structure/checkpoint layout.
                acc = None
                for blk in blocks:
                    h = blk(x)
                    acc = h if acc is None else acc + h
                x = acc / n_res
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class DurationPredictor(nn.Module):
    """fairseq VarancePredictor: conv→ReLU→LN→drop ×2 → linear → log-dur."""

    hidden: int = 128
    kernel_size: int = 3
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        valid: Optional[jnp.ndarray] = None,  # (B, L) bool
    ) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2
        for i in range(2):
            if valid is not None:
                # Zero padded positions before every conv so a padded
                # batch computes exactly what per-utterance exact-length
                # inputs would (the convs' own edge padding is zeros; a
                # padded buffer's tail otherwise carries pad-unit
                # embeddings / previous-layer phantom activations into
                # the last valid units' receptive fields). fairseq's
                # VariancePredictor runs per-utterance, so this is the
                # reference semantics.
                x = x * valid[..., None].astype(x.dtype)
            x = nn.Conv(
                self.hidden, (self.kernel_size,), padding=[(pad, pad)],
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i + 1}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype, name="proj")(x)[..., 0]


def length_regulate(
    embeddings: jnp.ndarray,  # (B, L, D)
    durations: jnp.ndarray,  # (B, L) int, 0 for padding units
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape repeat_interleave: frame t takes the unit whose
    cumulative duration first exceeds t. Returns ((B, max_frames, D),
    (B,) valid frame counts)."""
    csum = jnp.cumsum(durations, axis=1)  # (B, L)
    t = jnp.arange(max_frames)
    # idx[b, t] = first l with csum[b, l] > t
    idx = jax.vmap(lambda c: jnp.searchsorted(c, t, side="right"))(csum)
    idx = jnp.minimum(idx, embeddings.shape[1] - 1)
    frames = jnp.take_along_axis(embeddings, idx[..., None], axis=1)
    # Clamp to the frame budget: predicted durations are unbounded above,
    # and an unclamped total would report more valid samples than the
    # (truncated) frame tensor actually carries — callers sizing buffers
    # by the count would overrun.
    total = jnp.minimum(csum[:, -1], max_frames)
    mask = (t[None, :] < total[:, None]).astype(embeddings.dtype)
    return frames * mask[..., None], total


class CodeHiFiGAN(nn.Module):
    """Unit-sequence → waveform, with optional duration prediction."""

    cfg: HiFiGANConfig
    max_frames: int = 2048  # frame budget after length regulation
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.dict_embed = nn.Embed(
            c.num_embeddings, c.embedding_dim, dtype=self.dtype, name="dict"
        )
        if c.dur_prediction:
            self.dur_predictor = DurationPredictor(
                c.var_pred_hidden_dim, c.var_pred_kernel_size,
                c.var_pred_dropout, dtype=self.dtype,
            )
        if c.num_speakers:
            self.spkr_embed = nn.Embed(
                c.num_speakers, c.speaker_embedding_dim, dtype=self.dtype, name="spkr"
            )
        self.generator = HiFiGANGenerator(c, dtype=self.dtype)

    def unit_durations(
        self,
        units: jnp.ndarray,
        unit_lengths: Optional[jnp.ndarray] = None,
        dur_prediction: bool = True,
    ) -> jnp.ndarray:
        """(B, L) per-unit frame durations (predictor or 1/unit), zeroed
        past ``unit_lengths`` — the budget-selection input for
        :func:`vocode_bucketed`."""
        c = self.cfg
        B, L = units.shape
        if unit_lengths is None:
            unit_lengths = jnp.full((B,), L, jnp.int32)
        valid = jnp.arange(L)[None, :] < unit_lengths[:, None]
        if c.dur_prediction and dur_prediction:
            emb = self.dict_embed(units)
            log_dur = self.dur_predictor(emb, valid=valid)
            dur = jnp.clip(
                jnp.round(jnp.exp(log_dur) - 1.0), 1.0, None
            ).astype(jnp.int32)
        else:
            dur = jnp.ones((B, L), jnp.int32)
        return dur * valid.astype(jnp.int32)

    def vocode_frames(
        self,
        frame_units: jnp.ndarray,  # (B, T) unit id OF EACH FRAME
        speaker: Optional[jnp.ndarray] = None,  # (B,) speaker ids
    ) -> jnp.ndarray:
        """(B, T) length-regulated frame-level unit ids → (B, T·hop) wav.

        The post-length-regulation half of ``__call__``: frame t carries
        ``embed(frame_units[t])`` (+ optional speaker embedding) into the
        generator. Used by infer/streaming_vocoder.py, which feeds
        receptive-field-halo windows of the frame sequence for exact
        chunked synthesis."""
        emb = self.dict_embed(frame_units)
        if self.cfg.num_speakers and speaker is not None:
            spk = self.spkr_embed(speaker)[:, None, :]
            emb = jnp.concatenate(
                [emb, jnp.broadcast_to(
                    spk, (emb.shape[0], emb.shape[1], spk.shape[-1])
                )],
                axis=-1,
            )
        return self.generator(emb)

    def __call__(
        self,
        units: jnp.ndarray,  # (B, L) unit ids (0..num_embeddings-1)
        unit_lengths: Optional[jnp.ndarray] = None,  # (B,)
        dur_prediction: bool = True,
        speaker: Optional[jnp.ndarray] = None,  # (B,) speaker ids
        durations: Optional[jnp.ndarray] = None,  # (B, L) optional gold durs
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns ((B, max_frames·hop) waveform, (B,) valid sample counts)."""
        c = self.cfg
        B, L = units.shape
        if unit_lengths is None:
            unit_lengths = jnp.full((B,), L, jnp.int32)
        valid = jnp.arange(L)[None, :] < unit_lengths[:, None]
        emb = self.dict_embed(units)

        if durations is not None:
            dur = durations
        elif c.dur_prediction and dur_prediction:
            # Input to the predictor is the (deduped) unit sequence — the
            # reference dedups units upstream (--reduce-unit data prep).
            log_dur = self.dur_predictor(emb, valid=valid)
            dur = jnp.clip(jnp.round(jnp.exp(log_dur) - 1.0), 1.0, None).astype(jnp.int32)
        else:
            dur = jnp.ones((B, L), jnp.int32)
        dur = dur * valid.astype(jnp.int32)

        frames, n_frames = length_regulate(emb, dur, self.max_frames)

        if c.num_speakers and speaker is not None:
            spk = self.spkr_embed(speaker)[:, None, :]
            frames = jnp.concatenate(
                [frames, jnp.broadcast_to(spk, (B, frames.shape[1], spk.shape[-1]))],
                axis=-1,
            )

        wav = self.generator(frames)
        return wav, n_frames * c.hop_length


def vocode_bucketed(
    cfg: HiFiGANConfig,
    params,
    units: jnp.ndarray,
    unit_lengths: Optional[jnp.ndarray] = None,
    buckets: Sequence[int] = (256, 512, 1024),
    dur_prediction: bool = True,
    speaker: Optional[jnp.ndarray] = None,
    dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-bucketed vocoding: durations are predicted once, then ONE
    ``lax.switch`` branch runs the generator at the smallest budget in
    ``buckets`` covering the batch's actual frame count. All branches
    compile once; at runtime only the selected budget's FLOPs are spent —
    the generator's conv stacks cost ∝ frames, so a batch needing 230
    frames pays the 256-frame branch instead of the worst-case budget
    (the serving analog of training-shape bucketing; XLA-safe because
    every branch has static shapes). Waveforms return padded to
    ``buckets[-1] · hop``; batches needing more frames than the largest
    bucket are truncated there, exactly as a fixed ``max_frames`` budget
    truncates. Jittable.
    """
    buckets = sorted(buckets)
    models = [CodeHiFiGAN(cfg, max_frames=b, dtype=dtype) for b in buckets]
    dur = models[0].apply(
        params, units, unit_lengths, dur_prediction,
        method=CodeHiFiGAN.unit_durations,
    )
    max_frames = dur.sum(axis=1).max()
    idx = jnp.searchsorted(jnp.asarray(buckets), max_frames)
    idx = jnp.minimum(idx, len(buckets) - 1)
    hop = cfg.hop_length
    out_len = buckets[-1] * hop

    def make_branch(m):
        def branch(operands):
            u, lens, d, spk = operands
            wav, n = m.apply(params, u, lens, speaker=spk, durations=d)
            pad = out_len - wav.shape[1]
            if pad:
                wav = jnp.pad(wav, ((0, 0), (0, pad)))
            return wav, jnp.minimum(n, m.max_frames * hop)

        return branch

    return jax.lax.switch(
        idx, [make_branch(m) for m in models],
        (units, unit_lengths, dur, speaker),
    )


# ---------------------------------------------------------------------------
# fairseq checkpoint conversion
# ---------------------------------------------------------------------------


def _fold_weight_norm(sd: Dict[str, Any], prefix: str) -> np.ndarray:
    """Fold weight_g/weight_v into a plain kernel (torch layout)."""
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"]
    g = sd[f"{prefix}.weight_g"]
    v = sd[f"{prefix}.weight_v"]
    norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (out, in, k) → flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d (in, out, k) → flax ConvTranspose (k, in, out),
    with the kernel flipped (torch convT cross-correlates the flipped way)."""
    return np.transpose(w, (2, 0, 1))[::-1].copy()


def load_fairseq_checkpoint(
    ckpt_path: str | Path, cfg: HiFiGANConfig
) -> Dict[str, Any]:
    """Convert a fairseq CodeHiFiGANVocoder state_dict (.pt) to params for
    :class:`CodeHiFiGAN` (cites reference use:
    --vocoder code_hifigan, scripts/3_generate_waveform.sh:28-32).
    Torch-free for zip-format checkpoints (utils/torch_pickle.py)."""
    from mm_s2ut.utils import torch_pickle

    sd = torch_pickle.load_checkpoint_numpy(ckpt_path)
    if "generator" in sd:
        sd = sd["generator"]
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v for k, v in sd.items()}

    p: Dict[str, Any] = {}
    p["dict"] = {"embedding": sd["dict.weight"]}
    gen: Dict[str, Any] = {}
    gen["conv_pre"] = {
        "kernel": _conv_kernel(_fold_weight_norm(sd, "conv_pre")),
        "bias": sd["conv_pre.bias"],
    }
    n_res = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        gen[f"ups_{i}"] = {
            "kernel": _convT_kernel(_fold_weight_norm(sd, f"ups.{i}")),
            "bias": sd[f"ups.{i}.bias"],
        }
    for r in range(len(cfg.upsample_rates) * n_res):
        blk: Dict[str, Any] = {}
        dil = cfg.resblock_dilation_sizes[r % n_res]
        for j in range(len(dil)):
            for which in ("convs1", "convs2"):
                blk[f"{which}_{j}"] = {
                    "kernel": _conv_kernel(
                        _fold_weight_norm(sd, f"resblocks.{r}.{which}.{j}")
                    ),
                    "bias": sd[f"resblocks.{r}.{which}.{j}.bias"],
                }
        gen[f"resblocks_{r}"] = blk
    gen["conv_post"] = {
        "kernel": _conv_kernel(_fold_weight_norm(sd, "conv_post")),
        "bias": sd["conv_post.bias"],
    }
    p["generator"] = gen

    if cfg.dur_prediction and "dur_predictor.conv1.0.weight" not in sd:
        # fairseq would fail load_state_dict with missing keys here; fail
        # with an actionable message instead of a flax scope error later.
        raise ValueError(
            f"{ckpt_path}: config requests dur_prediction but the checkpoint "
            "has no dur_predictor weights; set \"dur_prediction\": false in "
            "the vocoder config json (or use a --dur-prediction checkpoint)"
        )
    if cfg.dur_prediction and "dur_predictor.conv1.0.weight" in sd:
        dp: Dict[str, Any] = {}
        for i in (1, 2):
            dp[f"conv{i}"] = {
                "kernel": _conv_kernel(sd[f"dur_predictor.conv{i}.0.weight"]),
                "bias": sd[f"dur_predictor.conv{i}.0.bias"],
            }
            dp[f"ln{i}"] = {
                "scale": sd[f"dur_predictor.ln{i}.weight"],
                "bias": sd[f"dur_predictor.ln{i}.bias"],
            }
        dp["proj"] = {
            "kernel": sd["dur_predictor.proj.weight"].T,
            "bias": sd["dur_predictor.proj.bias"],
        }
        p["dur_predictor"] = dp
    if cfg.num_speakers and "spkr.weight" in sd:
        p["spkr"] = {"embedding": sd["spkr.weight"]}
    return {"params": p}
