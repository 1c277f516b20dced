"""Exact chunked CodeHiFiGAN synthesis for streaming S2ST.

Feed committed units incrementally and receive waveform samples
incrementally, EXACTLY equal (same params) to one exact-length offline
``CodeHiFiGAN.__call__`` over the final unit sequence (tested to 1e-5).
A capability beyond the reference, whose vocoder is offline-only
(fairseq CodeHiFiGANVocoder over full unit sequences,
scripts/textless/3_generate_waveform.sh).

Design — receptive-field halo windows, TPU-native static shapes:

  * every op in the generator is translation-invariant in the interior
    (same-padded convs, transposed convs with symmetric trim), so the
    output at sample s depends only on frames within a fixed halo
    ``generator_halo_samples(cfg)`` of s (≈7.1k samples ≈ 23 frames for
    the reference 16 kHz config);
  * the session therefore runs the generator on fixed-width frame
    windows (``emit_frames + 2·halo``) and emits only the interior; the
    window edges' phantom activations never reach emitted samples;
  * at the true signal edges the window is pinned to the edge, where the
    generator's own same-padding applies — so edges are exact too;
  * the duration predictor (conv k=3 ×2) has its own ±2-unit halo:
    durations are committed only once 2 more units have arrived (all of
    them at ``finalize``);
  * compile count is tiny and bounded: one duration program, one
    steady-state window program, plus at most one exact-length tail
    program for streams shorter than a single window.
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut.models.hifigan import CodeHiFiGAN, HiFiGANConfig


def generator_halo_samples(cfg: HiFiGANConfig) -> int:
    """Upper bound on the generator's one-sided receptive field: output
    sample s depends only on input frames within ``ceil(halo/hop)`` of
    ``s // hop``. Accumulated through conv_pre, each upsample stage
    (position scale ×rate then +kernel), that stage's widest MRF branch,
    and conv_post."""
    h = 3  # conv_pre, kernel 7 same-padded
    for rate, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        h = h * rate + k
        mrf = 0
        for ks, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            s = sum((ks - 1) * d // 2 + (ks - 1) // 2 for d in dils)
            mrf = max(mrf, s)
        h += mrf
    return h + 3  # conv_post, kernel 7


class StreamingVocoderSession:
    """Incremental unit→wav synthesis, sample-exact vs offline.

    ``feed(units)`` appends committed units and returns any newly mature
    samples; ``finalize()`` flushes the rest. The concatenation of all
    returned chunks equals ``CodeHiFiGAN(cfg, max_frames=total).apply``
    on the full sequence (exact-length budget — the torch reference's
    per-utterance semantics).
    """

    def __init__(
        self,
        cfg: HiFiGANConfig,
        params,
        *,
        emit_frames: int = 64,
        max_units: int = 1024,
        speaker: Optional[int] = None,
        dtype: Any = jnp.float32,
    ):
        self.cfg = cfg
        self.params = params
        self.hop = cfg.hop_length
        self.halo_f = -(-generator_halo_samples(cfg) // self.hop)  # ceil
        self.emit_frames = emit_frames
        self.W = emit_frames + 2 * self.halo_f
        self.max_units = max_units
        # Duration commitment halo: the predictor's two k-size convs see
        # ±(k-1)//2 units each.
        self.dur_halo = 2 * ((cfg.var_pred_kernel_size - 1) // 2) if cfg.dur_prediction else 0
        self.speaker = (
            jnp.asarray([speaker], jnp.int32) if speaker is not None else None
        )
        self.model = CodeHiFiGAN(cfg, dtype=dtype)

        self._dur_fn = jax.jit(
            lambda p, u, n: self.model.apply(
                p, u, n, method=CodeHiFiGAN.unit_durations
            )
        )
        self._win_fn = jax.jit(
            lambda p, fu: self.model.apply(
                p, fu, self.speaker, method=CodeHiFiGAN.vocode_frames
            )
        )

        self.units: List[int] = []
        self.dur_done = 0            # units with committed durations
        self.frame_units = np.zeros((0,), np.int32)  # frame → unit id
        self.emitted_f = 0           # frames whose samples were emitted

    def _commit_durations(self, upto: int) -> None:
        """Compute durations for units [dur_done, upto) (their ±halo
        context has arrived) and extend the frame-level unit sequence."""
        if upto <= self.dur_done:
            return
        n = len(self.units)
        if n > self.max_units:
            raise ValueError("stream exceeds max_units")
        buf = np.zeros((1, self.max_units), np.int32)
        buf[0, :n] = self.units
        dur = np.asarray(
            self._dur_fn(self.params, jnp.asarray(buf),
                         jnp.asarray([n], np.int32))
        )[0]
        new = [
            np.full((int(dur[u]),), self.units[u], np.int32)
            for u in range(self.dur_done, upto)
        ]
        self.frame_units = np.concatenate([self.frame_units, *new])
        self.dur_done = upto

    def _run_window(self, w0: int, w1: int, e0: int, e1: int) -> np.ndarray:
        """Generator over frames [w0, w1); return samples of frames
        [e0, e1). Callers guarantee e0-w0 ≥ halo unless w0 is the true
        left edge, and e1+halo ≤ w1 unless w1 is the true right edge.

        Mid-stream the frame buffer may not reach w1 yet; the slice is
        zero-padded to the static window width so the steady-state
        program compiles ONCE. Exact: the pad begins at ≥ e1 + halo
        (the _emit_ready condition), so its phantom activations never
        reach the emitted interior."""
        fu = self.frame_units[w0:w1]
        pad = (w1 - w0) - fu.shape[0]
        if pad > 0:
            fu = np.concatenate([fu, np.zeros((pad,), np.int32)])
        wav = np.asarray(self._win_fn(self.params, jnp.asarray(fu[None])))[0]
        return wav[(e0 - w0) * self.hop : (e1 - w0) * self.hop]

    def _emit_ready(self, total_f: int) -> List[np.ndarray]:
        """Emit interior emit_frames blocks whose right halo is mature."""
        out = []
        while self.emitted_f + self.emit_frames + self.halo_f <= total_f:
            e0 = self.emitted_f
            e1 = e0 + self.emit_frames
            w0 = max(0, e0 - self.halo_f)
            out.append(self._run_window(w0, w0 + self.W, e0, e1))
            self.emitted_f = e1
        return out

    def feed(self, units: List[int]) -> np.ndarray:
        """Append committed units; returns newly mature samples (may be
        empty). Emitted samples are FINAL — exactly the offline wav's."""
        self.units += [int(u) for u in units]
        self._commit_durations(max(self.dur_done, len(self.units) - self.dur_halo))
        chunks = self._emit_ready(len(self.frame_units))
        return (
            np.concatenate(chunks) if chunks else np.zeros((0,), np.float32)
        )

    def finalize(self) -> np.ndarray:
        """Flush: remaining durations commit (right edge is real), the
        tail window is pinned to the true signal edge."""
        self._commit_durations(len(self.units))
        total = len(self.frame_units)
        out = self._emit_ready(total)
        if self.emitted_f < total:
            if total <= self.W:
                # Short stream: one exact-length program, both edges true.
                out.append(self._run_window(0, total, self.emitted_f, total))
            else:
                # Pin the steady window to the right edge; the interior
                # loop above guarantees emitted_f - (total - W) ≥ halo.
                out.append(
                    self._run_window(total - self.W, total, self.emitted_f, total)
                )
            self.emitted_f = total
        return (
            np.concatenate(out) if out else np.zeros((0,), np.float32)
        )
