"""Kaldi-compatible 80-bin log-mel filterbank frontend, TPU-native.

Replaces the reference's PyKaldi-C++/torchaudio fbank call chain
(reference data/audio_utils.py:326-349, "Prefer PyKaldi (faster CPP
implementation)") with a single fused XLA program: framing is a reshaped
gather, the window/preemphasis/DC-removal are fused elementwise ops, the
FFT is XLA's rfft, and the mel projection is one MXU matmul
(frames×257 @ 257×80). Everything is static-shape and batch-friendly, so
feature extraction runs *on device* inside the input pipeline instead of in
num-workers=8 CPU subprocesses (SURVEY.md §3.1 hot loop 4).

Algorithm parity targets kaldi's FbankComputer with torchaudio-compliance
defaults (dither=0): snip-edges framing, per-frame DC-offset removal,
preemphasis 0.97 (first sample convention x[0]-=0.97*x[0]), povey window
(hann^0.85), round-to-power-of-two FFT, power spectrum, kaldi mel scale
1127*ln(1+f/700) triangular banks over bins [0, nfft/2), natural log with
float-epsilon floor.

The reference rescales normalized waveforms to int16 range before fbank
(reference data/audio_utils.py:289-290); callers here do the same via
``waveform * 32768`` when features must match.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPSILON = float(np.finfo(np.float32).eps)


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"  # povey | hanning | hamming | rectangular
    round_to_power_of_two: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 ⇒ offset from nyquist
    use_power: bool = True
    dither: float = 0.0
    snip_edges: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            p = 1
            while p < n:
                p *= 2
            return p
        return n


def _feature_window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window type {cfg.window_type!r}")
    return w.astype(np.float32)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """(num_fft_bins, num_mel_bins) triangular kaldi mel bank matrix.

    num_fft_bins = padded_window_size/2 (kaldi MelBanks excludes nyquist).
    Laid out transposed so the projection is a plain ``frames @ banks``.
    """
    nfft = cfg.padded_window_size
    num_fft_bins = nfft // 2
    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    low_mel, high_mel = mel_scale(cfg.low_freq), mel_scale(high)
    delta = (high_mel - low_mel) / (cfg.num_mel_bins + 1)
    fft_freqs = np.arange(num_fft_bins, dtype=np.float64) * nyquist / num_fft_bins
    fft_mel = mel_scale(fft_freqs)  # (F,)
    left = low_mel + np.arange(cfg.num_mel_bins, dtype=np.float64) * delta
    center = left + delta
    right = center + delta
    up = (fft_mel[:, None] - left[None, :]) / delta
    down = (right[None, :] - fft_mel[:, None]) / delta
    banks = np.maximum(0.0, np.minimum(up, down))
    return banks.astype(np.float32)


def _dft_frame_matrices(cfg: FbankConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Compose (DC-removal → preemphasis → window → zero-padded real DFT)
    into two (frame_length, nfft/2) matrices.

    Every per-frame op before the power spectrum is LINEAR, so the whole
    chain is one matrix: A = diag(window) · P · (I - J/N), with P the
    preemphasis bidiagonal (x_i − 0.97·x_{i−1}, first-sample convention)
    and J the all-ones matrix. The combined M_re/M_im = Aᵀ·D fold
    everything into two MXU GEMMs — the GEMM-native NDFT formulation
    (cf. MelT, PAPERS.md) that replaces the FFT entirely. Exactly
    equivalent to the rfft path for dither=0 (golden-tested).
    """
    n = cfg.frame_length
    nfft = cfg.padded_window_size
    nbins = nfft // 2
    # A: (n, n) combined per-frame linear map.
    A = np.eye(n) - np.ones((n, n)) / n if cfg.remove_dc_offset else np.eye(n)
    if cfg.preemphasis > 0:
        P = np.eye(n)
        P[0, 0] -= cfg.preemphasis
        idx = np.arange(1, n)
        P[idx, idx - 1] -= cfg.preemphasis
        A = P @ A
    A = np.diag(_feature_window(cfg).astype(np.float64)) @ A
    # D: (n, nbins) real/imag DFT (zero padding ⇒ only first n rows used).
    t = np.arange(n)[:, None]
    k = np.arange(nbins)[None, :]
    ang = -2.0 * np.pi * t * k / nfft
    D_re, D_im = np.cos(ang), np.sin(ang)
    M_re = (A.T @ D_re).astype(np.float32)
    M_im = (A.T @ D_im).astype(np.float32)
    return M_re, M_im


@partial(jax.jit, static_argnames=("cfg", "n_frames"))
def _fbank_matmul_impl(
    waveform: jnp.ndarray, cfg: FbankConfig, n_frames: int
) -> jnp.ndarray:
    """GEMM-native fbank: framing gather + three MXU matmuls + log."""
    frames = _frame_signal(waveform.astype(jnp.float32), cfg, n_frames)
    M_re, M_im = _dft_frame_matrices(cfg)
    re = frames @ jnp.asarray(M_re)
    im = frames @ jnp.asarray(M_im)
    power = re * re + im * im
    if not cfg.use_power:
        power = jnp.sqrt(jnp.maximum(power, 0.0))
    mel = power @ jnp.asarray(mel_banks(cfg))
    return jnp.log(jnp.maximum(mel, _EPSILON))


def num_frames(num_samples: int, cfg: FbankConfig) -> int:
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def _frame_signal(waveform: jnp.ndarray, cfg: FbankConfig, n_frames: int) -> jnp.ndarray:
    """(S,) -> (n_frames, frame_length) via a strided gather (snip_edges)."""
    idx = (
        jnp.arange(n_frames)[:, None] * cfg.frame_shift
        + jnp.arange(cfg.frame_length)[None, :]
    )
    return waveform[idx]


@partial(jax.jit, static_argnames=("cfg", "n_frames"))
def _fbank_impl(
    waveform: jnp.ndarray,
    cfg: FbankConfig,
    n_frames: int,
    dither_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    frames = _frame_signal(waveform.astype(jnp.float32), cfg, n_frames)
    if cfg.dither > 0 and dither_key is not None:
        frames = frames + cfg.dither * jax.random.normal(dither_key, frames.shape)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis > 0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * jnp.asarray(_feature_window(cfg))
    nfft = cfg.padded_window_size
    if nfft > cfg.frame_length:
        frames = jnp.pad(frames, ((0, 0), (0, nfft - cfg.frame_length)))
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    power = (spec.real**2 + spec.imag**2)[:, : nfft // 2]  # drop nyquist (kaldi)
    if not cfg.use_power:
        power = jnp.sqrt(power)
    mel = power @ jnp.asarray(mel_banks(cfg))  # MXU matmul
    return jnp.log(jnp.maximum(mel, _EPSILON))


def log_mel_fbank(
    waveform: jnp.ndarray | np.ndarray,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(num_samples,) float waveform → (num_frames, num_mel_bins) log-mels.

    The waveform is used as given — callers wanting kaldi int16-scale parity
    multiply by 32768 first (reference data/audio_utils.py:289-290).
    """
    waveform = jnp.asarray(waveform)
    n = num_frames(int(waveform.shape[-1]), cfg)
    if n == 0:
        return jnp.zeros((0, cfg.num_mel_bins), jnp.float32)
    if cfg.dither > 0 and dither_key is not None:
        return _fbank_impl(waveform, cfg, n, dither_key)
    return _fbank_matmul_impl(waveform, cfg, n)


@partial(jax.jit, static_argnames=("cfg",))
def batched_log_mel_fbank(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) padded waveforms + (B,) sample lengths →
    ((B, T, M) features, (B,) frame lengths). Static shapes: T is the frame
    count of the padded length S; frames past each utterance's length are
    zeroed. This is the on-device batch frontend used by the input pipeline.
    """
    B, S = waveforms.shape
    T = num_frames(S, cfg)
    impl = _fbank_impl if cfg.dither > 0 else _fbank_matmul_impl
    feats = jax.vmap(lambda w: impl(w, cfg, T))(waveforms.astype(jnp.float32))
    frame_lens = jnp.where(
        lengths >= cfg.frame_length,
        1 + (lengths - cfg.frame_length) // cfg.frame_shift,
        0,
    )
    mask = jnp.arange(T)[None, :] < frame_lens[:, None]
    return feats * mask[..., None], frame_lens


def standardize(feats: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-utterance mean/var normalization (reference ``standardize_audio``,
    data/speech_to_speech_dataset.py:265-269 uses F.layer_norm over the
    whole waveform; applied here over valid frames)."""
    if lengths is None:
        mean = feats.mean(axis=-2, keepdims=True)
        var = feats.var(axis=-2, keepdims=True)
    else:
        T = feats.shape[-2]
        mask = (jnp.arange(T)[:, None] < lengths[..., None, None]).astype(feats.dtype)
        denom = jnp.maximum(mask.sum(axis=-2, keepdims=True), 1.0)
        mean = (feats * mask).sum(axis=-2, keepdims=True) / denom
        var = ((feats - mean) ** 2 * mask).sum(axis=-2, keepdims=True) / denom
    return (feats - mean) * jax.lax.rsqrt(var + 1e-5)
