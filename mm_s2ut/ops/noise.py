"""Noise augmentation at target SNR — pure JAX, batched, static-shape.

Port of the reference's mixing *semantics* (SURVEY.md C4; reference
data/audio_utils.py:161-233 ``add_noise_v2`` — the variant the dataset
actually calls at data/speech_to_speech_dataset.py:217-232, and
audio_utils.py:45-87 ``add_noise``), redesigned to run on device inside
the input pipeline instead of in CPU dataloader workers: one call mixes a
whole padded batch with per-example SNR draws under a PRNG key.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def db_to_amplitude(db: jnp.ndarray) -> jnp.ndarray:
    """dB → linear amplitude ratio (reference audio_utils.py:143-157:
    10^(db/10) in *power*, amplitude convention follows speechbrain's
    dB_to_amplitude(SNR) = 10^(SNR/20) squared → here 10^(db/20)**2? The
    reference uses 10 ** (db / 20) for amplitude)."""
    return 10.0 ** (db / 20.0)


def compute_amplitude(
    waveforms: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Average absolute amplitude per example (reference
    audio_utils.py:89-140 with amp_type='avg'): (B, T) → (B, 1)."""
    if lengths is None:
        return jnp.mean(jnp.abs(waveforms), axis=-1, keepdims=True)
    T = waveforms.shape[-1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(waveforms.dtype)
    denom = jnp.maximum(lengths.astype(waveforms.dtype), 1.0)[:, None]
    return jnp.sum(jnp.abs(waveforms) * mask, axis=-1, keepdims=True) / denom


def add_noise(
    key: jax.Array,
    waveforms: jnp.ndarray,  # (B, T) clean, padded
    noise: jnp.ndarray,  # (B, T) noise, already tiled/cropped to T
    snr_low: float,
    snr_high: float,
    lengths: Optional[jnp.ndarray] = None,
    normalize: bool = True,
    mix_prob: float = 1.0,
) -> jnp.ndarray:
    """SNR-targeted mixture (add_noise_v2 semantics):

    f = 1 / (10^(SNR/20) + 1);  out = (1-f)·clean + f·A_clean/A_noise·noise,
    then peak-normalized with the max clamped to ≥1 (so quiet signals are
    untouched). ``mix_prob`` applies the mix per example (the reference
    draws per sample in __getitem__, data/speech_to_speech_dataset.py:239).
    """
    B = waveforms.shape[0]
    k_snr, k_prob = jax.random.split(key)
    snr = jax.random.uniform(k_snr, (B, 1), minval=snr_low, maxval=snr_high)
    factor = 1.0 / (db_to_amplitude(snr) + 1.0)

    clean_amp = compute_amplitude(waveforms, lengths)
    noise_amp = compute_amplitude(noise, lengths)
    new_noise_amp = factor * clean_amp

    noisy = waveforms * (1.0 - factor)
    noisy = noisy + noise * (new_noise_amp / (noise_amp + 1e-14))

    if normalize:
        abs_max = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
        noisy = noisy / jnp.maximum(abs_max, 1.0)

    if mix_prob < 1.0:
        mixed = jax.random.uniform(k_prob, (B, 1)) < mix_prob
        noisy = jnp.where(mixed, noisy, waveforms)
    return noisy


def add_white_noise(
    key: jax.Array,
    waveforms: jnp.ndarray,
    snr_low: float,
    snr_high: float,
    lengths: Optional[jnp.ndarray] = None,
    normalize: bool = True,
) -> jnp.ndarray:
    """White-noise branch of add_noise_v2 (reference audio_utils.py:202-205)."""
    k_snr, k_n = jax.random.split(key)
    B = waveforms.shape[0]
    snr = jax.random.uniform(k_snr, (B, 1), minval=snr_low, maxval=snr_high)
    factor = 1.0 / (db_to_amplitude(snr) + 1.0)
    clean_amp = compute_amplitude(waveforms, lengths)
    noisy = waveforms * (1.0 - factor)
    noisy = noisy + factor * clean_amp * jax.random.normal(k_n, waveforms.shape)
    if normalize:
        abs_max = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
        noisy = noisy / jnp.maximum(abs_max, 1.0)
    return noisy


def tile_noise_to_length(noise: np.ndarray, length: int, start: int = -1,
                         rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Host-side: repeat/crop a noise clip to exactly ``length`` samples
    (reference add_noise_v2 tiling, audio_utils.py:210-219; random start
    when start < 0)."""
    if len(noise) < length:
        reps = int(np.ceil(length / len(noise)))
        noise = np.tile(noise, reps)
    if len(noise) > length:
        if start < 0:
            rng = rng or np.random
            start = int(rng.randint(0, len(noise) - length))
        noise = noise[start : start + length]
    return noise


def select_noise(
    noise_wavs: Sequence[np.ndarray], noise_num: int,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Host-side noise selection (reference audio_utils.py:27-43): pick
    ``noise_num`` random clips; if several, truncate to the shortest and
    average (with the reference's floor quirk preserved)."""
    rng = rng or np.random
    idx = rng.randint(0, len(noise_wavs), size=noise_num)
    clips = [np.asarray(noise_wavs[int(i)], np.float32) for i in idx]
    if noise_num == 1:
        return clips[0]
    min_len = min(len(c) for c in clips)
    return np.floor(np.stack([c[:min_len] for c in clips]).mean(axis=0))
