"""Golden tests for the kaldi-compatible fbank frontend (SURVEY.md §7 B2).

The oracle is an independent straight-line numpy transcription of kaldi's
FbankComputer pipeline (dither=0), written frame-at-a-time — deliberately
structured differently from the vectorized JAX implementation.
"""
import numpy as np
import pytest

from mm_s2ut.ops.fbank import (
    FbankConfig,
    batched_log_mel_fbank,
    log_mel_fbank,
    mel_banks,
    num_frames,
    standardize,
)


def oracle_fbank(wave: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    """Frame-by-frame numpy oracle for kaldi fbank (dither=0)."""
    n, shift = cfg.frame_length, cfg.frame_shift
    nfft = cfg.padded_window_size
    i = np.arange(n)
    a = 2 * np.pi / (n - 1)
    window = (0.5 - 0.5 * np.cos(a * i)) ** 0.85  # povey
    nyq = cfg.sample_rate / 2
    high = cfg.high_freq if cfg.high_freq > 0 else nyq + cfg.high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    nbins_fft = nfft // 2
    mel_lo, mel_hi = mel(cfg.low_freq), mel(high)
    d = (mel_hi - mel_lo) / (cfg.num_mel_bins + 1)
    out = []
    t = 0
    while t + n <= len(wave):
        frame = wave[t : t + n].astype(np.float64).copy()
        frame -= frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - cfg.preemphasis * frame[0]
        pre[1:] = frame[1:] - cfg.preemphasis * frame[:-1]
        frame = pre * window
        spec = np.fft.rfft(frame, nfft)
        power = np.abs(spec[:nbins_fft]) ** 2
        mels = np.zeros(cfg.num_mel_bins)
        fft_mel = mel(np.arange(nbins_fft) * nyq / nbins_fft)
        for b in range(cfg.num_mel_bins):
            left, center, right = mel_lo + b * d, mel_lo + (b + 1) * d, mel_lo + (b + 2) * d
            w = np.zeros(nbins_fft)
            rising = (fft_mel >= left) & (fft_mel <= center)
            falling = (fft_mel > center) & (fft_mel <= right)
            w[rising] = (fft_mel[rising] - left) / d
            w[falling] = (right - fft_mel[falling]) / d
            mels[b] = (power * w).sum()
        out.append(np.log(np.maximum(mels, np.finfo(np.float32).eps)))
        t += shift
    return np.asarray(out, np.float32)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(16000)
    return (sig * 32768).astype(np.float32)


def test_fbank_matches_oracle(wave):
    cfg = FbankConfig()
    got = np.asarray(log_mel_fbank(wave, cfg))
    want = oracle_fbank(wave, cfg)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_num_frames():
    cfg = FbankConfig()
    assert num_frames(400, cfg) == 1
    assert num_frames(399, cfg) == 0
    assert num_frames(560, cfg) == 2
    assert num_frames(16000, cfg) == 98


def test_mel_banks_partition():
    banks = mel_banks(FbankConfig())
    assert banks.shape == (256, 80)
    # Triangles overlap by half: interior fft bins sum to ~1.
    col = banks.sum(axis=1)
    interior = col[(np.arange(256) > 10) & (np.arange(256) < 200)]
    np.testing.assert_allclose(interior, 1.0, atol=1e-4)


def test_sine_peaks_at_expected_bin(wave):
    cfg = FbankConfig()
    feats = np.asarray(log_mel_fbank(wave, cfg))
    peak_bin = int(np.median(feats.argmax(axis=1)))
    # 440 Hz in kaldi mel scale vs bank centers.
    banks = mel_banks(cfg)
    fft_freq_of_peak = np.argmax(banks[:, peak_bin]) * 8000 / 256
    assert abs(fft_freq_of_peak - 440) < 120


def test_batched_matches_single(wave):
    cfg = FbankConfig()
    w2 = wave[:12000]
    S = len(wave)
    batch = np.zeros((2, S), np.float32)
    batch[0] = wave
    batch[1, : len(w2)] = w2
    lengths = np.array([S, len(w2)])
    feats, frame_lens = batched_log_mel_fbank(batch, lengths, cfg)
    feats = np.asarray(feats)
    assert list(frame_lens) == [98, 73]
    np.testing.assert_allclose(feats[0], np.asarray(log_mel_fbank(wave, cfg)), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        feats[1, :73], np.asarray(log_mel_fbank(w2, cfg)), atol=2e-4, rtol=1e-4
    )
    assert np.all(feats[1, 73:] == 0)


def test_standardize_masked(wave):
    cfg = FbankConfig()
    feats = np.asarray(log_mel_fbank(wave, cfg))[None]
    out = np.asarray(standardize(feats, lengths=np.array([98])))
    assert abs(out[0, :98].mean()) < 1e-4
    assert abs(out[0, :98].std() - 1.0) < 1e-2


def test_matmul_path_matches_fft_path(wave):
    from mm_s2ut.ops.fbank import _fbank_impl, _fbank_matmul_impl
    import jax.numpy as jnp

    cfg = FbankConfig()
    fft = np.asarray(_fbank_impl(jnp.asarray(wave), cfg, 98))
    gemm = np.asarray(_fbank_matmul_impl(jnp.asarray(wave), cfg, 98))
    np.testing.assert_allclose(gemm, fft, rtol=2e-3, atol=2e-3)
