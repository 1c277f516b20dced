"""ogg/vorbis codec binding (system libvorbis via ctypes) tests."""
import numpy as np
import pytest

from mm_s2ut.data import ogg


pytestmark = pytest.mark.skipif(
    not ogg.available(), reason="no libvorbisfile on this host"
)


def _sine(sr=16000, secs=1.0, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_roundtrip_mono():
    sr = 16000
    wav = _sine(sr)
    dec, sr2 = ogg.decode_ogg_bytes(ogg.encode_ogg_bytes(wav, sr))
    assert sr2 == sr and dec.shape[1] == 1
    n = min(len(wav), dec.shape[0])
    corr = np.corrcoef(wav[:n], dec[:n, 0])[0, 1]
    assert corr > 0.98, corr


def test_roundtrip_stereo():
    sr = 16000
    # Distinct tones per channel (anti-correlated channels stress vorbis
    # joint-stereo coupling and drop correlation below a strict gate).
    wav = np.stack([_sine(sr, hz=440.0), _sine(sr, hz=660.0)], axis=1)
    dec, sr2 = ogg.decode_ogg_bytes(ogg.encode_ogg_bytes(wav, sr, quality=0.8))
    assert sr2 == sr and dec.shape[1] == 2
    n = min(len(wav), dec.shape[0])
    # ~0.94 is vorbis stereo channel-coupling loss (mono round-trips at
    # 1.0); the gate checks interleaving/channel order, not fidelity.
    assert np.corrcoef(wav[:n, 0], dec[:n, 0])[0, 1] > 0.9
    assert np.corrcoef(wav[:n, 1], dec[:n, 1])[0, 1] > 0.9


def test_get_waveform_ogg(tmp_path):
    """get_waveform decodes .ogg end-to-end (reference audio_utils.py
    ogg path via libsndfile; here the same codec bound directly)."""
    from mm_s2ut.data.audio_io import get_waveform

    sr = 16000
    wav = _sine(sr, 0.5)
    p = tmp_path / "x.ogg"
    p.write_bytes(ogg.encode_ogg_bytes(wav, sr))
    x, r = get_waveform(str(p))
    assert r == sr and x.ndim == 1
    n = min(len(wav), len(x))
    assert np.corrcoef(wav[:n], x[:n])[0, 1] > 0.98


def test_bad_bytes_raise():
    with pytest.raises(ValueError):
        ogg.decode_ogg_bytes(b"OggS" + b"\x00" * 100)
