"""FLAC codec tests: encoder↔decoder round trips over the subframe/stereo
variants, plus the audio_io dispatch (reference reads flac via libsndfile,
data/audio_utils.py:236-325; here the bitstream is decoded directly)."""
import numpy as np
import pytest

from mm_s2ut.data.audio_io import get_waveform
from mm_s2ut.data.flac import _BitReader, _BitWriter, decode_flac_bytes, encode_flac


def _sig(n, ch=1, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)[:, None]
    x = 0.4 * np.sin(2 * np.pi * 440 * t / 16000.0 + np.arange(ch))
    x = x + 0.01 * rng.randn(n, ch)
    return (np.clip(x, -1, 1) * 32767).astype(np.int16)


def test_bitio_roundtrip():
    w = _BitWriter()
    vals = [(5, 3), (0x3FFE, 14), (1, 1), (123456, 20), (0, 4), (7, 36)]
    for v, n in vals:
        w.write(v, n)
    w.write_unary(11)
    w.align()
    r = _BitReader(bytes(w.buf))
    for v, n in vals:
        assert r.read(n) == v
    assert r.read_unary() == 11


@pytest.mark.parametrize("order", [0, 1, 2, 4])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_fixed_orders(order, ch):
    x = _sig(5000, ch, seed=order)
    blob = encode_flac(x, 16000, order=order, block_size=1024)
    y, sr = decode_flac_bytes(blob)
    assert sr == 16000
    got = (y * 32768.0).round().astype(np.int64)
    want = x.astype(np.int64).reshape(5000, ch)
    np.testing.assert_array_equal(got, want)


def test_roundtrip_constant_and_short_tail():
    x = np.full(1500, 1234, np.int16)  # constant-ish; odd tail block
    blob = encode_flac(x, 8000, order=1, block_size=1024)
    y, sr = decode_flac_bytes(blob)
    assert sr == 8000 and y.shape == (1500, 1)
    np.testing.assert_array_equal(
        (y[:, 0] * 32768.0).round().astype(np.int64), x.astype(np.int64)
    )


def test_many_frames_utf8_frame_numbers():
    x = _sig(200 * 160, seed=3)  # 200 frames at block 160 → 2-byte frame nums
    blob = encode_flac(x, 16000, order=2, block_size=160)
    y, _ = decode_flac_bytes(blob)
    np.testing.assert_array_equal(
        (y * 32768.0).round().astype(np.int64), x.astype(np.int64)
    )


def test_audio_io_dispatch(tmp_path):
    x = _sig(4000)
    (tmp_path / "a.flac").write_bytes(encode_flac(x, 16000))
    wav, sr = get_waveform(str(tmp_path / "a.flac"))
    assert sr == 16000 and wav.shape == (4000,)
    np.testing.assert_allclose(
        wav, x[:, 0].astype(np.float32) / 32768.0, atol=1e-6
    )


def test_corrupt_ogg_rejected_with_clear_error(tmp_path):
    # ogg now decodes via the system libvorbisfile (tests/test_ogg.py);
    # corrupt streams must still fail with a clear error.
    (tmp_path / "x.ogg").write_bytes(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="libvorbisfile|ogg"):
        get_waveform(str(tmp_path / "x.ogg"))
