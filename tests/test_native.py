"""Native C++ audio loader tests: decode parity with the python parser,
threaded batch fill, dataset fast-path equivalence, prefetch iterator."""
import numpy as np
import pytest

from mm_s2ut import native
from mm_s2ut.data.audio_io import get_waveform, write_wav
from mm_s2ut.data.prefetch import prefetch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable / native build failed"
)


def test_native_decode_matches_python(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(5000)).astype(np.float32).clip(-1, 1)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    want, sr_py = get_waveform(str(p))
    got, sr_c = native.decode_wav(str(p))
    assert sr_c == sr_py == sr
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_batch_load(tmp_path):
    sr = 16000
    rng = np.random.RandomState(1)
    paths, waves = [], []
    for i in range(5):
        n = 1000 + 700 * i
        x = (0.3 * rng.randn(n)).astype(np.float32).clip(-1, 1)
        p = tmp_path / f"{i}.wav"
        write_wav(p, x, sr)
        paths.append(str(p))
        waves.append(x)
    out, lengths, rates = native.load_batch(paths, max_samples=4000, n_threads=4)
    assert out.shape == (5, 4000)
    assert (rates == sr).all()
    for i, x in enumerate(waves):
        n = min(len(x), 4000)
        assert lengths[i] == n
        np.testing.assert_allclose(out[i, :n], x[:n], atol=1e-4)
        assert np.all(out[i, n:] == 0)


def test_dataset_native_path_matches_python(tmp_path):
    from mm_s2ut.config import DataConfig
    from mm_s2ut.data.dataset import SpeechToSpeechDataset
    from mm_s2ut.data.dictionary import UnitDictionary
    from mm_s2ut.data.manifest import ManifestRow, write_manifest

    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        n = 2000 + 500 * i
        write_wav(tmp_path / f"{i + 1}.wav", (0.2 * rng.randn(n)).astype(np.float32), sr)
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", n, "1 2 3", 3))
    write_manifest(tmp_path / "train.tsv", rows)
    d = UnitDictionary(10)
    ds = SpeechToSpeechDataset.from_tsv(
        tmp_path, "train", DataConfig(audio_root=str(tmp_path)), d, None
    )
    idx = [0, 2, 3]
    fast = ds.collate_native(idx, src_pad=4000, tgt_pad=8)
    assert fast is not None
    slow = ds.collate([ds[i] for i in idx], src_pad=4000, tgt_pad=8)
    np.testing.assert_allclose(fast["src_features"], slow["src_features"], atol=1e-4)
    np.testing.assert_array_equal(fast["src_lengths"], slow["src_lengths"])
    np.testing.assert_array_equal(fast["target"], slow["target"])
    np.testing.assert_array_equal(fast["prev_output_tokens"], slow["prev_output_tokens"])
    np.testing.assert_array_equal(fast["id"], slow["id"])


def test_prefetch_iterator():
    out = list(prefetch(range(10), depth=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_native_decode_robust_to_malformed_wavs(tmp_path):
    """Corrupt inputs must return per-file error codes or decode only the
    bytes actually present — never crash the process (the decoder runs in
    the training collate thread pool)."""
    import struct

    sr = 16000
    rng = np.random.RandomState(2)
    x = (0.3 * rng.randn(2000)).astype(np.float32).clip(-1, 1)
    good = tmp_path / "good.wav"
    write_wav(good, x, sr)
    raw = good.read_bytes()

    # (a) truncated file: only the real frames decode, no zero-tail lie.
    trunc = tmp_path / "trunc.wav"
    trunc.write_bytes(raw[: len(raw) - 1000])  # drop 500 samples
    got, _ = native.decode_wav(str(trunc))
    assert len(got) == 1500
    np.testing.assert_allclose(got, x[:1500], atol=1e-4)

    # (b) lying data-chunk size (huge): decodes available bytes, no OOM.
    lying = bytearray(raw)
    data_off = raw.index(b"data")
    lying[data_off + 4 : data_off + 8] = struct.pack("<I", 0xFFFFFFF0)
    ly = tmp_path / "lying.wav"
    ly.write_bytes(bytes(lying))
    got, _ = native.decode_wav(str(ly))
    assert len(got) == 2000
    np.testing.assert_allclose(got, x, atol=1e-4)

    # (c) bits_per_sample = 0: error code, not SIGFPE.
    zbits = bytearray(raw)
    fmt_off = raw.index(b"fmt ")
    zbits[fmt_off + 8 + 14 : fmt_off + 8 + 16] = b"\x00\x00"
    zb = tmp_path / "zbits.wav"
    zb.write_bytes(bytes(zbits))
    with pytest.raises(IOError):
        native.decode_wav(str(zb))

    # (d) batch loader surfaces the bad file as a python error (raise),
    # not a process crash.
    with pytest.raises(IOError):
        native.load_batch([str(good), str(zb)], max_samples=2500, n_threads=2)


def test_native_decode_extensible_float32(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE wrapping IEEE float32 decodes as float, not
    as int32 PCM garbage."""
    import struct

    sr = 16000
    x = (np.sin(np.linspace(0, 20, 800)) * 0.5).astype(np.float32)
    data = x.tobytes()
    # fmt chunk: extensible (0xFFFE), 1ch, 32-bit, cbSize=22,
    # validbits=32, mask=0, SubFormat GUID = KSDATAFORMAT_SUBTYPE_IEEE_FLOAT
    # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT: 00000003-0000-0010-8000-00AA00389B71
    guid = bytes.fromhex("0300000000001000800000aa00389b71")
    assert len(guid) == 16
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, sr, sr * 4, 4, 32, 22, 32, 0) + guid
    assert len(fmt) == 40
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    p = tmp_path / "ext.wav"
    p.write_bytes(blob)
    got, rate = native.decode_wav(str(p))
    assert rate == sr
    np.testing.assert_allclose(got, x, atol=1e-6)
