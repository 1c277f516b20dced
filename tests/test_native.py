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
