"""Data-layer tests: WAV IO, manifests, pack/unpack, dataset + collation,
bucketing, noise mixing."""
import numpy as np
import pytest

import jax

from mm_s2ut.config import DataConfig, MultimodalConfig, NoiseConfig
from mm_s2ut.data.audio_io import decode_wav_bytes, get_waveform, parse_path, write_wav
from mm_s2ut.data.bucketing import LengthBucketBatcher
from mm_s2ut.data.dataset import SpeechToSpeechDataset, pack_units, unpack_units
from mm_s2ut.data.dictionary import UnitDictionary
from mm_s2ut.data.image_store import ImageFeatureStore, audio_stem_to_image_index
from mm_s2ut.data.manifest import ManifestRow, read_manifest, write_manifest
from mm_s2ut.ops.noise import add_noise, compute_amplitude, tile_noise_to_length


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, sr2 = get_waveform(str(p))
    assert sr2 == sr
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_parse_path_slices():
    assert parse_path("/a/b.wav") == ("/a/b.wav", 0, -1)
    assert parse_path("/a/b.zip:100:50") == ("/a/b.zip", 100, 50)


def test_resample(tmp_path):
    sr = 8000
    x = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, sr2 = get_waveform(str(p), use_sample_rate=16000)
    assert sr2 == 16000
    assert abs(len(y) - 16000) <= 4


def test_manifest_roundtrip(tmp_path):
    rows = [
        ManifestRow("0", "1.wav", 16000, "1 2 3", 3, "fr", "en"),
        ManifestRow("1", "2.wav", 8000, "7 7 9", 3, "fr", "en"),
    ]
    p = tmp_path / "train.tsv"
    write_manifest(p, rows)
    got = read_manifest(p)
    assert got[1].tgt_text == "7 7 9"
    assert got[0].src_n_frames == 16000
    assert got[0].tgt_lang == "en"


def test_pack_unpack_roundtrip():
    d = UnitDictionary(1000)
    units = np.array([5, 17, 903, 4, 0, 1], np.int64)
    ids = np.concatenate([d.units_to_ids(units), [d.eos()]])
    packed = pack_units(ids, 2, len(d))
    assert packed[-1] == d.eos()
    assert len(packed) == 4  # 6 units / 2 + eos
    unpacked = unpack_units(packed, 2, len(d))
    np.testing.assert_array_equal(unpacked[:-1], ids[:-1])


def _make_corpus(tmp_path, n=6, with_images=True):
    sr = 16000
    d = UnitDictionary(100)
    rows = []
    rng = np.random.RandomState(0)
    for i in range(n):
        length = sr // 4 + i * sr // 8
        wav = (0.3 * rng.randn(length)).astype(np.float32)
        name = f"{i + 1}.wav"  # stem−1 = flickr30k index i
        write_wav(tmp_path / name, wav, sr)
        units = " ".join(str(u) for u in rng.randint(0, 100, 10 + i))
        rows.append(ManifestRow(str(i), name, length, units, 10 + i, "fr", "en"))
    write_manifest(tmp_path / "train.tsv", rows)
    mm = None
    if with_images:
        feat_dir = tmp_path / "img_feat"
        feat_dir.mkdir()
        np.save(feat_dir / "train.npy", rng.randn(n, 7, 12).astype(np.float32))
        mm = MultimodalConfig(image_feat_path=[str(feat_dir)], image_feat_dim=[12])
    cfg = DataConfig(audio_root=str(tmp_path), sample_rate=sr)
    return d, cfg, mm


def test_dataset_getitem_and_collate(tmp_path):
    d, cfg, mm = _make_corpus(tmp_path)
    ds = SpeechToSpeechDataset.from_tsv(tmp_path, "train", cfg, d, mm)
    item = ds[2]
    assert item.target[-1] == d.eos()
    assert item.target[0] >= 4
    assert len(item.imgs) == 1 and item.imgs[0].shape == (7, 12)

    batch = ds.collate([ds[i] for i in range(4)])
    B = 4
    assert batch["src_features"].shape[0] == B
    # Sorted descending by length.
    assert (np.diff(batch["src_lengths"]) <= 0).all()
    # prev_output_tokens starts with EOS (move_eos_to_beginning), then target[:-1].
    row = 0
    L = batch["target_lengths"][row]
    assert batch["prev_output_tokens"][row, 0] == d.eos()
    np.testing.assert_array_equal(
        batch["prev_output_tokens"][row, 1:L], batch["target"][row, : L - 1]
    )
    assert batch["imgs_list"][0].shape == (B, 7, 12)
    assert batch["img_masks_list"][0].dtype == bool


def test_collate_multiframe_targets_stay_base_v(tmp_path):
    """n_frames_per_step=2: the loss target stays UNPACKED base-V (every id
    < vocab) while prev_output_tokens packs (reference _collate_target,
    speech_to_speech_dataset.py:344-375 — only the decoder input packs);
    target_lengths count packed positions."""
    d, cfg, mm = _make_corpus(tmp_path, with_images=False)
    cfg.n_frames_per_step = 2
    ds = SpeechToSpeechDataset.from_tsv(tmp_path, "train", cfg, d, None)
    items = [ds[0], ds[1]]
    batch = ds.collate(items)

    V = len(d)
    assert (batch["target"] < V).all(), "loss targets must stay base-V"
    # prev packs: some ids exceed the vocabulary (base-V^2 space).
    prev = batch["prev_output_tokens"]
    assert (prev >= V).any(), "decoder input should carry packed ids"
    # target_lengths = packed lengths; unpacked target row is 2·(Lp−1)+1.
    for row in range(len(items)):
        Lp = batch["target_lengths"][row]
        t_row = batch["target"][row]
        n_unpacked = int((t_row != d.pad()).sum())
        assert n_unpacked == 2 * (Lp - 1) + 1
        assert t_row[n_unpacked - 1] == d.eos()


def test_pack_units_overflow_guard():
    d = UnitDictionary(1000)
    ids = np.concatenate([d.units_to_ids(np.arange(8)), [d.eos()]])
    with pytest.raises(ValueError, match="int32"):
        pack_units(ids, 4, len(d))


def test_collate_fixed_pad(tmp_path):
    d, cfg, mm = _make_corpus(tmp_path, with_images=False)
    ds = SpeechToSpeechDataset.from_tsv(tmp_path, "train", cfg, d, None)
    batch = ds.collate([ds[0], ds[1]], src_pad=32000, tgt_pad=64)
    assert batch["src_features"].shape == (2, 32000)
    assert batch["target"].shape == (2, 64)
    assert (batch["target"][0, batch["target_lengths"][0]:] == d.pad()).all()


def test_image_index_quirk():
    assert audio_stem_to_image_index("/x/y/123.wav") == 122


def test_bucketing_static_shapes():
    rng = np.random.RandomState(0)
    src = rng.randint(1000, 60000, 500)
    tgt = rng.randint(5, 120, 500)
    b = LengthBucketBatcher(src, tgt, max_tokens=200000, num_buckets=6, quantum=256)
    seen = set()
    shapes = set()
    for bucket, idx in b.epoch(0):
        assert (src[idx] <= bucket.src_len).all()
        assert (tgt[idx] <= bucket.tgt_len).all()
        assert len(idx) <= bucket.batch_size
        seen.update(idx.tolist())
        shapes.add((bucket.src_len, bucket.tgt_len))
    assert seen == set(range(500))  # exhaustive, no dupes
    assert len(shapes) <= 6
    # Deterministic given epoch.
    a = [i.tolist() for _, i in b.epoch(3)]
    c = [i.tolist() for _, i in b.epoch(3)]
    assert a == c
    assert a != [i.tolist() for _, i in b.epoch(4)]


def test_add_noise_snr_math():
    rng = np.random.RandomState(0)
    B, T = 3, 8000
    clean = rng.randn(B, T).astype(np.float32) * 0.1
    noise = rng.randn(B, T).astype(np.float32) * 0.1
    out = np.asarray(add_noise(jax.random.PRNGKey(0), clean, noise, 100.0, 100.0))
    # At SNR=100 dB the mixture is ~the clean signal.
    np.testing.assert_allclose(out, clean, atol=1e-3)
    out0 = np.asarray(add_noise(jax.random.PRNGKey(0), clean, noise, 0.0, 0.0))
    # At 0 dB clean and noise are equally weighted (factor 0.5).
    expected = 0.5 * clean + 0.5 * np.abs(clean).mean(-1, keepdims=True) * noise / (
        np.abs(noise).mean(-1, keepdims=True) + 1e-14
    )
    np.testing.assert_allclose(out0, expected, atol=1e-4)


def test_tile_noise():
    noise = np.arange(10, dtype=np.float32)
    out = tile_noise_to_length(noise, 25, start=0)
    assert len(out) == 25
    np.testing.assert_array_equal(out[:10], noise)


def test_speaker_embed_plumbing(tmp_path):
    sr = 16000
    d = UnitDictionary(20)
    rng = np.random.RandomState(0)
    rows = []
    spk_lines = ["id\tspeaker_embed"]
    for i in range(2):
        wav = (0.2 * rng.randn(sr // 8)).astype(np.float32)
        write_wav(tmp_path / f"{i + 1}.wav", wav, sr)
        emb = rng.randn(16).astype(np.float32)
        np.save(tmp_path / f"spk{i}.npy", emb)
        spk_lines.append(f"{i}\t{tmp_path / f'spk{i}.npy'}")
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", sr // 8, "1 2 3", 3))
    write_manifest(tmp_path / "train.tsv", rows)
    (tmp_path / "spk.tsv").write_text("\n".join(spk_lines) + "\n")

    cfg = DataConfig(audio_root=str(tmp_path),
                     target_speaker_embed=str(tmp_path / "spk.tsv"))
    ds = SpeechToSpeechDataset.from_tsv(tmp_path, "train", cfg, d, None)
    item = ds[0]
    assert item.speaker is not None and item.speaker.shape == (16,)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["tgt_speaker"].shape == (2, 16)


def test_grain_pipeline(tmp_path):
    pytest.importorskip("grain")
    from mm_s2ut.data.grain_pipeline import grain_batch_iterator, grain_available

    assert grain_available()
    d, cfg, mm = _make_corpus(tmp_path, with_images=False)
    ds = SpeechToSpeechDataset.from_tsv(tmp_path, "train", cfg, d, None)
    batcher = LengthBucketBatcher(
        [ds.num_frames(i) for i in range(len(ds))],
        [ds.num_target_frames(i) + 2 for i in range(len(ds))],
        max_tokens=40000, num_buckets=2, quantum=256,
    )
    # Grain pipeline yields the same batches (same seeds) as direct collate.
    want = []
    for bucket, idx in batcher.epoch(0, shuffle=False):
        b = ds.collate([ds[int(i)] for i in idx], src_pad=bucket.src_len,
                       tgt_pad=bucket.tgt_len)
        want.append(b)
    got = list(grain_batch_iterator(ds, batcher, epoch=0, shuffle=False,
                                    num_workers=0))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["src_features"], w["src_features"], atol=1e-5)
        np.testing.assert_array_equal(g["target"], w["target"])
