"""SentencePiece reader/encoder (enhanced-path tokenization) tests."""
import itertools

import numpy as np
import pytest

from mm_s2ut.data.sentencepiece import (
    BPE,
    UNIGRAM,
    WORD_SEP,
    SentencePieceProcessor,
    apply_pre_tokenizer,
    build_bpe_tokenizer,
    build_model,
    load_model,
)

PIECES = [
    (WORD_SEP + "the", -1.0), (WORD_SEP + "cat", -2.0), ("at", -3.0),
    (WORD_SEP + "c", -4.0), (WORD_SEP, -5.0), ("t", -6.0), ("h", -6.0),
    ("e", -6.0), ("c", -6.5), ("a", -6.5), ("s", -6.5),
    (WORD_SEP + "s", -5.5), ("th", -4.5), (WORD_SEP + "th", -3.5),
]


def _write_model(tmp_path, model_type):
    p = tmp_path / "m.model"
    p.write_bytes(build_model(PIECES, model_type=model_type))
    return p


def test_model_proto_roundtrip(tmp_path):
    p = _write_model(tmp_path, UNIGRAM)
    m = load_model(p)
    assert m.pieces[:3] == ["<unk>", "<s>", "</s>"]
    assert m.unk_id == 0
    assert m.model_type == UNIGRAM
    assert m.pieces[3] == WORD_SEP + "the"
    assert m.scores[3] == pytest.approx(-1.0)
    m2 = load_model(_write_model(tmp_path, BPE))
    assert m2.model_type == BPE


def _brute_force_unigram(pieces_scores, s):
    """Max-total-score segmentation by exhaustive split enumeration."""
    best, best_segs = float("-inf"), None
    n = len(s)
    for bits in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        segs = [s[a:b] for a, b in zip(cuts, cuts[1:])]
        if not all(seg in pieces_scores for seg in segs):
            continue
        score = sum(pieces_scores[seg] for seg in segs)
        if score > best:
            best, best_segs = score, segs
    return best_segs


def test_unigram_viterbi_matches_brute_force(tmp_path):
    sp = SentencePieceProcessor(load_model(_write_model(tmp_path, UNIGRAM)))
    for text in ("the cat", "cats", "the the", "catcat"):
        got = sp.encode(text)
        want = _brute_force_unigram(
            sp.seg_scores, WORD_SEP + text.replace(" ", WORD_SEP)
        )
        assert got == want, (text, got, want)
        assert sp.decode(got) == text


def test_unigram_unknown_char_fallback(tmp_path):
    sp = SentencePieceProcessor(load_model(_write_model(tmp_path, UNIGRAM)))
    enc = sp.encode("the qat")
    assert sp.decode(enc) == "the qat"
    ids = sp.encode_ids("the qat")
    assert 0 in ids  # <unk> for 'q'


def test_bpe_merge_order(tmp_path):
    sp = SentencePieceProcessor(load_model(_write_model(tmp_path, BPE)))
    # Best-scored pair merges first: "th" (-4.5) then "▁th" (-3.5)...
    enc = sp.encode("the")
    assert sp.decode(enc) == "the"
    # all output symbols are either known pieces or single chars
    for piece in enc:
        assert piece in sp.seg_scores or len(piece) == 1


def test_build_bpe_tokenizer_config(tmp_path):
    p = _write_model(tmp_path, UNIGRAM)
    sp = build_bpe_tokenizer({"bpe": "sentencepiece", "sentencepiece_model": str(p)})
    assert sp.encode("the cat") == [WORD_SEP + "the", WORD_SEP + "cat"]
    assert build_bpe_tokenizer(None) is None
    assert build_bpe_tokenizer({"bpe": "none"}) is None
    with pytest.raises(ValueError):
        build_bpe_tokenizer({"bpe": "gpt2"})


def test_pre_tokenizer():
    assert apply_pre_tokenizer(None, " a  b ") == " a  b "
    assert apply_pre_tokenizer({"tokenizer": "none"}, " a  b ") == "a b"
    with pytest.raises(ValueError):
        apply_pre_tokenizer({"tokenizer": "moses"}, "x")


def test_s2t_dataset_tokenizes_raw_text(tmp_path):
    """Raw transcripts + bpe_tokenizer config → BPE-piece vocab ids at
    __getitem__ (reference tasks/speech_to_text.py:48-49)."""
    from mm_s2ut.config import DataConfig
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.dictionary import Dictionary
    from mm_s2ut.data.manifest import ManifestRow, write_manifest
    from mm_s2ut.data.s2t_dataset import MultiModalSpeechToTextDataset

    sp_model = _write_model(tmp_path, UNIGRAM)
    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i, text in enumerate(["the cat", "the the cat"]):
        write_wav(tmp_path / f"{i + 1}.wav",
                  (0.1 * rng.randn(sr // 8)).astype(np.float32), sr)
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", sr // 8, text, 3))
    write_manifest(tmp_path / "train.tsv", rows)
    # Vocab over the sp pieces.
    d = Dictionary()
    for piece, _ in PIECES:
        d.add_symbol(piece)
    cfg = DataConfig(
        data_root=str(tmp_path), audio_root=str(tmp_path),
        target_is_code=False,
        pre_tokenizer={"tokenizer": "none"},
        bpe_tokenizer={"bpe": "sentencepiece", "sentencepiece_model": str(sp_model)},
    )
    ds = MultiModalSpeechToTextDataset(
        "train", True, cfg, rows, d,
    )
    item = ds[0]
    want = d.encode_line(
        f"{WORD_SEP}the {WORD_SEP}cat", append_eos=True
    ).astype(np.int64)
    np.testing.assert_array_equal(item.target, want)
    assert item.target[-1] == d.eos()


def test_extract_text_from_generate(tmp_path):
    from mm_s2ut.cli.inference_all import extract_text_from_generate

    sp_model = _write_model(tmp_path, UNIGRAM)
    gen = tmp_path / "generate-valid.txt"
    gen.write_text(
        f"T-1\tref\n"
        f"D-1\t-0.5\t{WORD_SEP}the {WORD_SEP}cat\n"
        f"D-0\t-0.2\t{WORD_SEP}the\n"
    )
    hyp = tmp_path / "hyp.txt"
    n = extract_text_from_generate(
        gen, hyp,
        {"bpe": "sentencepiece", "sentencepiece_model": str(sp_model)},
    )
    assert n == 2
    assert hyp.read_text().splitlines() == ["the", "the cat"]
