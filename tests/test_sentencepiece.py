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


def test_s2t_collate_native_targets_match_getitem(tmp_path):
    """The native/grain collate path must produce the SAME tokenized and
    framed targets as __getitem__ collation — the tokenizer override lives
    in _encode_target, shared by both (regression: collate_native used the
    base encoder, yielding raw-untokenized targets on the grain path)."""
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
    d = Dictionary()
    for piece, _ in PIECES:
        d.add_symbol(piece)
    cfg = DataConfig(
        data_root=str(tmp_path), audio_root=str(tmp_path),
        target_is_code=False,
        pre_tokenizer={"tokenizer": "none"},
        bpe_tokenizer={"bpe": "sentencepiece", "sentencepiece_model": str(sp_model)},
    )
    ds = MultiModalSpeechToTextDataset("train", True, cfg, rows, d)
    want = ds.collate([ds[0], ds[1]])
    got = ds.collate_native(
        np.asarray([0, 1]),
        src_pad=int(want["src_features"].shape[1]),
        tgt_pad=int(want["target"].shape[1]),
    )
    np.testing.assert_array_equal(got["target"], want["target"])
    np.testing.assert_array_equal(
        got["prev_output_tokens"], want["prev_output_tokens"]
    )


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


def test_s2t_lang_tag_append_and_prev_rotation(tmp_path):
    """xm/unit-mBART convention (reference config/xm_transformer.yaml:5-7
    via fairseq SpeechToTextDataset): with
    prepend_bos_and_append_tgt_lang_tag, target = <bos> tokens <eos>
    <lang:tgt> and prev_output_tokens starts with the lang tag (fairseq
    collate_tokens(move_eos_to_beginning=True, eos_idx=None) rotation)."""
    from mm_s2ut.config import DataConfig
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.dictionary import Dictionary
    from mm_s2ut.data.manifest import ManifestRow, write_manifest
    from mm_s2ut.data.s2t_dataset import MultiModalSpeechToTextDataset

    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i, text in enumerate(["a b", "b a a"]):
        write_wav(tmp_path / f"{i + 1}.wav",
                  (0.1 * rng.randn(sr // 8)).astype(np.float32), sr)
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", sr // 8, text, 3,
                                tgt_lang="en"))
    write_manifest(tmp_path / "train.tsv", rows)
    d = Dictionary()
    for sym in ("a", "b", "<lang:en>"):
        d.add_symbol(sym)
    tag = d.index("<lang:en>")
    assert tag != d.unk()
    cfg = DataConfig(
        data_root=str(tmp_path), audio_root=str(tmp_path),
        target_is_code=False, tgt_lang="<lang:en>", eos_token="<lang:en>",
        prepend_bos_and_append_tgt_lang_tag=True,
    )
    ds = MultiModalSpeechToTextDataset("train", True, cfg, rows, d)
    item = ds[0]
    ids = d.encode_line("a b", append_eos=True)
    want = np.concatenate([[d.bos()], ids, [tag]])
    np.testing.assert_array_equal(item.target, want)
    batch = ds.collate([ds[0], ds[1]])
    # prev = rotation of target: prev[0] = target[-1] = lang tag, then
    # bos + tokens — the decoder input generation reproduces when it
    # starts from eos_token = the lang tag.
    for b in range(2):
        n = int(batch["target_lengths"][b])
        np.testing.assert_array_equal(
            batch["prev_output_tokens"][b, :n],
            np.concatenate([[tag], batch["target"][b, : n - 1]]),
        )
        assert batch["target"][b, n - 1] == tag
        assert batch["prev_output_tokens"][b, 1] == d.bos()


def test_format_generation_output_strips_lang_tags():
    """Lang tags (fairseq symbols_to_strip_from_output) are removed from
    T-/H-/D- lines when strip_ids is passed (cli/generate wires all
    <lang:*> symbols when data.eos_token is configured)."""
    from mm_s2ut.data.dictionary import Dictionary
    from mm_s2ut.infer.generator import format_generation_output

    d = Dictionary()
    for sym in ("hello", "world", "<lang:en>"):
        d.add_symbol(sym)
    tag = d.index("<lang:en>")
    hyp = {"tokens": np.asarray([tag, d.index("hello"), d.index("world"), tag]),
           "score": -0.5}
    lines = format_generation_output(
        [0], [[hyp]], d, targets=[[d.bos(), d.index("hello"), d.eos(), tag]],
        strip_ids=[tag],
    )
    assert lines[0] == "T-0\thello"
    assert lines[1].endswith("\thello world")
    assert lines[2].endswith("\thello world")
