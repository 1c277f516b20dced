"""Eval-suite tests: text cleaners, WER, ASR-BLEU alignment."""
import numpy as np
import pytest

from mm_s2ut.eval.bleu import align_refs_by_id, clean_line, corpus_asr_bleu
from mm_s2ut.eval.text_cleaner import (
    english_cleaners,
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
    transliteration_cleaners,
)
from mm_s2ut.eval.wer import compute_wer, edit_ops
from mm_s2ut.eval.asr import wav_sort_key


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert number_to_words(1000000) == "one million"


def test_ordinals_and_years():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(22) == "twenty second"
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("in 1984") == "in nineteen eighty four"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("$5.50") == "five dollars, fifty cents"
    # 1000 < n < 3000 reads year-style (reference numbers.py behavior).
    assert normalize_numbers("1,234 items") == "twelve thirty four items"
    assert normalize_numbers("4,234 items") == "four thousand two hundred thirty four items"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith   has 2 cats!") == "doctor smith has two cats!"
    assert transliteration_cleaners("Café Müller") == "cafe muller"


def test_clean_line_strips_trailing_period():
    assert clean_line("Hello World. ") == "hello world"


def test_edit_ops_and_wer():
    s, d, i, h = edit_ops("a b c".split(), "a x c d".split())
    assert (s, d, i, h) == (1, 0, 1, 2)
    res = compute_wer(["a b c"], ["a x c d"])
    assert res["wer"] == pytest.approx(2 / 3)
    assert compute_wer(["hello world"], ["hello world"])["wer"] == 0.0


def test_asr_bleu_identity_and_alignment():
    refs = ["the cat sat", "a dog ran fast", "birds fly high"]
    bleu = corpus_asr_bleu(refs, refs)
    assert bleu.score == pytest.approx(100.0)
    # hyp order 2,0,1 (1-based ids 3,1,2) realigns correctly.
    shuffled_ids = [3, 1, 2]
    aligned = align_refs_by_id(refs, shuffled_ids)
    assert aligned == [refs[2], refs[0], refs[1]]


def test_wav_sort_key(tmp_path):
    from pathlib import Path

    paths = [Path("10_pred.wav"), Path("2_pred.wav"), Path("1_pred.wav")]
    assert [p.name for p in sorted(paths, key=wav_sort_key)] == [
        "1_pred.wav", "2_pred.wav", "10_pred.wav",
    ]


# --- MCD inference metrics (mm_s2ut/eval/mcd.py) ---------------------------


def _brute_dtw(dist):
    """Min-cost monotonic path by exhaustive recursion (tiny matrices)."""
    T1, T2 = dist.shape
    best = [np.inf]

    def go(i, j, acc):
        acc += dist[i, j]
        if acc >= best[0]:
            return
        if i == T1 - 1 and j == T2 - 1:
            best[0] = acc
            return
        if i + 1 < T1 and j + 1 < T2:
            go(i + 1, j + 1, acc)
        if i + 1 < T1:
            go(i + 1, j, acc)
        if j + 1 < T2:
            go(i, j + 1, acc)

    go(0, 0, 0.0)
    return best[0]


def test_dtw_matches_brute_force():
    from mm_s2ut.eval.mcd import dtw

    rng = np.random.RandomState(0)
    for _ in range(5):
        dist = rng.rand(5, 7)
        cost, pathmap = dtw(dist)
        assert cost == pytest.approx(_brute_dtw(dist), rel=1e-9)
        # Pathmap is a valid monotonic path: its cells sum to the cost.
        assert (dist * pathmap).sum() == pytest.approx(cost, rel=1e-9)
        assert pathmap[0, 0] == 1 and pathmap[-1, -1] == 1


def test_mcd_zero_for_identical_waveforms():
    from mm_s2ut.eval.mcd import mel_cepstral_distortion

    wav = np.random.RandomState(1).randn(8000).astype(np.float32) * 0.2
    out = mel_cepstral_distortion(wav, wav)
    assert out["mcd_loss"] == pytest.approx(0.0, abs=1e-4)
    assert out["nins"] == 0 and out["ndel"] == 0
    assert out["targ_frames"] == out["pred_frames"] == out["norm_frames"]


def test_mcd_positive_and_length_stats():
    from mm_s2ut.eval.mcd import mel_cepstral_distortion

    rng = np.random.RandomState(2)
    a = rng.randn(8000).astype(np.float32) * 0.2
    b = rng.randn(12000).astype(np.float32) * 0.2
    out = mel_cepstral_distortion(a, b)
    assert out["mcd_loss"] > 0
    assert out["pred_frames"] > out["targ_frames"]
    # P = targ + nins = pred + ndel.
    assert out["path_frames"] == out["targ_frames"] + out["nins"]
    assert out["path_frames"] == out["pred_frames"] + out["ndel"]


def test_reduce_inference_metrics():
    from mm_s2ut.eval.mcd import reduce_inference_metrics

    logs = [
        {"mcd_loss": 10.0, "targ_frames": 4.0, "pred_frames": 5.0,
         "nins": 1.0, "ndel": 0.0, "norm_frames": 4.0},
        {"mcd_loss": 6.0, "targ_frames": 4.0, "pred_frames": 3.0,
         "nins": 0.0, "ndel": 1.0, "norm_frames": 4.0},
        {"loss": 1.0},  # non-inference logging output is ignored
    ]
    red = reduce_inference_metrics(logs)
    assert red["mcd_loss"] == pytest.approx(2.0)
    assert red["pred_ratio"] == pytest.approx(1.0)
    assert red["ins_rate"] == pytest.approx(0.125)
    assert red["del_rate"] == pytest.approx(0.125)
    assert reduce_inference_metrics([{"loss": 1.0}]) == {}
