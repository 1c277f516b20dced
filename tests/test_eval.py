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
