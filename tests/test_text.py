"""Text normalization + WER scoring tests."""

import numpy as np

from rnnt_inference_tpu.data.text import (
    english_cleaners,
    normalize_transcript,
    number_to_words,
    ordinal_to_words,
)
from rnnt_inference_tpu.utils.labels import BLANK, LABELS, sen_to_seq, seq_to_sen
from rnnt_inference_tpu.utils.wer import levenshtein, word_error_rate


def test_labels_roundtrip():
    assert len(LABELS) == 28
    s = "hello world's"
    assert seq_to_sen(sen_to_seq(s)) == s
    assert BLANK == 28


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty-four"
    assert number_to_words(1000000) == "one million"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(42) == "forty-second"


def test_english_cleaners():
    assert english_cleaners("Hello, World!") == "hello world "
    assert english_cleaners("Dr. Smith") == "doctor smith"
    assert english_cleaners("I have $5") == "i have five dollars"
    # hyphens from number spellout become spaces (punctuation table)
    assert english_cleaners("in 1984 he") == "in nineteen eighty four he"
    assert english_cleaners("Café") == "cafe"


def test_normalize_transcript_filters_alphabet():
    out = normalize_transcript("It's 3 o'clock!")
    for c in out:
        assert c in set(LABELS)
    assert "'" in out  # apostrophes survive
    assert "three" in out


def test_levenshtein_and_wer():
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("kitten", "sitting") == 3
    wer, scores, words = word_error_rate(["a b c"], ["a b c"])
    assert wer == 0.0
    wer, scores, words = word_error_rate(["a x c"], ["a b c"])
    assert abs(wer - 1 / 3) < 1e-9
    wer, _, _ = word_error_rate(["", "a"], ["a b", "a"])
    assert abs(wer - 2 / 3) < 1e-9
