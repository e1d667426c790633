"""Scalar function semantics (reference: reader.py / fuzzy_matcher.py)."""

from eschergraph_ray.functions.text import (
    chunk_passes_filter,
    count_tokens,
    normalize_name,
    token_set_ratio,
)


def test_normalize_name():
    assert normalize_name("  Lennart   Timmermans ") == "lennart timmermans"


def test_count_tokens_counts_words_numbers_punct():
    assert count_tokens("hello world") == 2
    assert count_tokens("hello, world!") == 4
    assert count_tokens("it's 42") == 2


def test_chunk_filter_short_and_non_alpha():
    # <100 chars dropped (reader.py:198-203)
    assert not chunk_passes_filter("short text")
    long_alpha = "word " * 30
    assert chunk_passes_filter(long_alpha)
    # >40% non-alpha dropped (reader.py:207-224)
    noisy = ("ab12!@#$ " * 20)[:150]
    assert not chunk_passes_filter(noisy)


def test_token_set_ratio_subset_is_100():
    # fuzzywuzzy token_set_ratio semantics: token-subset scores 100
    assert token_set_ratio("lennart", "lennart timmermans") == 100.0
    assert token_set_ratio("timmermans", "patrick timmermans") == 100.0
    assert token_set_ratio("Lennart Timmermans", "timmermans lennart") == 100.0


def test_token_set_ratio_unrelated_low():
    assert token_set_ratio("alpha beta", "gamma delta") < 95.0
    assert token_set_ratio("", "x") == 0.0
