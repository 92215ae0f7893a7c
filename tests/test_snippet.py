"""Snippet goldens — SnippetCreator.java:22-102 behavioral parity:
highlight matched word forms, pick the best sentence, cut at 240 chars on a
word boundary."""

from __future__ import annotations

from search_engine_spark.functions.snippet import SNIPPET_LEN, make_snippet


def test_highlight_all_matching_forms():
    s = make_snippet("The cat sat. Cats love cats!", {"cat"})
    # best sentence is the one with the most hits
    assert s == "<b>Cats</b> love <b>cats</b>!"


def test_single_sentence():
    s = make_snippet("spark merges the index", {"merge"})
    assert s == "spark <b>merges</b> the index"


def test_no_match_returns_first_sentence_unhighlighted():
    s = make_snippet("nothing here. or there.", {"zzz"})
    assert "<b>" not in s


def test_cut_at_240_word_boundary():
    long_text = "match " + "filler " * 100
    s = make_snippet(long_text, {"match"})
    assert s.endswith("...")
    assert len(s) <= SNIPPET_LEN + 8  # tag-closing + ellipsis allowance
    assert not s[: -3].endswith(" ")  # cut on a boundary, no trailing space


def test_empty_text():
    assert make_snippet("", {"x"}) == ""
    assert make_snippet(None, {"x"}) == ""
