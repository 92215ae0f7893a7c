"""Snippet generation — semantics of the reference's SnippetCreator
(SnippetCreator.java:22-37: highlight matched word forms with <b>, pick the
sentence with the most hits, cut to ~240 chars ending on a word boundary).
Reimplemented from the behavioral spec in SURVEY.md §2.3 T8 — not a code
translation.

Exposed as a pandas-vectorizable pure function used in a pandas UDF at the
presentation stage (top-k rows only — never on the full corpus).
"""

from __future__ import annotations

import re

from .analyzer import lemmatize_token

SNIPPET_LEN = 240  # SnippetCreator.java:19

# explicit whitespace class (not \s): python \s also matches unicode spaces
# while the SQL oracle's RE2 does not — keep both sides on the same alphabet
_SENT_SPLIT = re.compile(r"(?<=[.!?])[ \t\n\r\f\v]+")
_WORD = re.compile(r"[a-zA-Z0-9]+")


def make_snippet(text: str | None, query_lemmas: set[str]) -> str:
    """Best-sentence snippet with <b> highlights, cut to SNIPPET_LEN on a
    word boundary."""
    if not text:
        return ""
    sentences = _SENT_SPLIT.split(text) or [text]

    def hits(sentence: str) -> int:
        return sum(
            1
            for m in _WORD.finditer(sentence)
            if lemmatize_token(m.group(0).lower()) in query_lemmas
        )

    best = max(sentences, key=hits)

    # highlight every surface form whose lemma matches a query lemma
    def repl(m: re.Match) -> str:
        w = m.group(0)
        if lemmatize_token(w.lower()) in query_lemmas:
            return f"<b>{w}</b>"
        return w

    highlighted = _WORD.sub(repl, best)
    if len(highlighted) <= SNIPPET_LEN:
        return highlighted
    cut = highlighted[:SNIPPET_LEN]
    # end on a word boundary (don't split a <b> tag or word)
    last_space = cut.rfind(" ")
    if last_space > 0:
        cut = cut[:last_space]
    # avoid dangling open tag
    if cut.count("<b>") > cut.count("</b>"):
        cut = cut + "</b>"
    return cut + "..."
